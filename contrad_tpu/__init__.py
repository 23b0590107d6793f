"""ContraD-TPU: a TPU-native (JAX/XLA/Pallas) framework for training GANs with
contrastive discriminators.

Re-designed from scratch for TPU hardware with the capabilities of the reference
PyTorch implementation of "Training GANs with Stronger Augmentations via
Contrastive Discriminator" (ICLR 2021, jh-jeong/ContraD).

Design highlights (vs the reference's CUDA/DDP architecture):
  * One jitted SPMD train step over a ``jax.sharding.Mesh`` replaces
    DDP / DataParallel / SyncBatchNorm / GatherLayer: the step is written on the
    *global* batch and XLA inserts all collectives (grad all-reduce, contrastive
    all-gather, BN stat reduction) over ICI automatically.
  * All augmentations are pure, per-sample-randomized, fixed-shape jnp functions
    fused into the train step (reference: torch nn.Modules with host-side numpy
    randomness).
  * Spectral-norm power-iteration vectors and BatchNorm statistics are carried
    as explicit state collections in the train state (reference: in-place
    module buffers).
  * StyleGAN2's CUDA upfirdn2d kernel is a Pallas TPU kernel with an XLA
    composite fallback; fused_bias_act is a plain fused XLA expression.
"""

__version__ = "0.1.0"
