"""Spectral normalization with explicit power-iteration state.

Behavioral spec from the reference (torch.nn.utils.spectral_norm as applied in
``models/gan/sndcgan.py:111-118`` and ``models/gan/snresnet.py:57-63``):

  * the weight is reshaped to a 2-D matrix with the output dim first,
  * one power iteration per *forward call in training mode* updates ``u``
    (under stop-gradient),
  * ``sigma = u^T W v`` is computed with the updated (stop-gradiented) u, v,
    so gradients flow through W only,
  * the normalized weight ``W / sigma`` is used for the actual contraction.

TPU-native design: the ``u`` vector lives in a ``'spectral'`` flax variable
collection carried in the train state — the functional equivalent of torch's
in-place buffer mutation. The train step applies modules with
``mutable=['spectral', ...]`` so one iteration happens per step, matching the
reference's update-on-forward semantics (including the quirk that D's u
advances during the G phase too, since D runs in train mode there —
reference ``train_gan.py:173-179``).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Initializer = Callable[..., Any]

_SN_EPS = 1e-12  # torch.nn.utils.spectral_norm default eps


def _l2_normalize(x: jax.Array, eps: float = _SN_EPS) -> jax.Array:
    return x / (jnp.linalg.norm(x) + eps)


def spectral_normalize(
    module: nn.Module,
    w2d: jax.Array,
    update: bool,
    name: str = "u",
) -> jax.Array:
    """Normalize a 2-D (out, in) weight matrix by its leading singular value.

    Carries the power-iteration vector ``u`` in the 'spectral' collection of
    ``module``. ``update=True`` runs one power iteration and (when the
    collection is mutable) persists the new ``u``.
    """
    out_dim = w2d.shape[0]

    def _init_u() -> jax.Array:
        # Per-layer u0: make_rng('params') folds the module path into the init
        # key, so same-shaped layers start power iteration from distinct
        # vectors (torch draws a fresh N(0,1) u per wrapped module).
        if module.has_rng("params"):
            key = module.make_rng("params")
        else:  # applied without an rng stream (e.g. manual re-init)
            key = jax.random.PRNGKey(0)
        u0 = jax.random.normal(key, (out_dim,), dtype=jnp.float32)
        return _l2_normalize(u0)

    u_var = module.variable("spectral", name, _init_u)
    u = u_var.value.astype(w2d.dtype)

    if update:
        v = _l2_normalize(jnp.matmul(w2d.T, u))
        u_new = _l2_normalize(jnp.matmul(w2d, v))
        v = jax.lax.stop_gradient(v)
        u_new = jax.lax.stop_gradient(u_new)
        if not module.is_initializing() and module.is_mutable_collection("spectral"):
            u_var.value = u_new.astype(jnp.float32)
    else:
        u_new = u
        v = jax.lax.stop_gradient(_l2_normalize(jnp.matmul(w2d.T, u)))

    sigma = jnp.dot(u_new, jnp.matmul(w2d, v))
    return w2d / sigma


class SNDense(nn.Module):
    """Dense layer with optional spectral norm (reference: SN'd nn.Linear).

    ``dtype`` is the compute dtype (params and SN math stay float32)."""

    features: int
    use_bias: bool = True
    use_sn: bool = True
    kernel_init: Initializer = nn.initializers.lecun_normal()
    bias_init: Initializer = nn.initializers.zeros
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        kernel = self.param("kernel", self.kernel_init, (x.shape[-1], self.features))
        if self.use_sn:
            w2d = kernel.T  # (out, in): output dim first, as torch reshapes
            w2d = spectral_normalize(self, w2d, update=train)
            kernel = w2d.T
        y = jnp.matmul(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class SNConv(nn.Module):
    """NHWC conv with optional spectral norm (reference: SN'd nn.Conv2d).

    Weight layout HWIO (TPU-native); for the power iteration the kernel is
    viewed as (O, H*W*I) — sigma is invariant to the column permutation vs
    torch's (O, I*kH*kW) flattening.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: Any = "SAME"
    use_bias: bool = True
    use_sn: bool = True
    kernel_init: Initializer = nn.initializers.lecun_normal()
    bias_init: Initializer = nn.initializers.zeros
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        kh, kw = self.kernel_size
        in_ch = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (kh, kw, in_ch, self.features))
        if self.use_sn:
            w2d = jnp.moveaxis(kernel, -1, 0).reshape(self.features, -1)
            w2d = spectral_normalize(self, w2d, update=train)
            kernel = jnp.moveaxis(w2d.reshape(self.features, kh, kw, in_ch), 0, -1)
        padding = self.padding
        if isinstance(padding, int):
            padding = ((padding, padding), (padding, padding))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=tuple(self.strides),
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class SNEmbed(nn.Module):
    """Embedding with optional spectral norm (reference: SN'd nn.Embedding,
    used for conditional discriminators)."""

    num_embeddings: int
    features: int
    use_sn: bool = True
    embedding_init: Initializer = nn.initializers.normal(stddev=0.02)

    @nn.compact
    def __call__(self, y: jax.Array, train: bool = True) -> jax.Array:
        table = self.param(
            "embedding", self.embedding_init, (self.num_embeddings, self.features)
        )
        if self.use_sn:
            table = spectral_normalize(self, table, update=train)
        return jnp.take(table, y, axis=0)
