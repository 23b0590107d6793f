"""Mesh-sharded FID feature extraction: G + embedder fused into ONE jitted
SPMD program.

The reference's eval hot loop (``/root/reference/third_party/fid/fid_score.py:
115-158`` via ``evaluate/gan.py:105-123``) dispatches ``size/50`` G forwards,
pulls every image batch to the host, and feeds it back into a separate
InceptionV3 forward — thousands of host round-trips per eval at AFHQ scale
(fid_size 50k). Here latent sampling, the G forward, and the embedder run as
one jitted program with the batch axis sharded over the data mesh; only the
``(B, d)`` feature matrix returns to the host, in chunks of ``batch_per_call``
(>= 512) instead of 50. The train step is SPMD; with this, the eval loop is
too.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from contrad_tpu.parallel.mesh import batch_sharding, replicated


def moments_embed_jax(x: jax.Array) -> jax.Array:
    """jnp mirror of :func:`contrad_tpu.evaluate.fid.moments_embed_fn`
    (channel moments + coarse 4x4 grid means), so the weights-free debug
    embedder can also run inside the sharded program. f32 on device vs f64
    on host: feature parity ~1e-6 (tested)."""
    n, h, w, _ = x.shape
    q = max(h // 4, 1)
    feats = [x.mean(axis=(1, 2)), x.std(axis=(1, 2))]
    for i in range(0, h - q + 1, q):
        for j in range(0, w - q + 1, q):
            feats.append(x[:, i : i + q, j : j + q].mean(axis=(1, 2, 3))[:, None])
    return jnp.concatenate([f.reshape(n, -1) for f in feats], axis=1)


def get_jax_embed_forward(name: str, mesh,
                          inception_path: Optional[str] = None) -> Callable:
    """A pure jax fn images[0,1] -> (n, d) features, with any weights
    replicated over the mesh (so the batch-sharded forward runs SPMD)."""
    if name == "moments":
        return moments_embed_jax
    if name == "inception":
        from contrad_tpu.evaluate.inception import (
            InceptionV3FID, load_inception_variables)

        variables = jax.device_put(load_inception_variables(inception_path),
                                   replicated(mesh))
        model = InceptionV3FID()

        def embed(x):
            pool3, _ = model.apply(variables, x.astype(jnp.float32))
            return pool3

        return embed
    raise ValueError(f"unknown fid embedder: {name}")


def make_feature_sampler(trainer, embedder: str = "inception",
                         batch_per_call: int = 512, use_ema: bool = False,
                         inception_path: Optional[str] = None) -> Callable:
    """Build ``feature_fn(state, n, seed) -> np (n, d)``: generate ``n``
    samples from the trainer's G and embed them, all on the mesh.

    The whole trial is ONE jitted SPMD program: latent sampling, the G
    forward, and the embedder run inside a ``lax.map`` over
    ``ceil(n / batch_per_call)`` chunks, and only the ``(n, d)`` feature
    matrix returns to the host. Per-chunk determinism is preserved exactly
    (chunk i uses PRNGKey(seed * 100003 + i), the same stream-splitting
    constant the host sampler path uses, fid.py:78) and ``seed`` is a traced
    scalar, so the n_avg trials of one eval share a single compiled program.
    NOTE the traced product is int32, so the host-path equivalence holds for
    seeds below ~21475 (2^31 / 100003); callers pass trial indices
    0..n_avg-1, comfortably inside that. (fold_in would dodge the wrap but
    changes the stream and breaks fid.py:78 parity.)
    Rationale: the previous host loop issued ~10 small dispatches per chunk
    (host-side PRNG + sample_latent + device_put + embed); through the
    single-chip axon tunnel each dispatch costs tens of ms of RPC latency,
    which measured as ~2/3 of the whole in-loop eval cost at fid_size=2000
    (round-4 eval-cadence diagnosis, BASELINE.md).

    ``use_ema`` selects the EMA generator (reference evaluates StyleGAN2 FID
    on g_ema, train_stylegan2.py:249).

    Multi-host: the program is collective — EVERY process must call
    ``feature_fn`` with identical arguments. Latents are computed inside the
    program from the replicated key (identical values at any world size;
    only the layout is sharded), and features come back fully replicated so
    every host reads the complete matrix (the reference gates FID on rank 0
    and samples on one GPU, train_gan.py:192-225 — here sampling/embedding
    stay distributed and only the cheap O(d^3) stats math is duplicated)."""
    from functools import partial

    mesh = trainer.mesh
    n_dev = int(mesh.devices.size)
    batch_per_call = max(n_dev, batch_per_call - batch_per_call % n_dev)
    embed = get_jax_embed_forward(embedder, mesh, inception_path)
    b_shard = batch_sharding(mesh)
    world = jax.process_count()
    # Cross-process readback of a process-sharded array is not addressable;
    # replicate the (small) feature output so every host sees all of it.
    out_sharding = replicated(mesh) if world > 1 else None

    def _gen_embed(state, i, seed):
        rng = jax.random.PRNGKey(seed * 100003 + i)
        z_rng, noise_rng = jax.random.split(rng)
        z = trainer.generator.sample_latent(z_rng, batch_per_call)
        z = jax.lax.with_sharding_constraint(z, b_shard)
        params = state.g_ema_params if use_ema else state.g_params
        g_state = state.g_ema_state if use_ema else state.g_state
        images, _ = trainer.g_apply(params, g_state, z, train=False,
                                    update_state=False, rng=noise_rng)
        return embed(images.astype(jnp.float32))

    @partial(jax.jit, static_argnames="n_chunks", out_shardings=out_sharding)
    def _trial(state, seed, n_chunks):
        # lax.map = sequential scan: device memory holds ONE chunk of images/
        # activations plus the accumulated (n_chunks, B, d) feature stack.
        feats = jax.lax.map(lambda i: _gen_embed(state, i, seed),
                            jnp.arange(n_chunks))
        return feats.reshape(n_chunks * batch_per_call, feats.shape[-1])

    def feature_fn(state, n: int, seed: int = 0) -> np.ndarray:
        n_chunks = -(-n // batch_per_call)
        f = _trial(state, jnp.int32(seed), n_chunks)
        return np.asarray(jax.device_get(f))[:n]

    return feature_fn
