"""InceptionV3 (FID variant) in flax (reference: ``third_party/fid/inception.py``).

The FID network is the TF "inception-2015-12-05" graph as reproduced by the
pytorch-fid project: torchvision InceptionV3 topology with 1008-way fc and
three quirks (reference ``inception.py:199-314``):
  * every in-block average pool uses count_include_pad=False,
  * Mixed_7c (second InceptionE) uses MAX pool in its pool branch,
  * inputs are bilinear-resized to 299x299 (half-pixel centers /
    align_corners=False) and rescaled to [-1, 1] (``inception.py:131-157``).

Module names mirror the torch checkpoint keys exactly so
:func:`convert_torch_checkpoint` is a mechanical (O,I,H,W)->HWIO transpose.
Weights: put ``pt_inception-2015-12-05-6726825d.pth`` under ``third_party/fid/``
(or point $INCEPTION_WEIGHTS at it). This environment has no egress, so FID
runs are gated on that file; everything else (stats caching, the Frechet math,
the score tracker) is exercised with an injected embedder.

The embedder runs fully jitted on device in bf16-friendly convs; only the
2048-d pool3 features are fetched to host.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

DEFAULT_WEIGHTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "third_party", "fid", "pt_inception-2015-12-05-6726825d.pth")

_avg_pool_ex = partial(nn.avg_pool, window_shape=(3, 3), strides=(1, 1),
                       padding=((1, 1), (1, 1)), count_include_pad=False)
_max_pool_s2 = partial(nn.max_pool, window_shape=(3, 3), strides=(2, 2))


class BasicConv2d(nn.Module):
    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=self.padding, use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         name="bn")(x)
        return jax.nn.relu(x)


def _pad(p):
    if isinstance(p, int):
        return ((p, p), (p, p))
    return ((p[0], p[0]), (p[1], p[1]))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=_pad(2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=_pad(1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=_pad(1), name="branch3x3dbl_3")(b3)
        bp = _avg_pool_ex(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=_pad(1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = _max_pool_s2(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=_pad((0, 3)), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=_pad((3, 0)), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=_pad((3, 0)), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=_pad((0, 3)), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=_pad((3, 0)), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=_pad((0, 3)), name="branch7x7dbl_5")(bd)
        bp = _avg_pool_ex(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=_pad((0, 3)), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=_pad((3, 0)), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = _max_pool_s2(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool: str = "avg"  # Mixed_7b: avg (count_include_pad=False); Mixed_7c: MAX

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=_pad((0, 1)), name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=_pad((1, 0)), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=_pad(1), name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=_pad((0, 1)), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=_pad((1, 0)), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool == "avg":
            bp = _avg_pool_ex(x)
        else:
            bp = nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3FID(nn.Module):
    """Full FID InceptionV3; returns (pool3 2048-d features, logits)."""

    num_classes: int = 1008

    @nn.compact
    def __call__(self, x, resize: bool = True):
        # x: (N, H, W, 3) float in [0, 1]
        if resize:
            x = jax.image.resize(x, (x.shape[0], 299, 299, 3), method="bilinear")
        x = x * 2.0 - 1.0

        x = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=_pad(1), name="Conv2d_2b_3x3")(x)
        x = _max_pool_s2(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool_s2(x)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)

        pool3 = jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> (N, 2048)
        logits = nn.Dense(self.num_classes, name="fc")(pool3)
        return pool3, logits


# ------------------------------------------------------------- weights

def convert_torch_checkpoint(state_dict) -> dict:
    """torch pt_inception state_dict -> flax variables (params + batch_stats).

    Conv weights (O,I,H,W)->HWIO; BN weight/bias/running_mean/var ->
    scale/bias/mean/var. Module names match the checkpoint keys 1:1."""
    params: dict = {}
    batch_stats: dict = {}

    def put(tree, path, leaf):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf

    for key, tensor in state_dict.items():
        val = np.asarray(tensor)
        parts = key.split(".")
        if parts[-2] == "conv" and parts[-1] == "weight":
            put(params, parts[:-1] + ["kernel"], val.transpose(2, 3, 1, 0))
        elif parts[-2] == "bn":
            name = parts[-1]
            if name == "weight":
                put(params, parts[:-1] + ["scale"], val)
            elif name == "bias":
                put(params, parts[:-1] + ["bias"], val)
            elif name == "running_mean":
                put(batch_stats, parts[:-1] + ["mean"], val)
            elif name == "running_var":
                put(batch_stats, parts[:-1] + ["var"], val)
            # num_batches_tracked dropped
        elif parts[-2] == "fc":
            if parts[-1] == "weight":
                put(params, parts[:-1] + ["kernel"], val.transpose(1, 0))
            else:
                put(params, parts[:-1] + ["bias"], val)
    return {"params": params, "batch_stats": batch_stats}


def load_inception_variables(path: Optional[str] = None) -> dict:
    path = path or os.environ.get("INCEPTION_WEIGHTS", DEFAULT_WEIGHTS)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"Inception FID weights not found at {path}. Download "
            f"pt_inception-2015-12-05-6726825d.pth (pytorch-fid) and place it "
            f"there, or set $INCEPTION_WEIGHTS.")
    import torch

    state_dict = torch.load(path, map_location="cpu", weights_only=True)
    return convert_torch_checkpoint(state_dict)


def _host_batched(forward, mesh=None, chunk=None):
    """Alias of :func:`contrad_tpu.parallel.mesh.host_batched` — the one
    pad/shard/slice wrapper shared by every mesh-batched host consumer."""
    from contrad_tpu.parallel.mesh import host_batched

    return host_batched(forward, mesh, chunk=chunk)


def get_inception_embed_fn(path: Optional[str] = None,
                           per_device_batch: int = 256, mesh=None,
                           batch_size: Optional[int] = None):
    """Returns embed_fn(images uint8/float NHWC) -> np (n, 2048) pool3
    features. With ``mesh`` the forward shards over the data axis (variables
    replicated) — n_dev× embedding throughput for offline scoring and stats
    precompute; default is the single default device. ``per_device_batch``
    caps the PER-DEVICE images per dispatch (so the effective dispatch is
    ``per_device_batch * n_devices``): the 299^2 net holds ~5.6 MB of
    activations per image, so an uncapped FID@10k stats precompute is a
    >50 GB allocation (this OOM'd a 16 GB chip in the production-scale
    drill; the reference streams batches of 50 from a DataLoader instead —
    fid_score.py:161-185). ``batch_size`` is a deprecated alias of
    ``per_device_batch`` kept because the old parameter (nominal host batch,
    silently ignored) shared the name."""
    if batch_size is not None:
        per_device_batch = batch_size
    variables = load_inception_variables(path)
    if mesh is not None:
        from contrad_tpu.parallel.mesh import replicate

        variables = replicate(variables, mesh)
    model = InceptionV3FID()

    @jax.jit
    def forward(x):
        x = x.astype(jnp.float32)
        pool3, _ = model.apply(variables, x)
        return pool3

    return _host_batched(forward, mesh, chunk=per_device_batch)


def get_inception_logits_fn(path: Optional[str] = None, mesh=None,
                            per_device_batch: int = 256,
                            batch_size: Optional[int] = None):
    """Returns softmax_fn(images) -> np (n, 1008) class probabilities (for
    IS); ``mesh`` shards the forward over the data axis like
    :func:`get_inception_embed_fn`, with the same per-device dispatch cap
    (``batch_size`` is the same deprecated alias)."""
    if batch_size is not None:
        per_device_batch = batch_size
    variables = load_inception_variables(path)
    if mesh is not None:
        from contrad_tpu.parallel.mesh import replicate

        variables = replicate(variables, mesh)
    model = InceptionV3FID()

    @jax.jit
    def forward(x):
        x = x.astype(jnp.float32)
        _, logits = model.apply(variables, x)
        return jax.nn.softmax(logits, axis=-1)

    return _host_batched(forward, mesh, chunk=per_device_batch)
