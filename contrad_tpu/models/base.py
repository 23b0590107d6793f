"""Discriminator head protocol (reference: ``models/gan/base.py``).

Every discriminator is a backbone ("penultimate" feature extractor) plus three
heads:

  * ``linear``   — the GAN score head: a plain linear layer, or a 2-layer
    LeakyReLU(0.1) MLP when ``mlp_linear=True`` (reference TinyDiscriminator,
    ``base.py:14-35``);
  * ``projection`` / ``projection2`` — two independent 2-layer MLPs
    ``d_penul -> d_hidden -> d_project`` (reference ``base.py:92-101``) used by
    the SimCLR and supervised-contrastive losses.

The ContraD mechanism: with ``sg_linear=True`` the GAN head sees
``stop_gradient(features)`` so the backbone is trained *only* by the
contrastive losses (reference ``base.py:123-126``).

JAX notes vs the reference:
  * All heads are always computed (the reference does the same,
    ``base.py:128-130``), so the reference's ``_nuisance`` trick for DDP
    unused-parameter detection (``base.py:132-133``) is unnecessary — there is
    no DDP; gradients of unused outputs are simply zero.
  * ``finetuning`` (eval-mode, stop-gradient features, ``base.py:113-119``) is
    expressed by ``train=False`` on the backbone + stop_gradient.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from contrad_tpu.ops.spectral_norm import SNDense, SNEmbed

Initializer = Any


class TinyDiscriminatorHead(nn.Module):
    """2-layer GAN score head (reference TinyDiscriminator, base.py:14-35)."""

    n_features: int
    n_classes: int = 1
    d_hidden: int = 128
    use_sn: bool = True
    kernel_init: Initializer = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x, y=None, train: bool = True):
        h = SNDense(self.d_hidden, use_sn=self.use_sn, kernel_init=self.kernel_init,
                    name="l1")(x, train=train)
        h = jax.nn.leaky_relu(h, 0.1)
        d = SNDense(1, use_sn=self.use_sn, kernel_init=self.kernel_init,
                    name="l2")(h, train=train)
        if y is not None:
            w_y = SNEmbed(self.n_classes, self.d_hidden, use_sn=self.use_sn,
                          name="linear_y")(y, train=train)
            d = d + jnp.sum(h * w_y, axis=1, keepdims=True)
        return d


class LinearDiscriminatorHead(nn.Module):
    """Plain linear GAN score head (reference LinearDiscriminator, base.py:38-54)."""

    n_features: int
    n_classes: int = 1
    use_sn: bool = True
    kernel_init: Initializer = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x, y=None, train: bool = True):
        d = SNDense(1, use_sn=self.use_sn, kernel_init=self.kernel_init,
                    name="linear")(x, train=train)
        if y is not None:
            w_y = SNEmbed(self.n_classes, self.n_features, use_sn=self.use_sn,
                          name="linear_y")(y, train=train)
            d = d + jnp.sum(x * w_y, axis=1, keepdims=True)
        return d


class ProjectionMLP(nn.Module):
    """d_penul -> d_hidden -> d_project with LeakyReLU(0.1) (base.py:92-101)."""

    d_hidden: int
    d_project: int
    use_sn: bool = True
    kernel_init: Initializer = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = SNDense(self.d_hidden, use_sn=self.use_sn, kernel_init=self.kernel_init,
                    name="fc1")(x, train=train)
        h = jax.nn.leaky_relu(h, 0.1)
        return SNDense(self.d_project, use_sn=self.use_sn, kernel_init=self.kernel_init,
                       name="fc2")(h, train=train)


class LinearClassifier(nn.Module):
    """Linear probe head for representation evaluation
    (reference LinearWrapper, base.py:56-61)."""

    n_classes: int

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.n_classes, name="linear")(x)


class Discriminator(nn.Module):
    """Backbone + {linear, projection, projection2} heads.

    ``backbone`` must be a linen module mapping an NHWC image batch in [0, 1]
    to (N, d_penul) features, accepting a ``train`` kwarg.
    """

    backbone: nn.Module
    d_penul: int
    n_classes: int = 1
    d_hidden: int = 128
    d_project: int = 128
    mlp_linear: bool = False
    use_sn: bool = True
    head_kernel_init: Initializer = nn.initializers.lecun_normal()

    def setup(self):
        if self.mlp_linear:
            self.linear = TinyDiscriminatorHead(
                self.d_penul, self.n_classes, self.d_hidden,
                use_sn=self.use_sn, kernel_init=self.head_kernel_init)
        else:
            self.linear = LinearDiscriminatorHead(
                self.d_penul, self.n_classes,
                use_sn=self.use_sn, kernel_init=self.head_kernel_init)
        self.projection = ProjectionMLP(
            self.d_hidden, self.d_project,
            use_sn=self.use_sn, kernel_init=self.head_kernel_init)
        self.projection2 = ProjectionMLP(
            self.d_hidden, self.d_project,
            use_sn=self.use_sn, kernel_init=self.head_kernel_init)

    @property
    def packed_io(self) -> int:
        """Packed-image factor the backbone can consume directly (1 = none)."""
        return int(getattr(self.backbone, "packed_io", 1))

    def penultimate(self, x, train: bool = True):
        return self.backbone(x, train=train)

    def __call__(
        self,
        x: jax.Array,
        y: Optional[jax.Array] = None,
        train: bool = True,
        sg_linear: bool = False,
        finetuning: bool = False,
        packed_in: bool = False,
    ):
        """Returns (d, aux) with aux = {penultimate, projection, projection2}.

        ``packed_in``: ``x`` is space-to-depth packed and the backbone
        consumes it directly (StyleGAN2-512 packed train path; only
        backbones with a packed stem accept it)."""
        bk = {"packed_in": True} if packed_in else {}
        if finetuning:
            feats = jax.lax.stop_gradient(self.backbone(x, train=False, **bk))
        else:
            feats = self.backbone(x, train=train, **bk)

        feats_d = jax.lax.stop_gradient(feats) if sg_linear else feats
        d = self.linear(feats_d, y, train=train)
        proj = self.projection(feats, train=train)
        proj2 = self.projection2(feats, train=train)
        return d, {"penultimate": feats, "projection": proj, "projection2": proj2}


def l2_normalize_rows(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    """F.normalize(x, dim=1) equivalent."""
    norm = jnp.linalg.norm(x, axis=1, keepdims=True)
    return x / jnp.maximum(norm, eps)


class NullDiscriminator(nn.Module):
    """Identity-score D: sums inputs per sample (reference base.py:64-70)."""

    @nn.compact
    def __call__(self, x, y=None, train: bool = True):
        return jnp.sum(x.reshape(x.shape[0], -1), axis=1, keepdims=True)


def projection(d_apply, d_params, d_state, inputs, train: bool = True):
    """Convenience: run D and return the (un-normalized) projection head
    output (reference base.py:73-76; the reference's `+ d.mean()*0` nuisance
    is unnecessary without DDP)."""
    (_, aux), new_state = d_apply(d_params, d_state, inputs, train=train)
    return aux["projection"], new_state
