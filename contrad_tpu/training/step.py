"""The jitted SPMD GAN train steps.

Reference hot loops:
  * ``train_gan.py:124-227`` — per step, n_critic D updates (fresh real batch
    + fresh fakes each) then one G update on fresh fakes vs the updated D.
  * ``train_stylegan2.py:147-279`` — EMA accumulate, then G update FIRST, then
    a D update REUSING the G-phase fakes, lazy R1 every d_reg_every steps on
    augmented reals, then n_critic-1 extra D updates.

Here each full step — latent sampling, G forward, on-device augmentation,
D forward, losses (with cross-replica contrastive negatives), Adam updates,
spectral-norm power iterations, BN stats, EMA — is ONE compiled XLA program
over the device mesh. The reference's NCCL all-reduce/all-gather/SyncBN/
barriers are implicit: the step is written on global arrays and XLA partitions
it over the 'data' mesh axis, inserting ICI collectives.

Lazy R1 is handled with two compiled step variants (with/without the
grad-of-grad) selected host-side by step index — cheaper than carrying a
lax.cond with a double-backward in the common path.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from contrad_tpu.parallel.mesh import (
    batch_sharding, get_mesh, place_global_batch, replicate)
from contrad_tpu.training.modes import ModeCtx, get_mode
from contrad_tpu.training.state import GANTrainState, ema_update


def make_d_apply(discriminator, packed_in: bool = False) -> Callable:
    """Functional apply for the discriminator, returning ((d, aux), new_state).

    ``update_state=False`` runs in train mode without persisting mutable
    collections (used by penalty/R1-internal D calls). ``packed_in`` bakes the
    packed-image input path (x is space-to-depth packed; StyleGAN2-512 train
    step) — eval consumers keep the default image layout."""
    extra = {"packed_in": True} if packed_in else {}

    def d_apply(params, state, x, y=None, train=True, sg_linear=False,
                finetuning=False, update_state=True):
        variables = {"params": params, **state}
        if train and update_state and state:
            out, mutated = discriminator.apply(
                variables, x, y=y, train=train, sg_linear=sg_linear,
                finetuning=finetuning, mutable=list(state.keys()), **extra)
            return out, mutated
        out = discriminator.apply(
            variables, x, y=y, train=train, sg_linear=sg_linear,
            finetuning=finetuning, **extra)
        return out, state

    return d_apply


def make_g_apply(generator, packed_out: bool = False) -> Callable:
    """Functional apply for the generator. ``rng`` feeds the linen 'noise'
    stream (StyleGAN2 noise injection + style mixing); extra kwargs pass
    through (style_mix, ...). ``packed_out`` bakes the packed-image output
    (StyleGAN2-512 train step); eval consumers keep images."""
    extra = {"packed_out": True} if packed_out else {}

    def g_apply(params, state, z, train=True, update_state=True, rng=None,
                **kwargs):
        variables = {"params": params, **state}
        rngs = {"noise": rng} if rng is not None else None
        if train and update_state and state:
            out, mutated = generator.apply(
                variables, z, train=train, rngs=rngs,
                mutable=list(state.keys()), **extra, **kwargs)
            return out, mutated
        out = generator.apply(variables, z, train=train, rngs=rngs,
                              **extra, **kwargs)
        return out, state

    return g_apply


def _to_float(images: jax.Array, dtype=jnp.float32) -> jax.Array:
    """uint8 [0,255] or float [0,1] -> float [0,1] in ``dtype``. Keeping
    batches uint8 until inside the step quarters host->HBM traffic. Under a
    bf16 compute dtype the images convert straight to bf16 so the whole
    augment chain runs at half the HBM bytes (the 32^2 flagship step is
    bandwidth-bound, BASELINE.md round-3 roofline); loss math stays f32
    (losses.py)."""
    if images.dtype == jnp.uint8:
        return images.astype(dtype) / 255.0
    return images.astype(dtype)


class GANTrainer:
    """Builds and owns the jitted train/eval steps (train_gan.py semantics:
    D-then-G, fresh fakes for each phase, no EMA by default)."""

    def __init__(
        self,
        generator,
        discriminator,
        mode: str,
        augment_fn: Callable,
        g_optimizer: optax.GradientTransformation,
        d_optimizer: optax.GradientTransformation,
        loss_type: str,
        penalty: str = "none",
        temp: float = 0.1,
        lbd_a: float = 1.0,
        lbd: float = 10.0,
        lbd2: float = 10.0,
        n_critic: int = 1,
        ema: bool = False,
        mesh=None,
        g_kwargs: Optional[dict] = None,
        real_aug_fn: Optional[Callable] = None,
        packed_images: int = 1,
    ):
        self.generator = generator
        self.discriminator = discriminator
        self.g_tx = g_optimizer
        self.d_tx = d_optimizer
        self.n_critic = n_critic
        self.ema = ema
        self.mesh = mesh if mesh is not None else get_mesh()
        self.g_kwargs = g_kwargs or {}  # e.g. {'style_mix': 0.9} for StyleGAN2
        # Dataset-baked real augmentation (reference datasets.py:49-69,83-126
        # bakes RandomHorizontalFlip into cifar*_hflip / AFHQ transforms);
        # applied to reals before the mode's augment chain sees them.
        self.real_aug_fn = real_aug_fn
        # Conditional path: when the D has class heads (n_classes > 1,
        # reference base.py:107-130 projection discrimination), train_step
        # takes real labels; fake labels are sampled uniformly (G itself is
        # unconditional, as in the reference).
        self.n_classes = int(getattr(discriminator, "n_classes", 1) or 1)
        self.conditional = self.n_classes > 1
        # The step's image dtype: the D's compute dtype. bf16 models augment
        # and discriminate in bf16 (halves the activation/augment HBM
        # traffic); f32 models are unchanged. Protocol Ds carry the dtype on
        # their backbone (models/base.py Discriminator wrapper).
        self.image_dtype = jnp.dtype(
            getattr(discriminator, "dtype", None)
            or getattr(getattr(discriminator, "backbone", None), "dtype", None)
            or jnp.float32)

        # Packed-image train path (512^2 StyleGAN2): G emits space-to-depth
        # packed images, the augment chain (caller-built with a matching
        # ``get_augment(..., pack=f)``) operates on them, and D consumes them
        # — no pack/unpack layout copies between the three (measured
        # ~4.8 ms/step of pure relayout in the round-5 512^2 trace). Eval
        # surfaces (``self.g_apply``, ``_sample``, sharded FID) keep images.
        self.pack_images = int(packed_images)
        if self.pack_images > 1:
            assert getattr(generator, "packed_io", 1) == self.pack_images, \
                "generator cannot emit packed images"
            assert getattr(discriminator, "packed_io", 1) == self.pack_images, \
                "discriminator cannot consume packed images"

        self.g_apply = make_g_apply(generator)  # image-layout (eval surfaces)
        self._g_apply_train = make_g_apply(
            generator, packed_out=self.pack_images > 1)
        self.d_apply = make_d_apply(
            discriminator, packed_in=self.pack_images > 1)
        self.ctx = ModeCtx(
            d_apply=self.d_apply,
            augment_fn=augment_fn,
            loss_type=loss_type,
            penalty=penalty,
            temp=temp,
            lbd_a=lbd_a,
            lbd=lbd, lbd2=lbd2,
        )
        self.loss_D, self.loss_G = get_mode(mode)

        self.step_fn = jax.jit(self._step, donate_argnums=(0,))
        self.sample_fn = jax.jit(self._sample, static_argnums=(1, 2, 3))
        # Fused-gather step variants (built lazily per indexing style):
        # {False: global-row gather, True: shard-local gather}.
        self._indexed_fns = {}

    # ------------------------------------------------------------- phases

    def _d_update(self, d_params, d_state, d_opt_state, images, gen_images,
                  loss_rng, y_real=None, y_gen=None):
        """One D gradient step on (images, gen_images); returns new D triple +
        metrics."""

        def d_loss_fn(p):
            return self.loss_D(self.ctx, p, d_state, images, gen_images,
                               loss_rng, y_real=y_real, y_gen=y_gen)

        (_, (metrics, d_state)), grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(d_params)
        updates, d_opt_state = self.d_tx.update(grads, d_opt_state, d_params)
        d_params = optax.apply_updates(d_params, updates)
        return d_params, d_state, d_opt_state, metrics

    def _d_substep(self, g_params, carry, xs):
        images, labels = xs if isinstance(xs, tuple) else (xs, None)
        d_params, d_state, d_opt_state, g_state, rng = carry
        rng, z_rng, noise_rng, loss_rng, y_rng = jax.random.split(rng, 5)
        n = images.shape[0]

        z = self.generator.sample_latent(z_rng, n)
        gen_images, g_state = self._g_apply_train(
            g_params, g_state, z, train=True, rng=noise_rng, **self.g_kwargs)
        gen_images = jax.lax.stop_gradient(gen_images)

        y_gen = (jax.random.randint(y_rng, (n,), 0, self.n_classes)
                 if labels is not None else None)
        d_params, d_state, d_opt_state, metrics = self._d_update(
            d_params, d_state, d_opt_state, images, gen_images, loss_rng,
            y_real=labels, y_gen=y_gen)
        return (d_params, d_state, d_opt_state, g_state, rng), metrics

    def _g_update(self, g_params, g_state, g_opt_state, d_params, d_state,
                  z, noise_rng, g_loss_rng, y_gen=None):
        """One G gradient step; returns new G triple, advanced D state, loss."""

        def g_loss_fn(p):
            gen_images, new_g_state = self._g_apply_train(
                p, g_state, z, train=True, rng=noise_rng, **self.g_kwargs)
            g_loss, new_d_state = self.loss_G(
                self.ctx, d_params, d_state, gen_images, g_loss_rng, y_gen=y_gen)
            return g_loss, (new_g_state, new_d_state, gen_images)

        (g_loss, (g_state, d_state, gen_images)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(g_params)
        g_updates, g_opt_state = self.g_tx.update(g_grads, g_opt_state, g_params)
        g_params = optax.apply_updates(g_params, g_updates)
        return g_params, g_state, g_opt_state, d_state, g_loss, gen_images

    # ------------------------------------------------------------- train

    def _step(self, state: GANTrainState, images: jax.Array, ema_decay=0.0,
              labels=None):
        """images: (n_critic * B, H, W, C), uint8 or float in [0,1];
        labels: (n_critic * B,) int class labels (conditional D only)."""
        if self.pack_images > 1:
            # Pack BEFORE the float convert: space_to_depth is a pure
            # permutation, so it commutes with the elementwise conversion,
            # and permuting uint8 moves 1/4 (vs f32) of the bytes of the
            # hottest tensor in the 512^2 step (round-5 trace: the f32-side
            # pack was a 0.7 ms "data formatting" copy).
            from contrad_tpu.ops.packed import space_to_depth
            images = space_to_depth(images, self.pack_images)
        images = _to_float(images, self.image_dtype)
        rng = state.rng
        if self.real_aug_fn is not None:
            rng, ra_rng = jax.random.split(rng)
            images = self.real_aug_fn(ra_rng, images)
        nb = images.shape[0] // self.n_critic
        images = images.reshape((self.n_critic, nb) + images.shape[1:])
        xs = images
        if labels is not None:
            xs = (images, labels.reshape(self.n_critic, nb))

        carry = (state.d_params, state.d_state, state.d_opt_state, state.g_state, rng)
        d_substep = functools.partial(self._d_substep, state.g_params)
        (d_params, d_state, d_opt_state, g_state, rng), metrics_seq = jax.lax.scan(
            d_substep, carry, xs)
        # Reference logs the last critic iteration's losses (train_gan.py:184-190).
        metrics = jax.tree.map(lambda m: m[-1], metrics_seq)

        rng, z_rng, noise_rng, g_loss_rng, y_rng, next_rng = jax.random.split(rng, 6)
        z = self.generator.sample_latent(z_rng, nb)
        y_gen = (jax.random.randint(y_rng, (nb,), 0, self.n_classes)
                 if labels is not None else None)
        g_params, g_state, g_opt_state, d_state, g_loss, _ = self._g_update(
            state.g_params, g_state, state.g_opt_state, d_params, d_state,
            z, noise_rng, g_loss_rng, y_gen=y_gen)
        metrics["G_loss"] = g_loss

        if self.ema and state.g_ema_params is not None:
            g_ema_params = ema_update(state.g_ema_params, g_params, ema_decay)
            g_ema_state = jax.tree.map(lambda x: x, g_state)  # buffers copied
        else:
            g_ema_params = state.g_ema_params
            g_ema_state = state.g_ema_state

        new_state = state.replace(
            step=state.step + 1,
            rng=next_rng,
            g_params=g_params, g_state=g_state,
            d_params=d_params, d_state=d_state,
            g_opt_state=g_opt_state, d_opt_state=d_opt_state,
            g_ema_params=g_ema_params, g_ema_state=g_ema_state,
        )
        return new_state, metrics

    def train_step(self, state: GANTrainState, images, ema_decay: float = 0.0,
                   labels=None):
        if self.conditional and labels is None:
            raise ValueError("discriminator has n_classes>1: pass labels")
        if not self.conditional:
            labels = None  # unconditional D ignores dataset labels
        return self.step_fn(state, images, ema_decay, labels)

    # ------------------------------------------------- fused-gather step

    def _make_batch_gather(self, local: bool):
        """Device-side batch gather for the fused step. ``local=False``:
        ``data`` is replicated, ``idx`` holds global rows — each device
        gathers its batch-shard's rows from its own copy. ``local=True``
        (ShardedDeviceBatchIterator): ``data`` is sharded over the data axis
        and ``idx`` holds shard-local rows — a shard_map take."""
        from jax.sharding import PartitionSpec as Pspec

        from contrad_tpu.parallel.mesh import DATA_AXIS

        if local:
            spec = Pspec(DATA_AXIS)
            return jax.shard_map(
                lambda data, idx: jnp.take(data, idx, axis=0),
                mesh=self.mesh, in_specs=(spec, spec), out_specs=spec)

        def gather(data, idx):
            batch = jnp.take(data, idx, axis=0)
            return jax.lax.with_sharding_constraint(
                batch, batch_sharding(self.mesh))

        return gather

    def _build_indexed(self, local: bool):
        gather = self._make_batch_gather(local)

        def fn(state, data, idx, ema_decay, labels):
            return self._step(state, gather(data, idx), ema_decay, labels)

        return jax.jit(fn, donate_argnums=(0,))

    def train_step_indexed(self, state: GANTrainState, data, idx,
                           local: bool = False, ema_decay: float = 0.0,
                           labels=None):
        """Train step with the batch gather fused INTO the jitted program:
        ``data`` is the device-resident dataset (DeviceBatchIterator /
        ShardedDeviceBatchIterator ``.images``) and ``idx`` the step's index
        vector. One XLA dispatch per step — only ~4 KB of indices crosses the
        host link (the separate gather dispatch costs ~9 ms/step through a
        tunneled device; fused, it also pipelines with the step program)."""
        if self.conditional and labels is None:
            raise ValueError("discriminator has n_classes>1: pass labels")
        if not self.conditional:
            labels = None
        fn = self._indexed_fns.get(local)
        if fn is None:
            fn = self._indexed_fns[local] = self._build_indexed(local)
        return fn(state, data, idx, ema_decay, labels)

    # ------------------------------------------- multi-step (scan) dispatch

    def _build_indexed_multi(self, local: bool, with_labels: bool):
        gather = self._make_batch_gather(local)

        def fn(state, data, idx_block, ema_decay, labels_block):
            def body(st, xs):
                idx, lab = xs if with_labels else (xs, None)
                return self._step(st, gather(data, idx), ema_decay, lab)

            xs = (idx_block, labels_block) if with_labels else idx_block
            st, metrics_seq = jax.lax.scan(body, state, xs)
            # reference logs the last step's losses
            return st, jax.tree.map(lambda m: m[-1], metrics_seq)

        return jax.jit(fn, donate_argnums=(0,))

    def train_steps_indexed(self, state: GANTrainState, data, idx_block,
                            local: bool = False, ema_decay: float = 0.0,
                            labels_block=None):
        """K fused-gather train steps in ONE jitted program (``lax.scan``
        over the leading axis of ``idx_block`` (K, n)): a single XLA dispatch
        executes K steps, amortizing the per-dispatch host RPC (measured
        ~8 ms/step through a tunneled device; ~50 us locally). Numerically
        identical to K sequential ``train_step_indexed`` calls with the same
        index vectors (tested). Returns the LAST step's metrics."""
        if self.conditional and labels_block is None:
            raise ValueError("discriminator has n_classes>1: pass labels")
        if not self.conditional:
            labels_block = None
        key = ("multi", local, labels_block is not None)
        fn = self._indexed_fns.get(key)
        if fn is None:
            fn = self._indexed_fns[key] = self._build_indexed_multi(
                local, labels_block is not None)
        return fn(state, data, idx_block, ema_decay, labels_block)

    # ------------------------------------------------------------- eval

    def _sample(self, state: GANTrainState, n: int, use_ema: bool = False,
                train: bool = False, seed=7):
        rng = jax.random.fold_in(state.rng, seed)
        z_rng, noise_rng = jax.random.split(rng)
        z = self.generator.sample_latent(z_rng, n)
        params = state.g_ema_params if use_ema else state.g_params
        g_state = state.g_ema_state if use_ema else state.g_state
        out, _ = self.g_apply(params, g_state, z, train=train,
                              update_state=False, rng=noise_rng)
        return out

    def sample_from_z(self, state: GANTrainState, z, use_ema: bool = False):
        params = state.g_ema_params if use_ema else state.g_params
        g_state = state.g_ema_state if use_ema else state.g_state
        rng = jax.random.fold_in(state.rng, 11)
        out, _ = self.g_apply(params, g_state, z, train=False,
                              update_state=False, rng=rng)
        return out

    # ------------------------------------------------------------- placement

    def place_state(self, state: GANTrainState) -> GANTrainState:
        """Replicate the train state over the mesh."""
        return replicate(state, self.mesh)

    def place_batch(self, images):
        """Single-host: ``images`` is the global batch. Multi-host: ``images``
        is this process's contiguous slice of it (from a sharded
        BatchIterator) and the global array is assembled per-process."""
        if jax.process_count() > 1:
            return place_global_batch(images, self.mesh)
        return jax.device_put(images, batch_sharding(self.mesh))


class StyleGAN2Trainer(GANTrainer):
    """train_stylegan2.py semantics: EMA accumulate first (pre-update params),
    G update BEFORE D, D reuses the G-phase fakes, lazy R1 on augmented reals
    every d_reg_every steps with (0.5*lbd_r1)*r1*d_reg_every scaling
    (reference train_stylegan2.py:163-229), style mixing in G forwards."""

    def __init__(self, *args, lbd_r1: float = 10.0, d_reg_every: int = 16,
                 style_mix: float = 0.9, **kwargs):
        kwargs.setdefault("ema", True)
        kwargs.setdefault("g_kwargs", {"style_mix": style_mix})
        super().__init__(*args, **kwargs)
        self.lbd_r1 = lbd_r1
        self.d_reg_every = d_reg_every
        # two compiled variants: with/without the R1 grad-of-grad
        self.step_fn = jax.jit(self._sg2_step, donate_argnums=(0,),
                               static_argnums=(3,))

    def _r1(self, d_params, d_state, images, rng):
        """R1 on augmented, detached reals (reference train_stylegan2.py:106-113):
        E[sum of squared grads of D(x) w.r.t. x]."""
        x = jax.lax.stop_gradient(self.ctx.augment_fn(rng, images))

        def d_sum(xx):
            (d, _), _ = self.d_apply(d_params, d_state, xx, train=True,
                                     update_state=False)
            return jnp.sum(d)

        grads = jax.grad(d_sum)(x).astype(jnp.float32)  # f32 square-sum
        n = x.shape[0]
        return jnp.mean(jnp.sum(grads.reshape(n, -1) ** 2, axis=1))

    def _sg2_step(self, state: GANTrainState, images: jax.Array,
                  ema_decay, do_r1: bool):
        if self.pack_images > 1:
            # Pack BEFORE the float convert: space_to_depth is a pure
            # permutation, so it commutes with the elementwise conversion,
            # and permuting uint8 moves 1/4 (vs f32) of the bytes of the
            # hottest tensor in the 512^2 step (round-5 trace: the f32-side
            # pack was a 0.7 ms "data formatting" copy).
            from contrad_tpu.ops.packed import space_to_depth
            images = space_to_depth(images, self.pack_images)
        images = _to_float(images, self.image_dtype)
        rng = state.rng
        if self.real_aug_fn is not None:
            rng, ra_rng = jax.random.split(rng)
            images = self.real_aug_fn(ra_rng, images)
        nb = images.shape[0] // self.n_critic
        images = images.reshape((self.n_critic, nb) + images.shape[1:])

        # 1. EMA with pre-update params (reference :174-176).
        if state.g_ema_params is not None:
            g_ema_params = ema_update(state.g_ema_params, state.g_params, ema_decay)
            g_ema_state = jax.tree.map(lambda x: x, state.g_state)
        else:
            g_ema_params, g_ema_state = state.g_ema_params, state.g_ema_state

        rng, z_rng, noise_rng, g_loss_rng = jax.random.split(rng, 4)

        # 2. G phase first (reference :184-194); keep its fakes.
        z = self.generator.sample_latent(z_rng, nb)
        (g_params, g_state, g_opt_state, d_state, g_loss, gen_images
         ) = self._g_update(
            state.g_params, state.g_state, state.g_opt_state,
            state.d_params, state.d_state, z, noise_rng, g_loss_rng)

        # 3. D phase on the same (pre-G-update) fakes (reference :196-216).
        rng, d_loss_rng, r1_rng = jax.random.split(rng, 3)
        d_params, d_state, d_opt_state = state.d_params, d_state, state.d_opt_state
        gen_images = jax.lax.stop_gradient(gen_images)

        def d_loss_fn(p, with_r1: bool):
            total, (metrics, new_d_state) = self.loss_D(
                self.ctx, p, d_state, images[0], gen_images, d_loss_rng)
            if with_r1:
                r1 = self._r1(p, d_state, images[0], r1_rng)
                total = total + (0.5 * self.lbd_r1) * r1 * self.d_reg_every
                metrics = dict(metrics, D_r1=r1)
            else:
                metrics = dict(metrics, D_r1=jnp.zeros(()))
            return total, (metrics, new_d_state)

        r1_vag = jax.value_and_grad(
            lambda p: d_loss_fn(p, True), has_aux=True)
        plain_vag = jax.value_and_grad(
            lambda p: d_loss_fn(p, False), has_aux=True)
        if isinstance(do_r1, bool):
            # static flag: compile exactly one branch (the lazy-R1 CLI keeps
            # two separate programs, as before)
            branch = r1_vag if (do_r1 and self.lbd_r1 > 0) else plain_vag
            (_, (metrics, d_state)), grads = branch(d_params)
        else:
            # traced flag (the multi-step scan path): ONE program containing
            # both branches; lax.cond executes only the taken one per step
            (_, (metrics, d_state)), grads = jax.lax.cond(
                do_r1 if self.lbd_r1 > 0 else jnp.array(False),
                r1_vag, plain_vag, d_params)
        updates, d_opt_state = self.d_tx.update(grads, d_opt_state, d_params)
        d_params = optax.apply_updates(d_params, updates)

        # 4. Extra critic steps with fresh batches/fakes (reference :218-229).
        if self.n_critic > 1:
            carry = (d_params, d_state, d_opt_state, g_state, rng)
            d_substep = functools.partial(self._d_substep, g_params)
            (d_params, d_state, d_opt_state, g_state, rng), metrics_seq = (
                jax.lax.scan(d_substep, carry, images[1:]))
            # Reference logs the LAST critic iteration's losses
            # (train_gan.py:184-190); keep D_r1 from the regularized pass.
            metrics = dict(jax.tree.map(lambda m: m[-1], metrics_seq),
                           D_r1=metrics["D_r1"])

        metrics["G_loss"] = g_loss
        rng, next_rng = jax.random.split(rng)
        new_state = state.replace(
            step=state.step + 1,
            rng=next_rng,
            g_params=g_params, g_state=g_state,
            d_params=d_params, d_state=d_state,
            g_opt_state=g_opt_state, d_opt_state=d_opt_state,
            g_ema_params=g_ema_params, g_ema_state=g_ema_state,
        )
        return new_state, metrics

    def train_step(self, state: GANTrainState, images, ema_decay: float = 0.0,
                   do_r1: bool = False):
        return self.step_fn(state, images, ema_decay, bool(do_r1))

    def _build_indexed(self, local: bool):
        gather = self._make_batch_gather(local)

        def fn(state, data, idx, ema_decay, do_r1):
            return self._sg2_step(state, gather(data, idx), ema_decay, do_r1)

        return jax.jit(fn, donate_argnums=(0,), static_argnums=(4,))

    def train_step_indexed(self, state: GANTrainState, data, idx,
                           local: bool = False, ema_decay: float = 0.0,
                           do_r1: bool = False):
        fn = self._indexed_fns.get(local)
        if fn is None:
            fn = self._indexed_fns[local] = self._build_indexed(local)
        return fn(state, data, idx, ema_decay, bool(do_r1))

    def _build_indexed_multi(self, local: bool, with_labels: bool = False):
        # with_labels unused: the StyleGAN2 trainers are unconditional (the
        # reference's train_stylegan2.py has no label path)
        gather = self._make_batch_gather(local)

        def fn(state, data, idx_block, ema_block, r1_block):
            def body(st, xs):
                idx, ed, dr = xs
                return self._sg2_step(st, gather(data, idx), ed, dr)

            st, metrics_seq = jax.lax.scan(
                body, state, (idx_block, ema_block, r1_block))
            return st, jax.tree.map(lambda m: m[-1], metrics_seq)

        return jax.jit(fn, donate_argnums=(0,))

    def train_steps_indexed(self, state: GANTrainState, data, idx_block,
                            local: bool = False, ema_decay=0.0,
                            do_r1=False):
        """K StyleGAN2 steps in one jitted scan. ``ema_decay`` and ``do_r1``
        are per-step vectors of length K (scalars broadcast); the lazy-R1
        cadence runs INSIDE the program via lax.cond, so one dispatch covers
        a full d_reg_every period. Numerically identical to K sequential
        ``train_step_indexed`` calls (tested); returns the LAST step's
        metrics (with D_r1 from that step — callers wanting the regularized
        pass's R1 should align blocks to the cadence)."""
        k = idx_block.shape[0]
        ema_block = jnp.broadcast_to(jnp.asarray(ema_decay, jnp.float32), (k,))
        r1_block = jnp.broadcast_to(jnp.asarray(do_r1, jnp.bool_), (k,))
        key = ("multi", local)
        fn = self._indexed_fns.get(key)
        if fn is None:
            fn = self._indexed_fns[key] = self._build_indexed_multi(local)
        return fn(state, data, idx_block, ema_block, r1_block)
