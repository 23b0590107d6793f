#!/usr/bin/env python
"""Benchmark: ContraD training throughput on the reference's headline recipes.

Primary metric (the JSON line's "value"): the flagship SNDCGAN+ContraD step —
G fwd, SimCLR augmentation of the [real, real, fake] 3N batch, D fwd/bwd with
both contrastive losses, G bwd, both Adam updates, spectral-norm power
iterations — at the reference's flagship CIFAR-10 configuration: 32x32x3,
global batch 512, mode=contrad, aug=simclr (reference EXPERIMENTS.md:15,
c10_b512.gin).

Secondary metrics (the "secondary" dict in the same single JSON line, so
regressions in those paths are driver-visible too):
  * stylegan2_512_b8_bf16_ms  — the 512² StyleGAN2+ContraD simclr_hq step
    (EXPERIMENTS.md:79-81) with the space-to-depth packed G-top/D-stem
    (ops/packed.py); guards the packed-path optimizations.
  * stylegan2_32_b64_f32_ms   — the small32 StyleGAN2+ContraD step
    (EXPERIMENTS.md:27-28); guards the modulated-conv/upfirdn2d stack.
  * sndcgan_32_b512_bf16_imgs_s — the flagship step with bf16 activation
    storage (the step is HBM-bandwidth-bound at f32, BASELINE.md round-3
    roofline).
  * sndcgan_32_b512_prod_imgs_s — the PRODUCTION configuration: bf16
    activations + the full Adam byte-lever stack (mu/nu storage and dW cast
    bf16, f32 master params) — certified against f32 with a 20k-step A/B
    (BASELINE.md round-5).
  * fid10k_feat_s — wall time to produce 10k FID features through the
    mesh-sharded fused sampler+embedder (evaluate/sharded.py, moments
    embedder); guards the 12x eval-loop win over the reference's batch-50
    host loop.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "secondary"}.

Baseline: the reference implementation on a single V100 (its documented
hardware class — environment.yml pins cudatoolkit 10.1). The repo publishes
no throughput numbers (BASELINE.md), so the baseline constant below is an
estimate from the step's FLOP count (~9 GFLOP/image for the 3N contrad step)
against V100 fp32 at a generous 35% utilization => ~500 imgs/sec.
"""

import json
import os
import time

# Persistent XLA compile cache (same store the test suite uses,
# tests/conftest.py): the bench's wall time is compile-dominated through the
# tunneled device (~5 min of compiles vs ~1 min of measured steps), and the
# programs are identical run-to-run.
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

V100_BASELINE_IMGS_PER_SEC = 500.0

BATCH = 512
IMAGE_SIZE = (32, 32, 3)
WARMUP_STEPS = 5
MEASURE_STEPS = 50
TRIALS = 3  # first trial after warmup can still be noisy on the axon tunnel


def _time_steps(trainer, state, batch, steps, trials, warmup=3, **step_kwargs):
    """Returns (best s/step, final live state) via the chained-readback
    protocol — ONE implementation, shared with every tool that times steps
    (tools/tpu_timing.py): steps chain through the donated state, a host
    readback of a metrics scalar forces completion (block_until_ready does
    NOT synchronize reliably through the axon tunnel — measured reporting
    15x over the step's HBM roofline), and the difference of two chain
    lengths cancels the ~30 ms RPC/readback overhead."""
    from tools.tpu_timing import time_step

    return time_step(
        lambda st, b: trainer.train_step(st, b, **step_kwargs),
        state, batch, n_short=max(1, steps // 5), n_long=steps,
        trials=trials, warmup=warmup, return_state=True)


def bench_flagship(dtype=None, steps=MEASURE_STEPS, trials=TRIALS,
                   return_trainer=False, opt_bf16=False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from contrad_tpu.augment import get_augment
    from contrad_tpu.models import get_architecture
    from contrad_tpu.parallel import get_mesh
    from contrad_tpu.training import GANTrainer, create_train_state, make_optimizer

    kwargs = {} if dtype is None else {"dtype": dtype}
    generator, discriminator = get_architecture("sndcgan", IMAGE_SIZE, **kwargs)
    # opt_bf16 = the full byte-lever stack (Adam mu/nu storage + dW cast all
    # bf16; params stay f32 masters) — the documented production config,
    # certified vs f32 at 20k steps (BASELINE.md round-5 A/B).
    opt_kw = (dict(mu_dtype=jnp.bfloat16, nu_dtype=jnp.bfloat16,
                   grads_dtype=jnp.bfloat16) if opt_bf16 else {})
    g_opt = make_optimizer(2e-4, (0.5, 0.999), warmup=3000, use_warmup=True,
                           **opt_kw)
    d_opt = make_optimizer(2e-4, (0.5, 0.999), warmup=3000, use_warmup=True,
                           **opt_kw)
    mesh = get_mesh()
    n_chips = len(mesh.devices.ravel())

    trainer = GANTrainer(
        generator, discriminator, mode="contrad",
        augment_fn=get_augment("simclr"),
        g_optimizer=g_opt, d_optimizer=d_opt, loss_type="nonsat",
        temp=0.1, lbd_a=1.0, mesh=mesh)

    state = trainer.place_state(create_train_state(
        jax.random.PRNGKey(0), generator, discriminator, IMAGE_SIZE,
        g_opt, d_opt))

    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, size=(BATCH,) + IMAGE_SIZE, dtype=np.uint8)
    batch = trainer.place_batch(data)

    best_dt, state = _time_steps(trainer, state, batch, steps, trials,
                                 warmup=WARMUP_STEPS)
    throughput = BATCH / best_dt / n_chips
    if return_trainer:
        return throughput, trainer, state
    return throughput


def bench_fid_features(trainer, state, n: int = 10000, trials: int = 2) -> float:
    """Wall seconds to produce n FID features via the mesh-sharded fused
    sampler+embedder (one jitted program, features-only readback)."""
    import time as _t

    from contrad_tpu.evaluate.sharded import make_feature_sampler

    feature_fn = make_feature_sampler(trainer, embedder="moments",
                                      batch_per_call=512)
    feature_fn(state, 512, seed=0)  # compile
    best = float("inf")
    for t in range(trials):
        t0 = _t.perf_counter()
        feats = feature_fn(state, n, seed=t)
        best = min(best, _t.perf_counter() - t0)
    assert feats.shape[0] == n
    return best


def bench_stylegan2(image_size, arch, batch, aug, dtype, steps=15, trials=2):
    import jax
    import numpy as np

    from contrad_tpu.augment import get_augment
    from contrad_tpu.models import get_architecture
    from contrad_tpu.parallel import get_mesh
    from contrad_tpu.training import create_train_state, make_optimizer
    from contrad_tpu.training.step import StyleGAN2Trainer

    g, d = get_architecture(arch, image_size, dtype=dtype)
    g_opt = make_optimizer(2e-3, (0.0, 0.99))
    d_opt = make_optimizer(2e-3, (0.0, 0.99))
    pack = min(getattr(g, "packed_io", 1), getattr(d, "packed_io", 1))
    trainer = StyleGAN2Trainer(
        g, d, mode="contrad", augment_fn=get_augment(aug, pack=pack),
        g_optimizer=g_opt, d_optimizer=d_opt, loss_type="nonsat",
        lbd_r1=0.5, d_reg_every=16, mesh=get_mesh(), packed_images=pack)
    state = trainer.place_state(create_train_state(
        jax.random.PRNGKey(0), g, d, image_size, g_opt, d_opt, ema=True))
    data = np.random.default_rng(0).integers(
        0, 256, size=(batch,) + image_size, dtype=np.uint8)
    placed = trainer.place_batch(data)
    best, _ = _time_steps(trainer, state, placed, steps, trials,
                          ema_decay=0.99, do_r1=False)
    return best * 1000.0  # ms/step


def main():
    import sys

    import jax.numpy as jnp

    t_start = time.perf_counter()

    def _mark(label):
        print(f"[bench +{time.perf_counter() - t_start:6.1f}s] {label}",
              file=sys.stderr, flush=True)

    imgs_per_sec_per_chip, trainer, state = bench_flagship(return_trainer=True)
    _mark("flagship f32 done")
    secondary = {}
    secondary["fid10k_feat_s"] = round(bench_fid_features(trainer, state), 2)
    _mark("fid10k done")
    secondary["sndcgan_32_b512_bf16_imgs_s"] = round(bench_flagship(
        dtype=jnp.bfloat16, steps=25, trials=2), 1)
    _mark("flagship bf16 done")
    secondary["sndcgan_32_b512_prod_imgs_s"] = round(bench_flagship(
        dtype=jnp.bfloat16, steps=25, trials=2, opt_bf16=True), 1)
    _mark("flagship production (full bf16 lever stack) done")
    secondary["stylegan2_32_b64_f32_ms"] = round(bench_stylegan2(
        (32, 32, 3), "stylegan2", 64, "simclr", jnp.float32,
        steps=30, trials=2), 1)
    _mark("stylegan2 32 done")
    secondary["stylegan2_512_b8_bf16_ms"] = round(bench_stylegan2(
        (512, 512, 3), "stylegan2_512", 8, "simclr_hq", jnp.bfloat16,
        steps=15, trials=2), 1)
    _mark("stylegan2 512 done")
    print(json.dumps({
        "metric": "sndcgan_contrad_cifar10_b512_train_throughput",
        "value": round(imgs_per_sec_per_chip, 1),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(imgs_per_sec_per_chip / V100_BASELINE_IMGS_PER_SEC, 3),
        "secondary": secondary,
    }))


if __name__ == "__main__":
    # The tunneled TPU occasionally drops a remote-compile/execute RPC
    # (observed: "read body: response body closed before all bytes were
    # read"). One fresh retry is enough in practice; losing the round's
    # bench artifact to a transient is not.  Deterministic failures
    # (assertions, config bugs) re-raise immediately — retrying those only
    # doubles side effects and delays the real traceback.
    _TRANSIENT_MARKERS = (
        "response body closed",
        "DEADLINE_EXCEEDED",
        "UNAVAILABLE",
        "Connection reset",
        "socket closed",
    )
    try:
        main()
    except Exception as e:  # noqa: BLE001 - inspect, retry only transients
        import sys
        import time as _time

        msg = f"{type(e).__name__}: {e}"
        if not any(m.lower() in msg.lower() for m in _TRANSIENT_MARKERS):
            raise
        print(f"bench attempt 1 hit transient tunnel error ({msg}); "
              f"retrying once", file=sys.stderr)
        _time.sleep(30)
        main()
