#!/usr/bin/env python
"""GAN training CLI (reference: ``train_gan.py``).

Command parity with the reference DDP script:

    python train_gan.py configs/gan/cifar10/c10_b512.toml sndcgan \
        --mode contrad --aug simclr --use_warmup

but TPU-native: no process spawning, no NCCL, no DDP wrappers — one jitted
SPMD train step over a ``jax.sharding.Mesh`` of all local devices. The
reference's per-GPU batch splitting (``train_gan.py:245-251``), SyncBatchNorm
conversion (``:268-269``), DDP wrap (``:311-313``) and per-step barriers
(``:227``) have no equivalent here; the mesh shards the global batch and XLA
inserts the collectives.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time
from pathlib import Path

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="TPU-native GAN training (ContraD)")
    p.add_argument("config", type=str, help="Path to the experiment TOML config")
    p.add_argument("architecture", type=str, help="Architecture (e.g. sndcgan)")

    p.add_argument("--mode", default="std", type=str,
                   help="Training mode: std|aug|aug_both|simclr_only|contrad")
    p.add_argument("--penalty", default="none", type=str,
                   help="Penalty: none|gp|cr|bcr")
    p.add_argument("--aug", default="none", type=str,
                   help="Augmentation: none|hflip|hfrt|simclr|simclr_hq|... ")
    p.add_argument("--use_warmup", action="store_true", help="Linear LR warmup")
    p.add_argument("--conditional", action="store_true",
                   help="Class-conditional D (projection y-head); real labels "
                        "from the dataset, fake labels sampled uniformly")

    p.add_argument("--temp", default=0.1, type=float,
                   help="Temperature for contrastive losses")
    p.add_argument("--lbd_a", default=1.0, type=float,
                   help="Relative strength of the ContraD fake (supcon) loss")

    p.add_argument("--no_fid", action="store_true")
    p.add_argument("--no_gif", action="store_true")
    p.add_argument("--n_eval_avg", default=3, type=int)
    p.add_argument("--fid_embed", default="inception",
                   choices=["inception", "moments", "torch_inception"],
                   help="FID embedder: inception (flax, runs on the mesh; "
                        "needs weights), the weights-free debug 'moments' "
                        "embedder, or torch_inception (the independent "
                        "second engine, third_party/torch_fid — host-side, "
                        "single-process runs only)")
    p.add_argument("--print_every", default=50, type=int)
    p.add_argument("--evaluate_every", default=2000, type=int)
    p.add_argument("--save_every", default=100000, type=int)
    p.add_argument("--steps_per_dispatch", default=0, type=int,
                   help="Run K train steps per XLA dispatch (lax.scan inside "
                        "one jitted program; device-resident loaders only). "
                        "0 = auto: the largest K <= 16 dividing every event "
                        "cadence. 1 disables. Amortizes per-dispatch host "
                        "RPC latency (~8 ms through a tunneled device).")
    p.add_argument("--comment", default="", type=str)

    p.add_argument("--resume", default=None, type=str,
                   help="Path to logdir to resume training from")
    p.add_argument("--finetune", default=None, type=str,
                   help="Path to logdir with a pre-trained D checkpoint")

    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--dtype", default="f32", choices=["f32", "bf16"],
                   help="model compute dtype (params stay f32; bf16 is the "
                        "TPU mixed-precision path)")
    p.add_argument("--opt_moments", default="f32", choices=["f32", "bf16"],
                   help="Adam first-moment storage dtype; bf16 halves the mu "
                        "read+write HBM traffic (params stay f32 masters — "
                        "the 32^2 byte-cut lever, BASELINE.md round-3)")
    p.add_argument("--opt_grads", default="f32", choices=["f32", "bf16"],
                   help="gradient dtype entering Adam; bf16 halves the dW "
                        "write+read HBM traffic (update math and params stay "
                        "f32 — the second 32^2 byte-cut lever)")
    p.add_argument("--opt_nu", default="f32", choices=["f32", "bf16"],
                   help="Adam second-moment storage dtype (A/B lever; bf16 "
                        "risks freezing a warm nu — see make_optimizer)")
    p.add_argument("--platform", default="auto", choices=["auto", "cpu"],
                   help="cpu forces the host platform (debug/smoke)")
    p.add_argument("--override", nargs="*", default=[],
                   help="Config overrides like options.lr=1e-4")
    p.add_argument("--logdir_root", default="logs", type=str)
    p.add_argument("--multihost", action="store_true",
                   help="Call jax.distributed.initialize() for multi-host "
                        "slices (DCN); the same data mesh then spans all hosts")
    p.add_argument("--trace_steps", default=0, type=int,
                   help="Capture a jax.profiler trace of N steps (written to "
                        "<logdir>/profile; view with tensorboard)")
    return p.parse_args()


def main():
    P = parse_args()
    if P.platform == "cpu":
        from contrad_tpu.hostenv import force_host_device_count

        force_host_device_count(8)

    import jax  # deferred so --platform can set env first

    if P.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    if P.multihost:
        from contrad_tpu.parallel.mesh import init_distributed

        init_distributed()

    from contrad_tpu.utils import enable_compile_cache

    enable_compile_cache()  # dedup identical programs across runs/restarts

    import imageio
    import jax.numpy as jnp

    from contrad_tpu.augment import get_augment
    from contrad_tpu.config import (default_config_files, dump_toml,
                                    finalize_options, load_config)
    from contrad_tpu.data import get_dataset
    from contrad_tpu.data.core import make_train_loader
    from contrad_tpu.evaluate import FixedSampleGeneration, ImageGrid, to_uint8
    from contrad_tpu.models import get_architecture
    from contrad_tpu.parallel import get_mesh
    from contrad_tpu.training import (
        GANTrainer, count_parameters, create_train_state, make_optimizer,
        run_filename)
    from contrad_tpu.utils import (
        Logger, append_csv, find_restorable, has_checkpoint,
        restore_checkpoint, save_checkpoint)

    cfg = load_config(default_config_files(P.config), P.override)
    finalize_options(cfg)
    opt = cfg.options

    train_set, _, image_size = get_dataset(opt.dataset)

    mesh = get_mesh()
    n_dev = len(mesh.devices.ravel())
    if opt.batch_size % n_dev:
        raise ValueError(
            f"global batch {opt.batch_size} must divide device count {n_dev}")

    from contrad_tpu.parallel.mesh import data_shard

    rank, world = data_shard()
    if world > 1 and not P.no_gif:
        # The GIF/aug-preview sampler is a per-host image pipeline; keep it
        # single-host (evaluate offline from checkpoints). In-loop FID stays
        # ON: the fused sampler+embedder is a collective SPMD program every
        # process joins; only rank 0 writes CSV/TB (reference rank gating:
        # train_gan.py:192-225).
        print(f"[multihost rank {rank}] in-loop GIF/aug-preview disabled "
              f"({world} processes); FID runs collectively")
        P.no_gif = True

    if P.conditional and train_set.n_classes <= 1:
        raise ValueError(
            f"--conditional requires a labeled dataset; '{opt.dataset}' "
            f"reports n_classes={train_set.n_classes}")
    n_classes = train_set.n_classes if P.conditional else 1
    dtype = jnp.bfloat16 if P.dtype == "bf16" else jnp.float32
    generator, discriminator = get_architecture(P.architecture, image_size,
                                                n_classes=n_classes,
                                                dtype=dtype)
    mu_dtype = jnp.bfloat16 if P.opt_moments == "bf16" else None
    nu_dtype = jnp.bfloat16 if P.opt_nu == "bf16" else None
    grads_dtype = jnp.bfloat16 if P.opt_grads == "bf16" else None
    g_optimizer = make_optimizer(opt.lr, tuple(opt.beta), warmup=opt.warmup,
                                 use_warmup=P.use_warmup, mu_dtype=mu_dtype,
                                 nu_dtype=nu_dtype, grads_dtype=grads_dtype)
    d_optimizer = make_optimizer(opt.lr_d, tuple(opt.beta), warmup=opt.warmup,
                                 use_warmup=P.use_warmup, mu_dtype=mu_dtype,
                                 nu_dtype=nu_dtype, grads_dtype=grads_dtype)

    augment_fn = get_augment(P.aug, cfg.get("augment"))
    # Dataset-baked flip (reference datasets.py:49-69,83-126 bakes
    # RandomHorizontalFlip into cifar*_hflip and AFHQ train transforms).
    real_aug_fn = (get_augment("hflip")
                   if train_set.train_aug == "hflip" else None)
    trainer = GANTrainer(
        generator, discriminator, mode=P.mode, augment_fn=augment_fn,
        g_optimizer=g_optimizer, d_optimizer=d_optimizer,
        loss_type=opt.loss, penalty=P.penalty, temp=P.temp, lbd_a=P.lbd_a,
        lbd=opt.lbd, lbd2=opt.lbd2, n_critic=opt.n_critic, mesh=mesh,
        real_aug_fn=real_aug_fn)

    rng = jax.random.PRNGKey(P.seed)
    state = create_train_state(rng, generator, discriminator, image_size,
                               g_optimizer, d_optimizer)

    filename = run_filename(P.mode, P.penalty, P.aug, P.temp, P.lbd_a)
    comment = f"_{P.comment}" if P.comment else ""
    gin_stem = Path(P.config).stem
    if P.resume:
        logger = Logger(None, resume=P.resume, root=P.logdir_root,
                        mute=rank != 0)
    else:
        # Multihost: every process must resolve the SAME logdir (orbax writes
        # the sharded checkpoint collectively), so pin the random suffix;
        # only rank 0 writes logs (reference train_gan.py:184-225).
        logger = Logger(f"{filename}{comment}",
                        subdir=f"gan/{gin_stem}/{P.architecture}",
                        root=P.logdir_root,
                        rand=P.seed if world > 1 else None,
                        mute=rank != 0)
        if rank == 0:
            with open(os.path.join(logger.logdir, "config.toml"), "w") as f:
                f.write(dump_toml(cfg))  # EFFECTIVE config incl. --override

    if P.resume:
        ckpt_name = find_restorable(P.resume)
        if ckpt_name is None:
            logger.log(f"WARNING: --resume '{P.resume}' has no completed "
                       f"checkpoint; starting fresh in the same logdir")
        else:
            state = restore_checkpoint(P.resume, state, ckpt_name)
            logger.log(f"Checkpoint loaded from "
                       f"'{P.resume}/ckpt/{ckpt_name}' (step {int(state.step)})")
    if P.finetune and has_checkpoint(P.finetune):
        # Load D (and G) then re-init the GAN head (reference train_gan.py:261-266,
        # base.py:152-164 resets only discriminator.linear).
        loaded = restore_checkpoint(P.finetune, state)
        d_params = dict(loaded.d_params)
        fresh = state.d_params
        d_params["linear"] = fresh["linear"]
        state = state.replace(d_params=type(state.d_params)(d_params),
                              d_state=loaded.d_state)
        logger.log(f"Checkpoint loaded for fine-tuning from '{P.finetune}'")

    state = trainer.place_state(state)
    starting_step = int(state.step) + 1

    logger.log(f"argv: {' '.join(sys.argv)}")  # full CLI incl. seed/levers
    logger.log(f"# Params - G: {count_parameters(state.g_params)}, "
               f"D: {count_parameters(state.d_params)}")
    logger.log(str(opt.to_dict()))
    logger.log(f"devices: {n_dev} x {mesh.devices.ravel()[0].platform}")

    loader = make_train_loader(
        train_set, opt.batch_size * opt.n_critic, mesh,
        place_fn=trainer.place_batch, seed=P.seed,
        starting_step=starting_step, shard=(rank, world))

    # Evaluation helpers
    eval_seed = int(np.random.randint(10000))
    fixed_gen = FixedSampleGeneration(
        generator, jax.random.PRNGKey(P.seed + 1), volatile=P.no_gif)
    image_grid = ImageGrid(volatile=P.no_gif)
    aug_preview = jax.jit(lambda r, x: augment_fn(r, x))

    fid = None
    fid_feature_fn = None
    if not P.no_fid:
        try:
            from contrad_tpu.evaluate.fid import FIDScore

            fid = FIDScore(opt.dataset, opt.fid_size, n_avg=P.n_eval_avg,
                           embedder=P.fid_embed,
                           precompute_ok=(world == 1), mesh=mesh)
        except Exception as e:  # missing inception weights / stats
            fid = None  # a half-built tracker must not reach the eval loop
            if rank == 0:
                logger.log(f"FID disabled: {e}")
            elif world > 1:
                print(f"[multihost rank {rank}] FID disabled: {e}")
    if fid is not None:
        try:
            from contrad_tpu.evaluate.sharded import make_feature_sampler

            # Fused mesh-sharded sampler+embedder: one jitted SPMD program,
            # >=512 samples/call, only features cross to the host
            # (replaces the reference's batch-50 host loop,
            # third_party/fid/fid_score.py:115-158). Collective: in a
            # multihost world every process joins each call.
            fid_feature_fn = make_feature_sampler(
                trainer, embedder=P.fid_embed,
                batch_per_call=min(512, opt.fid_size))
        except Exception as e:
            fid_feature_fn = None
            if world == 1:
                # The tracker itself is fine — fall back to the
                # reference-protocol batch-50 host loop rather than training
                # with no FID / no ckpt/best gating (e.g. no HBM headroom to
                # replicate the embedder variables next to the train state).
                logger.log(f"sharded FID sampler unavailable ({e}); "
                           f"falling back to the host-loop sampler")
            else:
                # The host-loop sampler is not a collective program; without
                # the fused sampler a multihost run cannot eval in-loop.
                fid = None
                logger.log(f"FID disabled (multihost, no fused sampler: {e})")

    if world > 1:
        # COLLECTIVE agreement: a rank-local failure (stats file present on
        # one host only, embedder OOM on one rank) must disable FID on EVERY
        # rank — otherwise some ranks dispatch the collective eval/best-save
        # programs that others never join, hanging the world.
        from contrad_tpu.parallel.mesh import world_all

        if not world_all(fid is not None and fid_feature_fn is not None):
            if fid is not None:
                logger.log("FID disabled: not available on every process")
            fid = fid_feature_fn = None

    if P.resume:
        # Restore eval-side state (FID best/history, GIF latents+frames,
        # filename seed) so ckpt/best gating and the progress GIF survive
        # the restart — the reference loses these (evaluate/gan.py:147-159).
        from contrad_tpu.evaluate.persist import restore_eval_state

        restored_seed = restore_eval_state(P.resume, fid=fid,
                                           fixed_gen=fixed_gen)
        if restored_seed is not None:
            eval_seed = restored_seed
            logger.log(f"Eval state restored (eval_seed {eval_seed}"
                       + (f", FID best {fid.best:.2f}" if fid is not None
                          and fid.history else "") + ")")

    sample_from_z = lambda z: trainer.sample_from_z(state, z)

    if P.trace_steps > 0:
        jax.profiler.start_trace(os.path.join(logger.logdir, "profile"))

    logger.log_dirname(f"Steps {starting_step}")
    # Device-resident loaders expose index vectors so the batch gather fuses
    # INTO the jitted step: one XLA dispatch per step, ~4 KB of indices as
    # the only per-step host->device transfer. With steps_per_dispatch > 1,
    # K steps run inside ONE jitted lax.scan program (train_steps_indexed),
    # amortizing the dispatch RPC; events stay exact because K divides every
    # cadence and blocks launch only at aligned steps.
    from contrad_tpu.training.dispatch import (BlockDispatcher,
                                               resolve_steps_per_dispatch)

    dispatcher = BlockDispatcher(loader, resolve_steps_per_dispatch(
        P.steps_per_dispatch, getattr(loader, "supports_indexed", False),
        P.trace_steps, P.print_every, P.evaluate_every, P.save_every),
        opt.max_steps)
    if dispatcher.k_dispatch > 1:
        logger.log(f"Multi-step dispatch: {dispatcher.k_dispatch} "
                   f"steps/program")
    t0 = time.time()
    imgs_seen = 0
    step = starting_step
    while step <= opt.max_steps:
        blk = dispatcher.next_block(step)
        if blk.kind == "block":
            labels_block = (np.stack(blk.labels_block)
                            if P.conditional else None)
            state, metrics = trainer.train_steps_indexed(
                state, loader.images, blk.idx_block,
                local=loader.local_indexing, labels_block=labels_block)
            step += blk.k - 1  # `step` is now the block's LAST step
        else:
            labels = (trainer.place_batch(np.asarray(blk.labels))
                      if P.conditional else None)
            if blk.kind == "indexed":
                state, metrics = trainer.train_step_indexed(
                    state, loader.images, blk.idx,
                    local=loader.local_indexing, labels=labels)
            else:
                state, metrics = trainer.train_step(
                    state, blk.materialize(), labels=labels)
        imgs_seen += opt.batch_size * opt.n_critic * blk.k  # n_critic/step

        if P.trace_steps > 0 and step == starting_step + P.trace_steps:
            jax.block_until_ready(state.g_params)
            jax.profiler.stop_trace()
            logger.log(f"Profiler trace written to {logger.logdir}/profile")
            P.trace_steps = 0

        if step % P.print_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            dt = time.time() - t0
            ips = imgs_seen / max(dt, 1e-9)
            logger.log("[Steps %7d] [G %.3f] [D %.3f] [%.1f img/s]"
                       % (step, m["G_loss"], m["D_loss"], ips))
            for name, value in m.items():
                logger.scalar_summary("gan/train/" + name, value, step)
            t0 = time.time()
            imgs_seen = 0

        if step % P.evaluate_every == 0:
            logger.log_dirname(f"Steps {step + 1}")
            if fid is not None:
                if fid_feature_fn is not None:
                    fid_avg = fid.update(
                        step,
                        feature_fn=lambda n, s: fid_feature_fn(state, n, s))
                else:  # host-loop fallback (reference protocol)
                    fid_avg = fid.update(step, sampler=lambda n, r: np.asarray(
                        jax.device_get(trainer.sample_fn(
                            state, n, False, False, jnp.asarray(r)))))
                if world > 1:
                    # Rank-0-authoritative score: host-side sqrtm/np.cov can
                    # differ in the last ulps across BLAS builds, and a
                    # diverged is_best desynchronizes the collective 'best'
                    # checkpoint write below.
                    from contrad_tpu.parallel.mesh import broadcast_floats

                    fid_avg, best, isb = broadcast_floats(
                        fid_avg, fid.best, float(fid.is_best))
                    fid.best, fid.is_best = best, bool(isb)
                if rank == 0:
                    fid.save(os.path.join(logger.logdir,
                                          f"results_fid_{eval_seed}.csv"))
                logger.scalar_summary("gan/test/fid", fid_avg, step)
                logger.scalar_summary("gan/test/fid/best", fid.best, step)
                logger.scalar_summary("gan/test/fid/diversity",
                                      fid.last_diversity, step)
                logger.scalar_summary("gan/test/fid/meanshift",
                                      fid.last_meanshift, step)
            if not P.no_gif:
                fixed_gen.update(sample_from_z)
                imageio.mimsave(
                    os.path.join(logger.logdir, f"training_progress_{eval_seed}.gif"),
                    fixed_gen.summary())
                # fused-gather paths defer materialization until here
                grid = image_grid.update(aug_preview(
                    jax.random.PRNGKey(step),
                    blk.materialize()[: opt.batch_size].astype(jnp.float32)
                    / 255.0))
                if grid is not None:
                    imageio.imsave(
                        os.path.join(logger.logdir, f"real_augment_{eval_seed}.jpg"),
                        grid)
            save_checkpoint(logger.logdir, state, "latest")
            if fid is not None and fid.is_best:
                save_checkpoint(logger.logdir, state, "best")
            if step % P.save_every == 0:
                save_checkpoint(logger.logdir, state, f"step_{step}")
            if rank == 0:
                from contrad_tpu.evaluate.persist import save_eval_state

                save_eval_state(logger.logdir, eval_seed, fid=fid,
                                fixed_gen=fixed_gen)

        step += 1

    from contrad_tpu.utils import wait_for_checkpoints

    wait_for_checkpoints()
    logger.log("Training finished.")
    logger.close()


if __name__ == "__main__":
    main()
