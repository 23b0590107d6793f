"""Multi-host training worker for process-level SPMD certification.

Runs a few real train steps as ONE process of an N-process
``jax.distributed`` world (CPU Gloo collectives, 8 global virtual devices),
through the exact multihost production path: ``init_distributed`` rendezvous,
``make_train_loader(shard=(rank, world))`` per-process feeding,
``place_global_batch`` global-array assembly, and a COLLECTIVE orbax
checkpoint save. The reference's counterpart is a spawned NCCL DDP worker
(``/root/reference/train_gan.py:230-251,328-332``).

Three trainer recipes, selected by flags:

* default            — unconditional SNDCGAN ``GANTrainer`` (contrad mode)
* ``--conditional``  — SNDCGAN with the projection y-head; real labels from
                       the sharded loader, fake labels sampled in-step
                       (reference ``base.py:107-130`` semantics)
* ``--trainer sg2``  — tiny ``StyleGAN2Trainer``: EMA accumulate with
                       pre-update params gated on an ema-start step, G before
                       D, lazy R1 every ``--d_reg_every`` steps with the
                       ``(0.5*lbd_r1)*r1*d_reg_every`` scaling (reference
                       ``train_stylegan2.py:147-279``) — the grad-of-grad +
                       EMA path under real multi-process data parallelism.

``--n_critic`` > 1 exercises the in-step ``lax.scan`` critic loop across
processes (reference ``train_gan.py:152-167``).

Invoked as a subprocess by ``tests/test_multihost_spawn.py`` and by
``__graft_entry__.dryrun_multihost``:

    python -m contrad_tpu.parallel._mh_worker \
        --rank 0 --world 2 --port 12345 --devices_per_proc 4 \
        --steps 4 --logdir /tmp/run --metrics_out /tmp/m0.json

With ``--world 1`` it runs the identical recipe single-process (the loss
parity oracle); the data stream then uses the same seeded ``BatchIterator``
whose rank-slices are proven to tile the global batch
(``tests/test_multihost.py::test_sharded_batches_tile_the_global_batch``).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys


def _build_trainer(args, mesh, image_size):
    """(trainer, state-template kwargs) for the selected recipe."""
    import jax

    from contrad_tpu.augment import get_augment
    from contrad_tpu.training import create_train_state, make_optimizer

    g_opt = make_optimizer(2e-4, (0.5, 0.999))
    d_opt = make_optimizer(2e-4, (0.5, 0.999))

    if args.trainer == "sg2":
        from contrad_tpu.models.stylegan2 import DStylegan2, GStylegan2
        from contrad_tpu.training.step import StyleGAN2Trainer

        size = image_size[0]
        generator = GStylegan2(size=size, n_mlp=2, small32=False,
                               channel_multiplier=0.25)
        discriminator = DStylegan2(size=size, small32=False,
                                   channel_multiplier=0.25,
                                   mlp_linear=True, d_hidden=32)
        trainer = StyleGAN2Trainer(
            generator, discriminator, mode="contrad",
            augment_fn=get_augment(args.aug),
            g_optimizer=g_opt, d_optimizer=d_opt, loss_type="nonsat",
            temp=0.1, lbd_a=1.0, n_critic=args.n_critic,
            lbd_r1=0.1, d_reg_every=args.d_reg_every, style_mix=0.9,
            ema=True, mesh=mesh)
        ema = True
    else:
        from contrad_tpu.models.sndcgan import DSndcgan, GSndcgan
        from contrad_tpu.training import GANTrainer

        n_classes = 10 if args.conditional else 1
        generator = GSndcgan(image_size=image_size, ngf=8, nz=16)
        discriminator = DSndcgan(image_size=image_size, ndf=8,
                                 mlp_linear=True, d_hidden=32,
                                 n_classes=n_classes)
        trainer = GANTrainer(
            generator, discriminator, mode="contrad",
            augment_fn=get_augment(args.aug),
            g_optimizer=g_opt, d_optimizer=d_opt, loss_type="nonsat",
            temp=0.1, lbd_a=1.0, n_critic=args.n_critic, mesh=mesh)
        ema = False

    state = create_train_state(
        jax.random.PRNGKey(0), generator, discriminator, image_size,
        g_opt, d_opt, ema=ema)
    return trainer, state


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--rank", type=int, required=True)
    p.add_argument("--world", type=int, required=True)
    p.add_argument("--port", type=int, default=0,
                   help="coordinator port (required when world > 1)")
    p.add_argument("--devices_per_proc", type=int, default=4)
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--trainer", choices=["gan", "sg2"], default="gan")
    p.add_argument("--conditional", action="store_true",
                   help="class-conditional SNDCGAN D (y-head); gan trainer only")
    p.add_argument("--n_critic", type=int, default=1)
    p.add_argument("--d_reg_every", type=int, default=2,
                   help="sg2 lazy-R1 cadence (R1 fires when step %% this == 0)")
    p.add_argument("--ema_start_step", type=int, default=2,
                   help="sg2: EMA decay becomes 0.99 for steps AFTER this "
                        "(the ema_start_k gate, reference "
                        "train_stylegan2.py:174-176)")
    p.add_argument("--logdir", type=str, default=None,
                   help="save a collective orbax checkpoint here")
    p.add_argument("--resume", action="store_true",
                   help="restore the checkpoint in --logdir before stepping "
                        "(collective restore: every process reads it)")
    p.add_argument("--metrics_out", type=str, default=None,
                   help="rank 0 writes per-step metrics JSON here")
    p.add_argument("--aug", type=str, default="none")
    p.add_argument("--fid_stats_dir", type=str, default=None,
                   help="run a collective in-loop FID eval (moments embedder) "
                        "against PRE-COMPUTED reference stats in this dir; "
                        "rank 0 appends the score to the metrics JSON")
    args = p.parse_args(argv)

    # Platform shaping must precede jax backend init.
    from contrad_tpu.hostenv import force_host_device_count

    force_host_device_count(args.devices_per_proc)

    import jax

    jax.config.update("jax_platforms", "cpu")
    # Persistent compile cache (same as tests/conftest.py): the sg2 R1
    # grad-of-grad program costs minutes to compile on the CPU backend;
    # the cache dedups it across ranks' identical programs and across runs.
    repo = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     os.path.join(repo, ".jax_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    if args.world > 1:
        os.environ["CONTRAD_COORDINATOR"] = f"127.0.0.1:{args.port}"
        os.environ["CONTRAD_NUM_PROCESSES"] = str(args.world)
        os.environ["CONTRAD_PROCESS_ID"] = str(args.rank)
        from contrad_tpu.parallel.mesh import init_distributed

        init_distributed()
        assert jax.process_count() == args.world, (
            f"expected {args.world} processes, got {jax.process_count()}")

    import numpy as np

    from contrad_tpu.data.core import (
        BatchIterator, PrefetchIterator, make_train_loader)
    from contrad_tpu.data.synthetic import synthetic_dataset
    from contrad_tpu.parallel.mesh import data_shard, get_mesh

    rank, world = data_shard()
    assert (rank, world) == (args.rank, args.world)

    IMG = (16, 16, 3)
    mesh = get_mesh()
    n_global = int(mesh.devices.size)
    assert n_global == args.devices_per_proc * args.world

    trainer, state = _build_trainer(args, mesh, IMG)
    if args.resume:
        from contrad_tpu.utils import has_checkpoint, restore_checkpoint

        assert args.logdir and has_checkpoint(args.logdir), "nothing to resume"
        state = restore_checkpoint(args.logdir, state)
    state = trainer.place_state(state)
    starting_step = int(state.step) + 1

    dataset = synthetic_dataset(IMG, n=64, seed=0)
    batch_size = 16 * args.n_critic   # trainer consumes n_critic sub-batches
    steps_per_epoch = len(dataset) // batch_size
    if world > 1:
        loader = make_train_loader(dataset, batch_size, mesh,
                                   place_fn=trainer.place_batch, seed=5,
                                   starting_step=starting_step,
                                   shard=(rank, world))
    else:
        # Single-process parity oracle: the same seeded global stream the
        # sharded iterators tile (make_train_loader would otherwise pick the
        # device-resident path, which samples differently).
        loader = PrefetchIterator(
            BatchIterator(dataset, batch_size, seed=5,
                          start_epoch=(starting_step - 1) // steps_per_epoch),
            place_fn=trainer.place_batch)

    if world > 1:
        # AOT-compile every step-program variant, then meet at a coordination
        # barrier BEFORE the first execution.  XLA's gloo context init has a
        # hard 30 s key-value-store deadline, and on a low-core host two
        # ranks' concurrent multi-minute step compiles can skew their first
        # collective by more than that (observed under CPU contention:
        # "Gloo context initialization failed: GetKeyValue() timed out ...
        # 29.99s").  ``lower().compile()`` builds the executables without
        # running any collective, so after the barrier every rank enters the
        # first gloo context within milliseconds of its peers.
        # place_batch consumes this process's contiguous slice of the global
        # batch in a multi-process world (see BatchIterator shard slicing).
        dummy = trainer.place_batch(np.zeros(
            (batch_size // world,) + IMG, dtype=dataset.images.dtype))
        if args.trainer == "sg2":
            for do_r1 in (False, True):
                trainer.step_fn.lower(state, dummy, 0.0, do_r1).compile()
        elif args.conditional:
            y0 = trainer.place_batch(
                np.zeros(batch_size // world, dtype=dataset.labels.dtype))
            trainer.step_fn.lower(state, dummy, 0.0, y0).compile()
        else:
            trainer.step_fn.lower(state, dummy, 0.0, None).compile()
        from jax._src.distributed import global_state as _gs

        _gs.client.wait_at_barrier("contrad_aot_compile", 600_000)

    history = []
    for step in range(starting_step, starting_step + args.steps):
        batch, labels = next(loader)
        if args.trainer == "sg2":
            # Host-side cadence decisions, deterministic in the step index so
            # every process (and the 1-process oracle) agrees
            # (reference train_stylegan2.py:163-176,199-208).
            do_r1 = (step % args.d_reg_every == 0)
            ema_decay = 0.99 if step > args.ema_start_step else 0.0
            state, metrics = trainer.train_step(state, batch,
                                                ema_decay=ema_decay,
                                                do_r1=do_r1)
        elif args.conditional:
            y = trainer.place_batch(np.asarray(labels))
            state, metrics = trainer.train_step(state, batch, labels=y)
        else:
            state, metrics = trainer.train_step(state, batch)
        history.append({k: float(v) for k, v in metrics.items()})
    jax.block_until_ready(state.g_params)
    assert int(state.step) == starting_step - 1 + args.steps

    # Parameter checksums strengthen the parity oracle beyond per-step losses
    # (they certify the full weight trajectory — incl. the EMA params the
    # metrics never see).
    def _l2(tree):
        if tree is None:
            return float("nan")
        return float(math.sqrt(sum(
            float(jax.numpy.sum(leaf.astype(jax.numpy.float32) ** 2))
            for leaf in jax.tree.leaves(tree))))

    history.append({"g_norm": _l2(state.g_params),
                    "d_norm": _l2(state.d_params),
                    **({"ema_norm": _l2(state.g_ema_params)}
                       if state.g_ema_params is not None else {})})

    if args.fid_stats_dir:
        # In-loop FID exactly as the CLIs run it multihost: the fused
        # sampler+embedder is ONE collective SPMD program every process
        # joins; each host reads the replicated features and computes the
        # identical score (train_gan.py's world>1 eval path).
        from contrad_tpu.evaluate.fid import FIDScore
        from contrad_tpu.evaluate.sharded import make_feature_sampler

        fid = FIDScore("synthetic_16", size=32, n_avg=2, embedder="moments",
                       stats_dir=args.fid_stats_dir,
                       precompute_ok=(world == 1))
        feature_fn = make_feature_sampler(trainer, embedder="moments",
                                          batch_per_call=2 * n_global)
        avg = fid.update(step=int(state.step),
                         feature_fn=lambda n, s: feature_fn(state, n, s))
        history.append({"fid": float(avg), "fid_best": float(fid.best)})

    if args.logdir:
        from contrad_tpu.utils import save_checkpoint

        # Collective: every process participates in the orbax write.
        save_checkpoint(args.logdir, state, "latest", blocking=True)

    if args.metrics_out and rank == 0:
        with open(args.metrics_out, "w") as f:
            json.dump(history, f)

    print(f"mh_worker rank {rank}/{world} [{args.trainer}"
          f"{'+cond' if args.conditional else ''}"
          f"{f'+nc{args.n_critic}' if args.n_critic > 1 else ''}]: ok, "
          f"{args.steps} steps, final D_loss="
          f"{history[args.steps - 1]['D_loss']:.5f}",
          flush=True)
    if world > 1:
        jax.distributed.shutdown()


if __name__ == "__main__":
    main()
    sys.exit(0)
