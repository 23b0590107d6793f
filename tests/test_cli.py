"""End-to-end CLI integration: train_gan.py in a subprocess on the virtual
mesh (synthetic data, 3 steps, FID-moments loop, checkpoint), then resume."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd=REPO, timeout=540, devices=None):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # CLI sets its own virtual-device flags (8)
    if devices is not None:
        # Pin a smaller virtual mesh: XLA's in-process CPU collectives abort
        # with a "stuck" check failure when 8 device threads starve on a
        # low-core CI host (observed with the heavier StyleGAN2 programs on
        # a 1-core box); 8-device SPMD coverage of the same code paths lives
        # in the in-process suite (test_step/test_stylegan2 equivalence
        # oracles), these tests certify the CLI surface.
        env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={devices}"
    return subprocess.run(
        [sys.executable] + args, cwd=cwd, env=env, timeout=timeout,
        capture_output=True, text=True)


@pytest.mark.slow
@pytest.mark.slow_shard1
def test_train_gan_cli_end_to_end(tmp_path):
    logroot = str(tmp_path / "logs")
    r = _run([
        "train_gan.py", "configs/gan/cifar10/c10_smoke.toml", "sndcgan",
        "--mode", "contrad", "--aug", "hflip", "--use_warmup",
        "--platform", "cpu", "--print_every", "1", "--evaluate_every", "3",
        "--no_gif", "--fid_embed", "moments", "--n_eval_avg", "2",
        "--seed", "11", "--logdir_root", logroot,
        "--override", "options.max_steps=3", "options.batch_size=8",
        "options.fid_size=16",
    ])
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "Training finished." in r.stdout

    runs = []
    for dirpath, dirnames, filenames in os.walk(logroot):
        if "log.txt" in filenames:
            runs.append(dirpath)
    assert len(runs) == 1
    logdir = runs[0]
    assert os.path.isdir(os.path.join(logdir, "ckpt", "latest"))
    assert os.path.exists(os.path.join(logdir, "scalars.jsonl"))
    fid_csvs = [f for f in os.listdir(logdir) if f.startswith("results_fid")]
    assert fid_csvs, "FID CSV missing"
    with open(os.path.join(logdir, fid_csvs[0])) as f:
        lines = f.read().splitlines()
    assert lines[0] == "step,fid_0,fid_1,mean"
    assert len(lines) == 2  # one eval at step 3

    # eval-side state persisted next to the checkpoint
    assert os.path.exists(os.path.join(logdir, "eval_state.npz"))

    # resume continues from the checkpointed step AND restores eval state:
    # same eval_seed => the FID CSV keeps appending instead of forking
    r2 = _run([
        "train_gan.py", "configs/gan/cifar10/c10_smoke.toml", "sndcgan",
        "--mode", "contrad", "--aug", "hflip", "--use_warmup",
        "--platform", "cpu", "--print_every", "1", "--evaluate_every", "5",
        "--no_gif", "--fid_embed", "moments", "--n_eval_avg", "2",
        "--seed", "11", "--resume", logdir,
        "--override", "options.max_steps=5", "options.batch_size=8",
        "options.fid_size=16",
    ])
    assert r2.returncode == 0, r2.stdout[-2000:] + r2.stderr[-2000:]
    assert "Checkpoint loaded" in r2.stdout and "(step 3)" in r2.stdout
    assert "Eval state restored" in r2.stdout
    assert "Steps       5" in r2.stdout
    fid_csvs_after = [f for f in os.listdir(logdir)
                      if f.startswith("results_fid")]
    assert fid_csvs_after == fid_csvs  # no forked CSV: eval_seed survived
    with open(os.path.join(logdir, fid_csvs[0])) as f:
        lines = f.read().splitlines()
    assert len(lines) == 3  # header + step-3 row + appended step-5 row


@pytest.mark.slow
@pytest.mark.slow_shard1
def test_train_stylegan2_cli_end_to_end(tmp_path):
    """train_stylegan2.py as a subprocess: lazy-R1 cadence, EMA gating
    (ema_start_k), halflife LR decay, in-loop FID on g_ema, then a --resume
    round-trip that restores the checkpoint (incl. EMA params) AND the eval
    state (reference semantics: train_stylegan2.py:147-279 + torch.save
    checkpoints :261-279)."""
    logroot = str(tmp_path / "logs")
    common = [
        "train_stylegan2.py", "configs/gan/stylegan2/style_smoke.toml",
        "stylegan2_tiny", "--mode", "contrad", "--aug", "hflip",
        "--lbd_r1", "0.1", "--d_reg_every", "2", "--halflife_k", "1",
        "--ema_start_k", "0", "--halflife_lr", "64000",
        "--platform", "cpu", "--print_every", "1", "--no_gif",
        "--fid_embed", "moments", "--n_eval_avg", "2", "--seed", "13",
    ]
    r = _run(common + [
        "--evaluate_every", "2", "--logdir_root", logroot,
        "--override", "options.max_steps=4", "options.fid_size=16",
    ], timeout=1200, devices=2)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "Training finished." in r.stdout

    runs = [d for d, _, fs in os.walk(logroot) if "log.txt" in fs]
    assert len(runs) == 1
    logdir = runs[0]
    # run-name encodes the SG2 recipe (R/mix/H/lr/Lazy — reference
    # train_stylegan2.py:330-335)
    assert "R0.1_mix0.9_H1" in logdir and "_Lazy" in logdir
    assert os.path.isdir(os.path.join(logdir, "ckpt", "latest"))
    fid_csvs = [f for f in os.listdir(logdir) if f.startswith("results_fid")]
    assert fid_csvs, "FID CSV missing"
    with open(os.path.join(logdir, fid_csvs[0])) as f:
        lines = f.read().splitlines()
    assert len(lines) == 3  # header + evals at steps 2 and 4
    assert os.path.exists(os.path.join(logdir, "eval_state.npz"))

    # resume: +2 steps, eval at 6; CSV must append (eval state restored)
    r2 = _run(common + [
        "--evaluate_every", "3", "--resume", logdir,
        "--override", "options.max_steps=6", "options.fid_size=16",
    ], timeout=1200, devices=2)
    assert r2.returncode == 0, r2.stdout[-2000:] + r2.stderr[-2000:]
    assert "Checkpoint loaded" in r2.stdout and "(step 4)" in r2.stdout
    assert "Eval state restored" in r2.stdout
    with open(os.path.join(logdir, fid_csvs[0])) as f:
        lines = f.read().splitlines()
    assert len(lines) == 4  # appended step-6 row, no forked CSV

    # EMA round-tripped through the checkpoint: the step-6 state restores
    # into an ema=True template, carries step 6, and its EMA params are a
    # real accumulation (finite, != the live G params, != a fresh init).
    import jax
    import numpy as np

    from contrad_tpu.models import get_architecture
    from contrad_tpu.training import create_train_state, make_optimizer
    from contrad_tpu.utils import restore_checkpoint

    g, d = get_architecture("stylegan2_tiny", (16, 16, 3))
    opt = make_optimizer(2e-3, (0.0, 0.99))
    template = create_train_state(jax.random.PRNGKey(0), g, d, (16, 16, 3),
                                  opt, opt, ema=True)
    restored = restore_checkpoint(logdir, template)
    assert int(restored.step) == 6
    ema_leaves = jax.tree.leaves(restored.g_ema_params)
    g_leaves = jax.tree.leaves(restored.g_params)
    t_leaves = jax.tree.leaves(template.g_ema_params)
    assert all(np.isfinite(np.asarray(x)).all() for x in ema_leaves)
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(ema_leaves, g_leaves))
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(ema_leaves, t_leaves))


@pytest.mark.slow
@pytest.mark.slow_shard1
def test_train_stylegan2_contrad_cli(tmp_path):
    """train_stylegan2_contraD.py (the high-res recipe alias): its defaults
    (mode=contrad) apply, explicit flags win over them, and --no_lazy wires
    d_reg_every=1 (R1 every step) — reference EXPERIMENTS.md:79-81 CLI."""
    logroot = str(tmp_path / "logs")
    r = _run([
        "train_stylegan2_contraD.py", "configs/gan/stylegan2/style_smoke.toml",
        "stylegan2_tiny", "--aug", "hflip", "--no_lazy", "--lbd_r1", "0.1",
        "--halflife_k", "1", "--platform", "cpu", "--print_every", "1",
        "--no_gif", "--fid_embed", "moments", "--evaluate_every", "3",
        "--seed", "17", "--logdir_root", logroot,
        "--override", "options.max_steps=3", "options.fid_size=16",
    ], timeout=1200, devices=2)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "Training finished." in r.stdout
    runs = [d for d, _, fs in os.walk(logroot) if "log.txt" in fs]
    assert len(runs) == 1
    # default mode=contrad landed in the run name; --no_lazy encoded too
    assert "contrad" in runs[0] and "_NoLazy" in runs[0]
    assert os.path.isdir(os.path.join(runs[0], "ckpt", "latest"))
    fid_csvs = [f for f in os.listdir(runs[0])
                if f.startswith("results_fid")]
    assert fid_csvs, "FID CSV missing (default n_eval_avg=1 recipe)"


@pytest.mark.slow
@pytest.mark.slow_shard2
def test_eval_clis_end_to_end(tmp_path):
    """The full eval CLI chain off a trained logdir: sample generation ->
    stats precompute -> FID/IS scoring (reference test_tf_inception.py CLI
    surface) -> linear eval -> cDDLS conditional sampling. Converts the
    manual verify drive into CI; every CLI a reference user would reach for
    is exercised in-subprocess."""
    import glob

    logroot = str(tmp_path / "logs")
    r = _run([
        "train_gan.py", "configs/gan/cifar10/c10_smoke.toml", "sndcgan",
        "--mode", "std", "--platform", "cpu", "--print_every", "1",
        "--evaluate_every", "2", "--no_gif", "--no_fid", "--seed", "7",
        "--logdir_root", logroot,
        "--override", "options.max_steps=2", "options.batch_size=8",
    ])
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    logdir = next(d for d, _, fs in os.walk(logroot) if "log.txt" in fs)

    # 1. random sampling CLI (reference test_gan_sample.py)
    r = _run(["test_gan_sample.py", logdir, "sndcgan", "--n_samples", "8",
              "--batch_size", "4", "--platform", "cpu"])
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    sample_dirs = glob.glob(os.path.join(logdir, "samples_*"))
    assert sample_dirs
    pngs = glob.glob(os.path.join(sample_dirs[0], "*.png"))
    assert len(pngs) == 8

    # 2. stats precompute + FID/IS CLI against itself => FID ~ 0
    stats = str(tmp_path / "stats.npz")
    r = _run(["tools/precalc_stats.py", "--images", sample_dirs[0],
              "--embed", "moments", "--out", stats])
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    r = _run(["test_tf_inception.py", sample_dirs[0], stats,
              "--embed", "moments", "--batch_size", "8"])
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    fid_line = [ln for ln in r.stdout.splitlines() if ln.startswith("FID:")]
    assert fid_line and abs(float(fid_line[0].split()[1])) < 1e-3
    assert os.path.exists(os.path.join(logdir, "fid.log"))

    # 3. linear evaluation CLI (reference test_lineval.py); --dataset
    # exercises the explicit probe-dataset override path
    r = _run(["test_lineval.py", logdir, "sndcgan", "--epochs", "1",
              "--dataset", "synthetic_16",
              "--batch_size", "32", "--platform", "cpu"], timeout=900)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    lin = glob.glob(os.path.join(logdir, "lin_eval_*.npz"))
    assert lin

    # 4. conditional Langevin sampling CLI (reference test_gan_sample_cddls.py)
    r = _run(["test_gan_sample_cddls.py", logdir, lin[0], "sndcgan",
              "--n_steps", "2", "--n_samples", "4", "--n_classes", "2",
              "--batch_size", "2", "--ckpt", "latest", "--platform", "cpu"],
             timeout=900)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    cddls_pngs = glob.glob(os.path.join(logdir, "samples_cDDLS*", "**",
                                        "*.png"), recursive=True)
    assert len(cddls_pngs) == 4  # n_samples total, split across n_classes
