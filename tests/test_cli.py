"""End-to-end CLI integration: train_gan.py in a subprocess on the virtual
mesh (synthetic data, 3 steps, FID-moments loop, checkpoint), then resume."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd=REPO, timeout=540):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # CLI sets its own virtual-device flags
    return subprocess.run(
        [sys.executable] + args, cwd=cwd, env=env, timeout=timeout,
        capture_output=True, text=True)


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

    # resume continues from the checkpointed step
    r2 = _run([
        "train_gan.py", "configs/gan/cifar10/c10_smoke.toml", "sndcgan",
        "--mode", "contrad", "--aug", "hflip", "--use_warmup",
        "--platform", "cpu", "--print_every", "1", "--evaluate_every", "50",
        "--no_gif", "--no_fid", "--seed", "11", "--resume", logdir,
        "--override", "options.max_steps=5", "options.batch_size=8",
    ])
    assert r2.returncode == 0, r2.stdout[-2000:] + r2.stderr[-2000:]
    assert "Checkpoint loaded" in r2.stdout and "(step 3)" in r2.stdout
    assert "Steps       5" in r2.stdout
