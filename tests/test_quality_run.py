"""Dry-run of the quality runbook (tools/quality_run.sh) with the weights-free
moments embedder on synthetic data — certifies the one-command north-star
protocol (reference EXPERIMENTS.md:15) end to end without network assets."""

import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
@pytest.mark.slow_shard1
def test_quality_run_dry(tmp_path):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.update({
        "DATASET": "synthetic_16",
        "EMBED": "moments",
        "STEPS": "4",
        "EVAL_EVERY": "4",
        "FID_SIZE": "16",
        "LOGROOT": str(tmp_path / "logs"),
        # CPU platform + tiny batch so the dry run is CI-sized
        "EXTRA_FLAGS": "--platform cpu --no_gif --n_eval_avg 1 --print_every 2",
        "EXTRA_OVERRIDES": "options.batch_size=8",
    })
    r = subprocess.run(["bash", "tools/quality_run.sh"], cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    assert "BEST FID@16 (moments embedder):" in r.stdout
    best = float(r.stdout.rsplit("BEST FID@16 (moments embedder):", 1)[1].strip())
    assert best == best and best >= 0  # finite, non-negative
