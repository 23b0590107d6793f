"""PROCESS-LEVEL multi-host certification: real ``jax.distributed`` worlds.

Unlike ``tests/test_multihost.py`` (single-process equivalents), these tests
spawn actual OS processes that rendezvous through the jax coordination
service and run CPU Gloo collectives — the same code path a DCN-connected
TPU-pod deployment takes. Reference semantics being certified: the spawned
NCCL DDP worker (``/root/reference/train_gan.py:230-251,328-332``).

Covered with real process_count == 2:
  * ``init_distributed`` rendezvous (env-var coordinator),
  * ``make_train_loader(shard=(rank, 2))`` per-process feeding,
  * ``place_global_batch`` global-array assembly,
  * the jitted ContraD step's cross-process all-gathers/psums,
  * COLLECTIVE orbax checkpoint save (+ single-process restore),
  * loss parity with a single-process 8-device run,
  * the ``train_gan.py --multihost`` CLI end to end (slow marker).
"""

import json
import os
import sys
import glob

import numpy as np
import pytest

from contrad_tpu.hostenv import free_port as _free_port
from contrad_tpu.hostenv import spawn_world, worker_env

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env(devices_per_proc: int) -> dict:
    return worker_env(devices_per_proc, REPO)


def _spawn_world(cmds_envs, timeout=900):
    return spawn_world(cmds_envs, cwd=REPO, timeout=timeout)


@pytest.mark.slow
def test_two_process_training_parity(tmp_path):
    """2 processes x 4 devices run 4 real ContraD steps through the multihost
    production path and match a 1-process x 8-device run step for step; the
    collectively-written orbax checkpoint restores single-process."""
    port = _free_port()
    ckpt_dir = str(tmp_path / "mh_run")
    m2 = str(tmp_path / "metrics_2p.json")
    m1 = str(tmp_path / "metrics_1p.json")
    worker = [sys.executable, "-m", "contrad_tpu.parallel._mh_worker"]

    _spawn_world([
        (worker + ["--rank", str(r), "--world", "2", "--port", str(port),
                   "--devices_per_proc", "4", "--steps", "4",
                   "--logdir", ckpt_dir]
         + (["--metrics_out", m2] if r == 0 else []),
         _clean_env(4))
        for r in range(2)
    ])
    _spawn_world([
        (worker + ["--rank", "0", "--world", "1", "--devices_per_proc", "8",
                   "--steps", "4", "--metrics_out", m1],
         _clean_env(8)),
    ])

    hist1 = json.load(open(m1))
    hist2 = json.load(open(m2))
    assert len(hist1) == len(hist2) == 4
    for step, (a, b) in enumerate(zip(hist1, hist2)):
        for key in a:
            assert np.isfinite(a[key]) and np.isfinite(b[key])
            np.testing.assert_allclose(
                a[key], b[key], rtol=1e-4, atol=1e-5,
                err_msg=f"step {step} metric {key}: 1-proc vs 2-proc")

    # The collective checkpoint restores in THIS (single) process.
    import jax

    from contrad_tpu.models.sndcgan import DSndcgan, GSndcgan
    from contrad_tpu.training import create_train_state, make_optimizer
    from contrad_tpu.utils import has_checkpoint, restore_checkpoint

    IMG = (16, 16, 3)
    g = GSndcgan(image_size=IMG, ngf=8, nz=16)
    d = DSndcgan(image_size=IMG, ndf=8, mlp_linear=True, d_hidden=32)
    opt = make_optimizer(2e-4, (0.5, 0.999))
    template = create_train_state(jax.random.PRNGKey(0), g, d, IMG, opt, opt)
    assert has_checkpoint(ckpt_dir)
    restored = restore_checkpoint(ckpt_dir, template)
    assert int(restored.step) == 4
    # parameters actually trained (not the init template)
    leaf = jax.tree.leaves(restored.g_params)[0]
    tleaf = jax.tree.leaves(template.g_params)[0]
    assert not np.allclose(np.asarray(leaf), np.asarray(tleaf))


@pytest.mark.slow
def test_two_process_cli(tmp_path):
    """The full ``train_gan.py --multihost`` CLI with process_count == 2:
    both ranks resolve the SAME pinned logdir, only rank 0 writes logs,
    the GIF is gated off but in-loop FID runs COLLECTIVELY (fused
    mesh-sharded sampler, rank-0 CSV), and the checkpoint lands
    collectively."""
    from contrad_tpu.evaluate.fid import FIDScore

    # Multihost FIDScore refuses to precompute (precompute_ok=False — the
    # processes would race the stats write); precompute once here, exactly
    # as production does via tools/precalc_stats.py.
    FIDScore("synthetic_16", size=64, n_avg=2, embedder="moments")

    port = _free_port()
    root = str(tmp_path / "logs")
    cmd = [sys.executable, "train_gan.py",
           "configs/gan/cifar10/c10_smoke.toml", "sndcgan",
           "--mode", "contrad", "--aug", "none", "--multihost",
           "--platform", "cpu", "--fid_embed", "moments",
           "--n_eval_avg", "2",
           "--print_every", "1", "--evaluate_every", "3", "--seed", "3",
           "--logdir_root", root, "--override", "options.max_steps=4"]

    def env_for(rank):
        env = _clean_env(4)
        env["CONTRAD_COORDINATOR"] = f"127.0.0.1:{port}"
        env["CONTRAD_NUM_PROCESSES"] = "2"
        env["CONTRAD_PROCESS_ID"] = str(rank)
        return env

    outs = _spawn_world([(cmd, env_for(r)) for r in range(2)], timeout=1200)

    logfiles = glob.glob(os.path.join(root, "**", "log.txt"), recursive=True)
    assert len(logfiles) == 1, f"expected ONE pinned logdir, got {logfiles}"
    logdir = os.path.dirname(logfiles[0])
    log = open(logfiles[0]).read()
    # rank gating: exactly one process wrote the completion line
    assert log.count("Training finished.") == 1
    assert os.path.exists(os.path.join(logdir, "config.toml"))
    assert os.path.isdir(os.path.join(logdir, "ckpt", "latest"))
    scalars = [json.loads(l) for l in
               open(os.path.join(logdir, "scalars.jsonl"))]
    g_losses = [s for s in scalars if s["tag"] == "gan/train/G_loss"]
    assert len(g_losses) == 4  # print_every=1, no duplicate rank-1 writes
    assert all(np.isfinite(s["value"]) for s in scalars)
    # the eval-gating notice fired on both ranks
    assert sum("in-loop GIF/aug-preview disabled" in o for o in outs) >= 1
    # in-loop FID ran collectively: rank 0 wrote the CSV + the TB scalar
    fid_csvs = [f for f in os.listdir(logdir) if f.startswith("results_fid")]
    assert len(fid_csvs) == 1, f"expected one FID CSV, got {fid_csvs}"
    fid_scalars = [s for s in scalars if s["tag"] == "gan/test/fid"]
    assert len(fid_scalars) == 1 and np.isfinite(fid_scalars[0]["value"])


def test_spawn_world_drains_pipes_concurrently(tmp_path):
    """A rank that floods stdout past the 64 KB pipe capacity BEFORE the
    barrier the other rank is waiting on must not deadlock the world:
    spawn_world drains all pipes concurrently (a sequential communicate()
    loop blocks rank 1 on the pipe write, rank 0 on the barrier, and times
    out the whole run)."""
    flag = str(tmp_path / "rank1_done")
    waiter = (f"import os, time\n"
              f"deadline = time.time() + 60\n"
              f"while not os.path.exists({flag!r}):\n"
              f"    assert time.time() < deadline, 'barrier timeout'\n"
              f"    time.sleep(0.05)\n"
              f"print('rank0 ok')\n")
    flooder = (f"import sys, pathlib\n"
               f"sys.stdout.write('x' * 300_000)\n"   # >> pipe capacity
               f"sys.stdout.flush()\n"
               f"pathlib.Path({flag!r}).touch()\n")
    env = dict(os.environ)
    outs = spawn_world(
        [([sys.executable, "-c", waiter], env),
         ([sys.executable, "-c", flooder], env)],
        cwd=REPO, timeout=90)
    assert "rank0 ok" in outs[0]
    assert len(outs[1]) >= 300_000


@pytest.mark.slow
def test_two_process_collective_fid_parity(tmp_path):
    """In-loop FID in a 2-process world: the fused sampler+embedder runs as
    one collective SPMD program both processes join, and the score matches
    the 1-process run on identical state (the features are seeded by the
    same keys, so only collective-reduction float association differs)."""
    from contrad_tpu.evaluate.fid import FIDScore

    stats_dir = str(tmp_path / "stats")
    FIDScore("synthetic_16", size=32, n_avg=2, embedder="moments",
             stats_dir=stats_dir)  # precompute once (production protocol)

    port = _free_port()
    m2 = str(tmp_path / "metrics_2p.json")
    m1 = str(tmp_path / "metrics_1p.json")
    worker = [sys.executable, "-m", "contrad_tpu.parallel._mh_worker"]

    _spawn_world([
        (worker + ["--rank", str(r), "--world", "2", "--port", str(port),
                   "--devices_per_proc", "4", "--steps", "2",
                   "--fid_stats_dir", stats_dir]
         + (["--metrics_out", m2] if r == 0 else []),
         _clean_env(4))
        for r in range(2)
    ])
    _spawn_world([
        (worker + ["--rank", "0", "--world", "1", "--devices_per_proc", "8",
                   "--steps", "2", "--fid_stats_dir", stats_dir,
                   "--metrics_out", m1],
         _clean_env(8)),
    ])

    fid2 = json.load(open(m2))[-1]
    fid1 = json.load(open(m1))[-1]
    assert np.isfinite(fid2["fid"]) and np.isfinite(fid1["fid"])
    np.testing.assert_allclose(fid2["fid"], fid1["fid"], rtol=1e-3,
                               err_msg="collective FID != single-process FID")


@pytest.mark.slow
def test_two_process_collective_resume_parity(tmp_path):
    """Collective orbax save -> collective restore in a NEW 2-process world:
    a run saved at an epoch boundary and resumed for 4 more steps must match
    a continuous 8-step run step for step (train state incl. RNG + both
    optimizer states round-trips through the sharded checkpoint; the data
    stream re-enters at the right epoch)."""
    port1, port2, port3 = _free_port(), _free_port(), _free_port()
    ckpt_dir = str(tmp_path / "mh_resume")
    m_cont = str(tmp_path / "metrics_cont.json")
    m_res = str(tmp_path / "metrics_resumed.json")
    worker = [sys.executable, "-m", "contrad_tpu.parallel._mh_worker"]

    def spawn(port, extra_rank0, extra_all, steps):
        _spawn_world([
            (worker + ["--rank", str(r), "--world", "2", "--port", str(port),
                       "--devices_per_proc", "4", "--steps", str(steps)]
             + extra_all + (extra_rank0 if r == 0 else []),
             _clean_env(4))
            for r in range(2)
        ])

    # leg 1: 4 steps (one full epoch of the 64-image dataset at b16) + save
    spawn(port1, [], ["--logdir", ckpt_dir], steps=4)
    # leg 2: fresh world resumes the checkpoint, 4 more steps
    spawn(port2, ["--metrics_out", m_res],
          ["--logdir", ckpt_dir, "--resume"], steps=4)
    # oracle: continuous 8-step world
    spawn(port3, ["--metrics_out", m_cont], [], steps=8)

    resumed = json.load(open(m_res))
    cont = json.load(open(m_cont))
    assert len(resumed) == 4 and len(cont) == 8
    for step, (a, b) in enumerate(zip(cont[4:], resumed), start=5):
        for key in a:
            np.testing.assert_allclose(
                a[key], b[key], rtol=1e-4, atol=1e-5,
                err_msg=f"step {step} metric {key}: continuous vs resumed")
