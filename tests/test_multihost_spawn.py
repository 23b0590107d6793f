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
@pytest.mark.slow_shard2
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
    assert len(hist1) == len(hist2) == 5  # 4 steps + final param-norm record
    for step, (a, b) in enumerate(zip(hist1, hist2)):
        assert a.keys() == b.keys()
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


def _parity_vs_single_process(hists, what):
    """Every world's metric history must match the 1-process oracle's,
    record for record (per-step losses + the final param-norm checksums)."""
    oracle = hists[0]
    for name, hist in hists[1:]:
        assert len(hist) == len(oracle[1]), f"{what}: {name} history length"
        for step, (a, b) in enumerate(zip(oracle[1], hist)):
            assert a.keys() == b.keys(), f"{what} step {step}: metric keys"
            for key in a:
                assert np.isfinite(a[key]) and np.isfinite(b[key])
                np.testing.assert_allclose(
                    a[key], b[key], rtol=1e-4, atol=1e-5,
                    err_msg=f"{what} step {step} metric {key}: "
                            f"{oracle[0]} vs {name}")


@pytest.mark.slow
@pytest.mark.slow_shard3
def test_two_process_stylegan2_parity(tmp_path):
    """The StyleGAN2 trainer — R1 grad-of-grad, EMA accumulate with the
    ema-start gate, lazy cadence — in a REAL 2-process world matches the
    1-process 8-device run step for step, including D_r1 and the final EMA
    parameter checksum (reference semantics: train_stylegan2.py:147-279
    under DDP-style data parallelism). 4 steps with d_reg_every=2 fire R1 on
    steps 2 and 4 and start EMA at step 3 — every branch executes."""
    port = _free_port()
    m2 = str(tmp_path / "metrics_2p.json")
    m1 = str(tmp_path / "metrics_1p.json")
    worker = [sys.executable, "-m", "contrad_tpu.parallel._mh_worker"]
    recipe = ["--trainer", "sg2", "--steps", "4", "--d_reg_every", "2",
              "--ema_start_step", "2", "--aug", "hflip"]

    # 2 devices/proc (4 global): the heavier sg2 programs starve XLA's
    # in-process CPU collectives at 8 device threads on a low-core CI host
    # (stuck-abort); the multi-PROCESS path under certification is identical.
    # generous timeout: the R1 grad-of-grad program costs minutes to compile
    # cold on a low-core host, and both ranks compile it concurrently
    _spawn_world([
        (worker + ["--rank", str(r), "--world", "2", "--port", str(port),
                   "--devices_per_proc", "2"] + recipe
         + (["--metrics_out", m2] if r == 0 else []),
         _clean_env(2))
        for r in range(2)
    ], timeout=2400)
    _spawn_world([
        (worker + ["--rank", "0", "--world", "1", "--devices_per_proc", "4",
                   "--metrics_out", m1] + recipe,
         _clean_env(4)),
    ], timeout=2400)

    hist1, hist2 = json.load(open(m1)), json.load(open(m2))
    assert "ema_norm" in hist1[-1], "EMA checksum missing from the record"
    # the lazy cadence actually fired: R1 nonzero exactly on steps 2 and 4
    r1s = [h["D_r1"] for h in hist1[:4]]
    assert r1s[1] > 0 and r1s[3] > 0 and r1s[0] == 0 and r1s[2] == 0
    _parity_vs_single_process([("1-proc", hist1), ("2-proc", hist2)],
                              "stylegan2")


@pytest.mark.slow
@pytest.mark.slow_shard2
def test_two_process_conditional_ncritic_parity(tmp_path):
    """Conditional SNDCGAN (projection y-head, real labels through the
    sharded loader + place_global_batch, fake labels sampled in-step) with
    n_critic=2 (the in-step lax.scan critic loop) across 2 real processes
    matches the 1-process run (reference base.py:107-130 label scoring +
    train_gan.py:152-167 critic loop under DDP)."""
    port = _free_port()
    m2 = str(tmp_path / "metrics_2p.json")
    m1 = str(tmp_path / "metrics_1p.json")
    worker = [sys.executable, "-m", "contrad_tpu.parallel._mh_worker"]
    recipe = ["--conditional", "--n_critic", "2", "--steps", "3"]

    _spawn_world([
        (worker + ["--rank", str(r), "--world", "2", "--port", str(port),
                   "--devices_per_proc", "4"] + recipe
         + (["--metrics_out", m2] if r == 0 else []),
         _clean_env(4))
        for r in range(2)
    ])
    _spawn_world([
        (worker + ["--rank", "0", "--world", "1", "--devices_per_proc", "8",
                   "--metrics_out", m1] + recipe,
         _clean_env(8)),
    ])

    _parity_vs_single_process(
        [("1-proc", json.load(open(m1))), ("2-proc", json.load(open(m2)))],
        "conditional+n_critic=2")


@pytest.mark.slow
@pytest.mark.slow_shard3
def test_four_process_world(tmp_path):
    """A 4-process x 2-device world (the largest world yet spawned) runs the
    ContraD step, matches the 1-process 8-device oracle, and lands a
    collective orbax checkpoint — world size is a free parameter of the
    rendezvous/sharding machinery, not a hardcoded 2."""
    port = _free_port()
    ckpt_dir = str(tmp_path / "mh4_run")
    m4 = str(tmp_path / "metrics_4p.json")
    m1 = str(tmp_path / "metrics_1p.json")
    worker = [sys.executable, "-m", "contrad_tpu.parallel._mh_worker"]

    _spawn_world([
        (worker + ["--rank", str(r), "--world", "4", "--port", str(port),
                   "--devices_per_proc", "2", "--steps", "3",
                   "--logdir", ckpt_dir]
         + (["--metrics_out", m4] if r == 0 else []),
         _clean_env(2))
        for r in range(4)
    ])
    _spawn_world([
        (worker + ["--rank", "0", "--world", "1", "--devices_per_proc", "8",
                   "--steps", "3", "--metrics_out", m1],
         _clean_env(8)),
    ])

    _parity_vs_single_process(
        [("1-proc", json.load(open(m1))), ("4-proc", json.load(open(m4)))],
        "4-process world")
    assert os.path.isdir(os.path.join(ckpt_dir, "ckpt", "latest"))


@pytest.mark.slow
@pytest.mark.slow_shard2
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
@pytest.mark.slow_shard2
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
@pytest.mark.slow_shard3
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
    # 4 per-step metric dicts + the final param-norm checksum entry (8 + 1
    # for the continuous oracle). Aligning cont[4:] with resumed compares
    # steps 5..8 pairwise AND the final checksums — the norms certify the
    # full weight trajectory (incl. EMA) survived the checkpoint splice.
    assert len(resumed) == 5 and len(cont) == 9
    for step, (a, b) in enumerate(zip(cont[4:], resumed), start=5):
        assert a.keys() == b.keys(), f"step {step}: metric keys"
        for key in a:
            np.testing.assert_allclose(
                a[key], b[key], rtol=1e-4, atol=1e-5,
                err_msg=f"step {step} metric {key}: continuous vs resumed")
