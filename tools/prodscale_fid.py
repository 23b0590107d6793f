"""Production-scale FID@10k eval-path proof (real chip, random weights).

Runs the REAL-size in-loop FID protocol end to end on the TPU — flax
InceptionV3 FID variant (299^2 bilinear resize inside the net, 2048-d pool3
features), mesh-sharded fused sampler+embedder, ``n_avg`` trials, stats
precompute over the reference split — next to a resident flagship train
state. The real ``pt_inception-2015-12-05`` weights need egress; RANDOM
weights (synthesized through the torch state_dict converter, the exact load
path real weights take) change the scores, not the compute/memory shape, so
this measures the true production eval cost and proves HBM fit.

Reference protocol being proven at scale:
``/root/reference/evaluate/gan.py:105-123`` +
``/root/reference/third_party/fid/fid_score.py:115-158`` (n_avg x 10k/50
InceptionV3 forwards on one GPU, images round-tripped through the host).

Usage:  python tools/prodscale_fid.py [--size 10000] [--n_avg 3]
        [--batch_per_call 500] [--torch_n 500]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from contrad_tpu.utils import enable_compile_cache

enable_compile_cache()  # dedup the big-step compiles across profiling runs

import jax
import numpy as np

from contrad_tpu.augment import get_augment
from contrad_tpu.evaluate.fid import (
    calculate_frechet_distance, compute_stats, get_embed_fn)
from contrad_tpu.evaluate.sharded import make_feature_sampler
from contrad_tpu.models import get_architecture
from contrad_tpu.parallel import get_mesh
from contrad_tpu.training import (
    GANTrainer, create_train_state, make_optimizer)


def synth_inception_weights(path: str, seed: int = 0):
    """Random pt-inception-shaped state_dict -> .pth, through the same
    torch.save/torch.load/convert_torch_checkpoint path real weights take."""
    import torch

    from third_party.torch_fid.inception import InceptionV3FID

    torch.manual_seed(seed)
    model = InceptionV3FID()
    # He-normal convs + unit BN running stats + gamma jitter: torch's
    # default kaiming-uniform(a=sqrt(5)) underscales a 94-conv-deep ReLU
    # net, collapsing pool3 features to near-constant (measured FID ~ 7e-9
    # between DIFFERENT image sets). With relu-gain init the random net
    # discriminates (pool3 std ~1.8, mean-shift ~0.1 between disjoint
    # noise sets), so the drill proves the full FID math end to end.
    for m in model.modules():
        if isinstance(m, torch.nn.Conv2d):
            torch.nn.init.kaiming_normal_(m.weight, nonlinearity="relu")
        elif isinstance(m, torch.nn.BatchNorm2d):
            torch.nn.init.uniform_(m.weight, 0.5, 1.5)
            torch.nn.init.normal_(m.bias, 0, 0.2)
            m.running_var.fill_(1.0)
            m.running_mean.zero_()
    torch.save(model.state_dict(), path)
    return path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=10000)
    p.add_argument("--n_avg", type=int, default=3)
    p.add_argument("--batch_per_call", type=int, default=500)
    p.add_argument("--torch_n", type=int, default=0,
                   help="also time the independent torch CPU engine on this "
                        "many images (0 = skip)")
    args = p.parse_args()

    tmp = tempfile.mkdtemp()
    wpath = synth_inception_weights(os.path.join(tmp, "synth_inception.pth"))
    os.environ["INCEPTION_WEIGHTS"] = wpath  # before any embedder is built
    print(f"synthesized random inception checkpoint: {wpath}")

    # Flagship trainer + train state RESIDENT on the chip (the in-loop eval
    # runs next to it; this proves the memory fit, not just the eval alone).
    IMG = (32, 32, 3)
    g, d = get_architecture("sndcgan", IMG)
    g_opt = make_optimizer(2e-4, (0.5, 0.999))
    d_opt = make_optimizer(2e-4, (0.5, 0.999))
    trainer = GANTrainer(g, d, mode="contrad",
                         augment_fn=get_augment("simclr"),
                         g_optimizer=g_opt, d_optimizer=d_opt,
                         loss_type="nonsat", mesh=get_mesh())
    state = trainer.place_state(create_train_state(
        jax.random.PRNGKey(0), g, d, IMG, g_opt, d_opt))
    print(f"devices: {jax.devices()}")

    # --- reference-stats precompute at full size (fid_size images through
    # the mesh-sharded embedder; reference: fid_score.py:161-185 + 207-217)
    embed = get_embed_fn("inception", mesh=trainer.mesh)
    rng = np.random.default_rng(0)
    real = rng.integers(0, 256, size=(args.size,) + IMG, dtype=np.uint8)
    t0 = time.time()
    real_feats = embed(real.astype(np.float32) / 255.0)
    t_ref = time.time() - t0
    mu_r, sig_r = compute_stats(real_feats)
    print(f"ref stats precompute: {args.size} images -> 2048-d in "
          f"{t_ref:.2f}s ({args.size / t_ref:.0f} img/s)")

    # --- the in-loop eval: fused sample+embed, n_avg trials
    feature_fn = make_feature_sampler(
        trainer, embedder="inception", batch_per_call=args.batch_per_call,
        inception_path=wpath)
    fids, times = [], []
    for trial in range(args.n_avg):
        t0 = time.time()
        feats = feature_fn(state, args.size, seed=trial)
        dt = time.time() - t0
        mu_f, sig_f = compute_stats(feats)
        fid = calculate_frechet_distance(mu_f, sig_f, mu_r, sig_r)
        fids.append(fid)
        times.append(dt)
        print(f"trial {trial}: FID@{args.size} (random weights) = {fid:.6g} "
              f"in {dt:.2f}s ({args.size / dt:.0f} img/s sample+embed)")
    print(f"mean eval time/trial: {np.mean(times):.2f}s; "
          f"full n_avg={args.n_avg} eval: {np.sum(times) + t_ref:.2f}s "
          f"(+one-time ref stats)")

    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if stats:
        peak = stats.get("peak_bytes_in_use", 0) / 2**30
        lim = stats.get("bytes_limit", 0) / 2**30
        print(f"device peak memory: {peak:.2f} GiB / {lim:.2f} GiB limit "
              f"(train state resident throughout)")

    if args.torch_n:
        torch_embed = get_embed_fn("torch_inception")
        imgs = rng.integers(0, 256, size=(args.torch_n,) + IMG,
                            dtype=np.uint8)
        t0 = time.time()
        torch_embed(imgs.astype(np.float32) / 255.0)
        dt = time.time() - t0
        print(f"torch CPU engine: {args.torch_n} images in {dt:.2f}s "
              f"({args.torch_n / dt:.0f} img/s; x{args.size / args.torch_n:.0f} "
              f"for FID@{args.size} ≈ {dt * args.size / args.torch_n:.0f}s)")


if __name__ == "__main__":
    main()
