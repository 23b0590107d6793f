"""Roofline accounting from a jax.profiler xplane trace.

For every device op the TPU xplane records measured duration (on the event),
the compiler's FLOP count / bytes accessed (on the event *metadata*, per
execution), and the chip's peak rates (plane-level stats).  Summing those
gives a defensible answer to "is this program at speed-of-light?" — per op,
per category, and for the whole step:

    python tools/roofline.py <trace.xplane.pb> [--steps N] [--top K]

Prints: device-busy time per step, total FLOPs and the implied MXU
utilization, total bytes and the implied HBM utilization, a per-category
rollup, and the top-K ops with their individual compute/bandwidth
utilizations (each op is attributed to whichever roof — MXU or HBM — it is
closer to).

(Replaces guesswork from durations alone; used for the 512^2 StyleGAN2 step
roofline claim in BASELINE.md.  The reference has no profiling tooling at
all — its hot loop lives in hand-written CUDA,
/root/reference/models/gan/stylegan2/op/upfirdn2d_kernel.cu.)
"""

import argparse
import collections

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def load_tpu_plane(path):
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    for p in xs.planes:
        if "TPU" in p.name and "CUSTOM" not in p.name:
            return p
    raise SystemExit("no TPU plane in trace")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace")
    ap.add_argument("--steps", type=int, default=5,
                    help="training steps captured in the trace")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--sort", choices=["time", "bytes", "flops"],
                    default="time",
                    help="rank the top-K op table by duration, bytes "
                         "accessed, or FLOPs")
    args = ap.parse_args()

    plane = load_tpu_plane(args.trace)
    stat_name = {sid: s.name for sid, s in plane.stat_metadata.items()}

    # Plane-level peaks.
    peaks = {stat_name.get(s.metadata_id, ""): s.double_value
             for s in plane.stats}
    peak_tflops = peaks.get("peak_teraflops_per_second") or 1.0
    peak_hbm_gbps = peaks.get("peak_hbm_bw_gigabytes_per_second") or 1.0

    # Per-op flops/bytes/category live on the event *metadata* (one record
    # per deduplicated HLO op, values are per-execution).
    md_info = {}
    for mid, md in plane.event_metadata.items():
        info = {"flops": 0, "bytes": 0, "category": "?"}
        for s in md.stats:
            nm = stat_name.get(s.metadata_id, "")
            if nm == "flops":
                info["flops"] = s.int64_value
            elif nm == "bytes_accessed":
                info["bytes"] = s.int64_value
            elif nm == "hlo_category":
                info["category"] = (stat_name.get(s.ref_value, "?")
                                    if s.ref_value else s.str_value or "?")
        md_info[mid] = (md.name, info)

    # Aggregate over occurrences.
    Acc = lambda: {"dur_ps": 0, "flops": 0.0, "bytes": 0.0, "n": 0,
                   "category": "?"}
    ops = collections.defaultdict(Acc)
    for line in plane.lines:
        if "XLA Ops" not in line.name or "Async" in line.name:
            continue  # async copy-starts overlap compute; don't double count
        for ev in line.events:
            name, info = md_info[ev.metadata_id]
            a = ops[name]
            a["dur_ps"] += ev.duration_ps
            a["n"] += 1
            a["flops"] += info["flops"]
            a["bytes"] += info["bytes"]
            a["category"] = info["category"]

    tot_dur_s = sum(a["dur_ps"] for a in ops.values()) / 1e12
    if tot_dur_s == 0:
        raise SystemExit("no XLA op events in trace — was it captured while "
                         "steps were actually running on the device?")
    tot_flops = sum(a["flops"] for a in ops.values())
    tot_bytes = sum(a["bytes"] for a in ops.values())
    n = args.steps
    print(f"peak: {peak_tflops:.0f} TFLOP/s, {peak_hbm_gbps:.0f} GB/s HBM")
    print(f"device-busy time /step: {tot_dur_s / n * 1e3:8.2f} ms")
    print(f"FLOPs /step:            {tot_flops / n / 1e12:8.3f} TFLOP "
          f"-> mean MXU util {tot_flops / tot_dur_s / 1e12 / peak_tflops:6.1%}")
    print(f"bytes /step:            {tot_bytes / n / 1e9:8.3f} GB    "
          f"-> mean HBM util {tot_bytes / tot_dur_s / 1e9 / peak_hbm_gbps:6.1%}")

    # Per-category rollup with its own utilizations.
    cats = collections.defaultdict(lambda: [0, 0.0, 0.0])
    for a in ops.values():
        c = cats[a["category"]]
        c[0] += a["dur_ps"]; c[1] += a["flops"]; c[2] += a["bytes"]
    print("\n== categories (per step; util = against that category's own time) ==")
    for cat, (dur, fl, by) in sorted(cats.items(), key=lambda kv: -kv[1][0]):
        dur_s = dur / 1e12
        if dur_s == 0:
            continue
        print(f"  {cat:28s} {dur_s/n*1e3:8.2f} ms  "
              f"mxu {fl/dur_s/1e12/peak_tflops:6.1%}  "
              f"hbm {by/dur_s/1e9/peak_hbm_gbps:6.1%}")

    key = {"time": "dur_ps", "bytes": "bytes", "flops": "flops"}[args.sort]
    print(f"\n== top {args.top} ops by {args.sort} "
          f"(per step; roof = max of the two utils) ==")
    rows = sorted(ops.items(), key=lambda kv: -kv[1][key])[: args.top]
    for name, a in rows:
        dur_s = a["dur_ps"] / 1e12
        mxu = a["flops"] / dur_s / 1e12 / peak_tflops if dur_s else 0.0
        hbm = a["bytes"] / dur_s / 1e9 / peak_hbm_gbps if dur_s else 0.0
        roof = "MXU" if mxu >= hbm else "HBM"
        print(f"  {dur_s/n*1e3:7.2f} ms {a['bytes']/n/1e6:8.1f} MB "
              f"mxu {mxu:6.1%}  hbm {hbm:6.1%} "
              f"[{roof}] {a['category'][:18]:18s} {name[:70]}")


if __name__ == "__main__":
    main()
