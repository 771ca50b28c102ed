#!/usr/bin/env python
"""Parse a jax.profiler .xplane.pb capture into an HLO-op time breakdown.

The tensorboard_plugin_profile converters in this image are version-broken
(pywrap mismatch), so we read the XSpace proto directly via tensorflow's
bundled schema and aggregate device-plane event durations by op name /
category. Good enough to answer "where do the milliseconds go".

Usage:
    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
        python tools/xplane_stats.py /tmp/dip_trace [--top 30] [--json out]
"""

from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import re
import sys


def load_xspace(path: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


_CATEGORY_RULES = (
    ("conv", re.compile(r"convolution|conv[_.]", re.I)),
    ("matmul", re.compile(r"dot|einsum|matmul", re.I)),
    ("copy", re.compile(r"^copy|copy[_.]|transpose", re.I)),
    ("allreduce", re.compile(r"all-reduce|reduce-scatter|all-gather", re.I)),
    ("rng", re.compile(r"rng|threefry", re.I)),
    ("reduce", re.compile(r"reduce", re.I)),
    ("scatter/gather", re.compile(r"scatter|gather|dynamic-slice|dynamic-update", re.I)),
    ("pad/slice/concat", re.compile(r"pad|slice|concatenate|reverse", re.I)),
    ("elementwise-fusion", re.compile(r"fusion|loop_|input_", re.I)),
)


def categorize(name: str) -> str:
    for cat, rx in _CATEGORY_RULES:
        if rx.search(name):
            return cat
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    analyze(args.logdir, top=args.top, json_out=args.json)


def analyze(logdir: str, top: int = 30, json_out: str | None = None) -> dict:
    """Aggregate the newest .xplane.pb under `logdir` (or a direct path)
    into per-category / per-op synchronous device-time totals; prints a
    report and returns it. Importable (tools/profile_trace.py uses this —
    the tensorboard_plugin_profile converters are broken in this image)."""
    if os.path.isdir(logdir):
        paths = sorted(glob.glob(os.path.join(
            logdir, "**", "*.xplane.pb"), recursive=True))
        if not paths:
            sys.exit(f"no .xplane.pb under {logdir}")
        path = paths[-1]
    else:
        path = logdir
    xs = load_xspace(path)

    print(f"# {path}")
    report = {}
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        ev_meta = plane.event_metadata
        by_name = collections.Counter()
        by_cat = collections.Counter()
        total_ps = 0
        span_lo, span_hi = None, 0
        for line in plane.lines:
            # 'XLA Ops' is the synchronous op timeline (true occupancy);
            # 'Async XLA Ops' overlap it and 'XLA Modules'/'Steps' wrap it —
            # counting those double-books time.
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                md = ev_meta.get(ev.metadata_id)
                name = md.name if md else str(ev.metadata_id)
                dur = ev.duration_ps
                by_name[name] += dur
                by_cat[categorize(name)] += dur
                total_ps += dur
                t0 = line.timestamp_ns * 1000 + ev.offset_ps
                span_lo = t0 if span_lo is None else min(span_lo, t0)
                span_hi = max(span_hi, t0 + dur)
        if total_ps == 0:
            continue
        wall_ps = (span_hi - span_lo) if span_lo is not None else total_ps
        print(f"\n== plane: {plane.name}")
        print(f"busy {total_ps/1e9:.3f} ms | span {wall_ps/1e9:.3f} ms "
              f"| util {100*total_ps/max(wall_ps,1):.1f}%")
        print("\n-- by category --")
        for cat, ps in by_cat.most_common():
            print(f"{ps/1e9:10.3f} ms  {100*ps/total_ps:5.1f}%  {cat}")
        print(f"\n-- top {top} ops --")
        for name, ps in by_name.most_common(top):
            print(f"{ps/1e9:10.3f} ms  {100*ps/total_ps:5.1f}%  {name[:110]}")
        report[plane.name] = {
            "busy_ms": total_ps / 1e9,
            "span_ms": wall_ps / 1e9,
            "by_category_ms": {k: v / 1e9 for k, v in by_cat.items()},
            "top_ops_ms": {k: v / 1e9 for k, v in by_name.most_common(top)},
        }
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"\nwrote {json_out}")
    return report


if __name__ == "__main__":
    main()
