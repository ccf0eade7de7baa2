#!/usr/bin/env python
"""Aggregate per-op device time from a jax.profiler xplane trace.

Offline companion to tools/profile_dit.py: the TensorBoard profile plugin in
this image can't convert xplane (TF/plugin version skew), so this parses the
.xplane.pb directly (tensorflow.tsl xplane proto) and prints

  - total device-busy time per plane/line,
  - time grouped by op CATEGORY (fusion / copy / custom-call / dot / ...),
  - the top-N individual ops,

which is exactly the evidence needed to localize inter-op losses (layout
copies, unfused elementwise) that component-loop benches can't see.

Usage:  python tools/dev/trace_ops.py traces/dit [--top 40] [--line "XLA Ops"]
"""

import argparse
import collections
import glob
import os
import re
import sys


def load_xspaces(logdir):
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        sys.exit(f"no .xplane.pb under {logdir}")
    spaces = []
    for p in paths:
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        spaces.append((p, xs))
    return spaces


_CATEGORIES = (
    ("copy", re.compile(r"^(copy|transpose|bitcast|reshape)")),
    ("custom-call(pallas)", re.compile(r"custom-call|tpu_custom_call|pallas")),
    ("fusion", re.compile(r"^(loop_)?fusion")),
    ("dot/conv", re.compile(r"^(dot|convolution|cublas|gemm)")),
    ("all-reduce/collective", re.compile(r"(all-reduce|all-gather|collective|reduce-scatter|permute)")),
    ("dynamic-slice/update", re.compile(r"dynamic.(slice|update)")),
    ("infeed/outfeed/host", re.compile(r"(infeed|outfeed|host|transfer)")),
)


def categorize(name: str) -> str:
    base = name.split(".")[0].lower()
    for cat, rx in _CATEGORIES:
        if rx.search(base) or rx.search(name.lower()):
            return cat
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--line", default=None,
                    help="only aggregate lines whose name matches this regex")
    args = ap.parse_args()

    for path, xs in load_xspaces(args.logdir):
        print(f"== {path}")
        for plane in xs.planes:
            if "TPU" not in plane.name and "device" not in plane.name.lower() \
                    and "Device" not in plane.name:
                # host planes are noise for this purpose, but list them
                print(f"   (skipping host plane: {plane.name})")
                continue
            meta = plane.event_metadata
            per_op = collections.Counter()
            per_line = collections.Counter()
            for line in plane.lines:
                if args.line and not re.search(args.line, line.name):
                    continue
                for ev in line.events:
                    name = meta[ev.metadata_id].name if ev.metadata_id in meta \
                        else str(ev.metadata_id)
                    dur = ev.duration_ps / 1e12  # seconds
                    per_line[line.name] += dur
                    per_op[name] += dur
            if not per_op:
                continue
            print(f"-- plane: {plane.name}")
            for ln, t in per_line.most_common():
                print(f"   line {ln:30s} busy {t*1e3:10.3f} ms")
            # category rollup over the busiest line only would double-count
            # nested lines; ops are aggregated across selected lines as-is.
            cats = collections.Counter()
            for name, t in per_op.items():
                cats[categorize(name)] += t
            total = sum(per_op.values())
            print(f"   total event time {total*1e3:.3f} ms")
            for cat, t in cats.most_common():
                print(f"   {cat:24s} {t*1e3:10.3f} ms  {t/total:6.1%}")
            print(f"   top {args.top} ops:")
            for name, t in per_op.most_common(args.top):
                print(f"     {t*1e3:10.3f} ms  {t/total:6.1%}  {name[:110]}")


if __name__ == "__main__":
    main()
