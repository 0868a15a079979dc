#!/usr/bin/env python
"""Summarize a JAX profiler xplane capture into per-op device-time buckets.

Usage:
  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
    python scripts/xprof_summary.py /tmp/jaxtrace [--top 40] [--group]

Parses the TPU device plane ('XLA Ops' line) directly from the xplane proto
(no tensorboard_plugin_profile needed — its converter is version-locked to a
different TF build in this image)."""
import argparse
import collections
import glob
import os
import re
import sys


def find_xplane(path):
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(os.path.join(path, "**/*.xplane.pb"),
                            recursive=True))
    if not hits:
        sys.exit(f"no .xplane.pb under {path}")
    return hits[-1]


GROUPS = [
    ("flash/segment kernel", re.compile(r"flash|_batched_flash|segment")),
    ("matmul/conv (fusion w/ dot)", re.compile(r"^(dot|conv)")),
    ("fusion", re.compile(r"^(loop_fusion|fusion|input_fusion|output_fusion)")),
    ("copy/transpose/reshape", re.compile(r"copy|transpose|reshape|bitcast")),
    ("dynamic-slice/gather/scatter", re.compile(r"slice|gather|scatter|concat")),
    ("all-reduce/collective", re.compile(r"all-|reduce-scatter|collective")),
    ("infeed/outfeed/host", re.compile(r"infeed|outfeed|host|transfer")),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--line", default="XLA Ops")
    args = ap.parse_args()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xp = find_xplane(args.path)
    xs = xplane_pb2.XSpace()
    with open(xp, "rb") as f:
        xs.ParseFromString(f.read())

    for p in xs.planes:
        if not p.name.startswith("/device:TPU"):
            continue
        meta = {k: v.name for k, v in p.event_metadata.items()}
        per_op = collections.Counter()
        n_calls = collections.Counter()
        total = 0
        for l in p.lines:
            if l.name != args.line:
                continue
            for e in l.events:
                name = meta.get(e.metadata_id, str(e.metadata_id))
                dur = e.duration_ps / 1e9  # ms
                per_op[name] += dur
                n_calls[name] += 1
                total += dur
        mod_total = 0
        for l in p.lines:
            if l.name == "XLA Modules":
                for e in l.events:
                    mod_total += e.duration_ps / 1e9
        print(f"== {p.name}: XLA Ops total {total:.1f} ms "
              f"(modules wall {mod_total:.1f} ms)")
        grouped = collections.Counter()
        for name, dur in per_op.items():
            for g, rx in GROUPS:
                if rx.search(name):
                    grouped[g] += dur
                    break
            else:
                grouped["other"] += dur
        for g, dur in grouped.most_common():
            print(f"  {g:35s} {dur:9.1f} ms  ({100*dur/max(total,1e-9):.1f}%)")
        print(f"-- top {args.top} ops --")
        for name, dur in per_op.most_common(args.top):
            print(f"  {dur:9.2f} ms  x{n_calls[name]:<5d} {name[:110]}")


if __name__ == "__main__":
    main()
