"""Attribute profiled XLA fusions to rayito source lines.

Closes the "other ~11 ms is unattributed" gap (BENCH_NOTES round-4 lead 1):
takes a jax.profiler trace (bench.py --profile) plus the OPTIMIZED HLO of the
same executable (jitted.lower(...).compile().as_text() — works through the
axon relay), and for every top device op prints its own op_name/source
metadata and, for fusions, a per-source-line op histogram of the fused
computation — i.e. WHICH renderer lines the fusion's work comes from.

Usage:
  python tools/fusion_attr.py --logdir /tmp/rayito_bench_prof \
      --hlo /tmp/stage6_hlo.txt [--top 15] [--divisor 10]
"""

import argparse
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rayito_tpu.utils.profiling import collect_device_ops  # noqa: E402

_META = re.compile(
    r'metadata=\{[^}]*?op_name="([^"]*)"[^}]*?'
    r'source_file="([^"]*)" source_line=(\d+)'
)
_CALLS = re.compile(r"calls=%?([\w.\-]+)")


def parse_hlo(path):
    """-> (op_line_by_name, computation_bodies_by_name)"""
    op_lines = {}
    comps = {}
    cur_name = None
    cur_lines = None
    with open(path) as f:
        for line in f:
            stripped = line.strip()
            # computation header: `%name (params) -> type {` or `name (...`
            m = re.match(r"^(?:ENTRY )?%?([\w.\-]+) \(.*\) -> .* \{", stripped)
            if m and (line.startswith("%") or line.startswith("ENTRY")
                      or not line.startswith(" ")):
                cur_name = m.group(1)
                cur_lines = comps.setdefault(cur_name, [])
                continue
            if stripped == "}":
                cur_name = None
                continue
            m = re.match(r"^(?:ROOT )?%?([\w.\-]+) = ", stripped)
            if m:
                op_lines[m.group(1)] = stripped
                if cur_name is not None:
                    cur_lines.append(stripped)
    return op_lines, comps


def attr_histogram(body_lines):
    """Per source file:line op counts for one computation body."""
    hist = Counter()
    for ln in body_lines:
        m = _META.search(ln)
        if m:
            src = f"{os.path.basename(m.group(2))}:{m.group(3)}"
            hist[f"{src} ({m.group(1).split('/')[-1]})"] += 1
        else:
            hist["(no metadata)"] += 1
    return hist


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", required=True)
    ap.add_argument("--hlo", required=True)
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--divisor", type=float, default=10.0,
                    help="profiled frame count (scales us -> per-frame ms)")
    args = ap.parse_args()

    ops = collect_device_ops(args.logdir)
    op_lines, comps = parse_hlo(args.hlo)
    print(f"(parsed {len(op_lines)} HLO ops, {len(comps)} computations)")

    ranked = sorted(ops.items(), key=lambda kv: -kv[1][0])[: args.top]
    for name, (us, cnt) in ranked:
        ms = us / 1e3 / args.divisor
        line = op_lines.get(name)
        print(f"\n== {name}: {ms:.2f} ms/frame ({cnt} execs)")
        if line is None:
            print("   (not in HLO text — name mismatch or different module)")
            continue
        m = _META.search(line)
        if m:
            print(f"   self: {m.group(1)}  @ "
                  f"{os.path.basename(m.group(2))}:{m.group(3)}")
        cm = _CALLS.search(line)
        if cm and cm.group(1) in comps:
            hist = attr_histogram(comps[cm.group(1)])
            tot = sum(hist.values())
            print(f"   fused computation {cm.group(1)}: {tot} ops")
            for src, k in hist.most_common(8):
                print(f"     {k:5d} ({100 * k / tot:4.1f}%)  {src}")


if __name__ == "__main__":
    main()
