"""Device-op profiling helpers (SURVEY §5: per-kernel ray/sec accounting).

Wraps jax.profiler traces and digests the perfetto output into a per-phase
cost table so bench.py / tools/frame_profile.py can answer "where does the
frame go" without hand-parsing 100k trace events.
"""

from __future__ import annotations

import glob
import gzip
import json
import os

# Op-name prefixes -> logical renderer phase. Pallas kernels keep their
# python function names; XLA fusions are bucketed by operator family.
_PHASES = (
    ("_traverse_blocks", "traversal kernel (Möller-Trumbore blocks)"),
    ("_block_masks_pallas", "cluster-mask kernel (slab tests)"),
    ("_transpose_rows_kernel", "row-table transpose kernel"),
    ("sort", "coherence sort / unsort"),
    ("slice_reduce_fusion", "analytic shapes + winner folds"),
    ("while", "bounce loop (rollup)"),
)


def collect_device_ops(logdir: str):
    """Parse the newest trace in ``logdir`` -> {op_name: (total_us, count)}
    over device-side 'XLA Ops' events."""
    paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        return {}
    with gzip.open(max(paths, key=os.path.getmtime), "rt") as f:
        trace = json.load(f)
    pid_names = {}
    tid_names = {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "M":
            continue
        if ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
        elif ev.get("name") == "thread_name":
            tid_names[(ev["pid"], ev["tid"])] = ev["args"].get("name", "")
    dev_pids = {
        p for p, n in pid_names.items() if "TPU" in n or "/device" in n
    }
    ops: dict[str, list] = {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        if "XLA Ops" not in tid_names.get((ev["pid"], ev["tid"]), ""):
            continue
        d = ops.setdefault(ev["name"], [0.0, 0])
        d[0] += ev.get("dur", 0.0)
        d[1] += 1
    return {k: (v[0], v[1]) for k, v in ops.items()}


def phase_table(logdir: str, divisor: float = 1.0):
    """[(phase, ms, op_count)] sorted by cost. ``divisor`` scales totals
    (e.g. number of profiled repetitions). The bounce-loop 'while' rollup
    nests every other phase, so it is reported but not summed."""
    ops = collect_device_ops(logdir)
    rows = {label: [0.0, 0] for _, label in _PHASES}
    other = [0.0, 0]
    for name, (us, cnt) in ops.items():
        for prefix, label in _PHASES:
            if name.startswith(prefix):
                rows[label][0] += us
                rows[label][1] += cnt
                break
        else:
            other[0] += us
            other[1] += cnt
    rows["other device ops"] = other
    return sorted(
        (
            (label, us / 1e3 / divisor, cnt)
            for label, (us, cnt) in rows.items()
            if cnt
        ),
        key=lambda r: -r[1],
    )
