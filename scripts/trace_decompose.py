"""Decompose a jax.profiler chrome trace into per-op-category device time.

Reads the newest ``*.trace.json.gz`` under the given profile dir (the format
``jax.profiler.trace`` writes through the axon tunnel) and prints, for the
device-side complete events, total duration grouped by a coarse op category
(fusion kind / custom-call target / op name stem) plus the top individual
ops. This automates the decomposition used throughout
docs/performance.md ("Measured breakdown", training-trace section).

Categories:
  - ``custom-call:<target>``  (Pallas kernels, cuDNN-analogue calls)
  - ``fusion``               split by the hlo_op arg's dominant op if present
  - everything else          by event-name stem before the first ``.``/digit

Usage: python scripts/trace_decompose.py /tmp/trace_dir [top_n]
"""

import collections
import glob
import gzip
import json
import os
import re
import sys


def load_events(trace_dir: str):
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        doc = json.load(f)
    # device-side pids: their process names mention TPU/device; host pids
    # carry python/runtime threads. Fall back to "all X events" if the
    # metadata is absent.
    dev_pids = set()
    for ev in doc["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            name = (ev.get("args") or {}).get("name", "")
            if re.search(r"TPU|/device:|XLA", name, re.I):
                dev_pids.add(ev["pid"])
    events = [
        ev for ev in doc["traceEvents"]
        if ev.get("ph") == "X" and (not dev_pids or ev.get("pid") in dev_pids)
    ]
    return paths[-1], events


_STEM = re.compile(r"^([A-Za-z_\-]+)")


def categorize(ev) -> str:
    name = ev.get("name", "")
    args = ev.get("args") or {}
    long_name = args.get("long_name", "") or args.get("hlo_op", "")
    if "custom-call" in name or "custom_call" in long_name:
        target = re.search(r"custom_call_target=\"([^\"]+)\"", long_name)
        if target:
            return f"custom-call:{target.group(1)}"
        return f"custom-call:{_STEM.match(name).group(1) if _STEM.match(name) else name}"
    stem = _STEM.match(name)
    stem = stem.group(1).rstrip("_-.") if stem else name
    if stem == "fusion":
        # classify by what the fusion computes when the args say so
        for kind in ("reduce", "convert", "scatter", "gather", "transpose"):
            if kind in long_name or kind in name:
                return f"fusion:{kind}"
        return "fusion:elementwise"
    return stem


def main(trace_dir: str, top_n: int = 25) -> None:
    path, events = load_events(trace_dir)
    print(f"trace: {path}  ({len(events)} complete events)")
    by_cat = collections.Counter()
    count_cat = collections.Counter()
    by_name = collections.Counter()
    for ev in events:
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        cat = categorize(ev)
        by_cat[cat] += dur
        count_cat[cat] += 1
        by_name[ev.get("name", "?")] += dur
    total = sum(by_cat.values())
    print(f"\ntotal device-event time: {total:.1f} ms")
    print("\n-- by category --")
    for cat, ms in by_cat.most_common(20):
        print(f"{ms:9.2f} ms  {count_cat[cat]:5d}x  {cat}")
    print(f"\n-- top {top_n} individual ops --")
    for name, ms in by_name.most_common(top_n):
        print(f"{ms:9.2f} ms  {name[:100]}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 25)
