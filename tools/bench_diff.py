#!/usr/bin/env python3
"""Compare two bench outputs per query, noise-aware.

Usage: bench_diff.py <old> <new>

Each argument is either a driver BENCH_r{N}.json artifact (with a
"parsed" or "tail" field) or a raw file whose first line is Bench's
full JSON metric line. Flags regressions that are BOTH >25% relative
and >0.3 s absolute — single-run noise on this box is a uniform
±0.05 s/query drift plus occasional 0.2 s spikes, so smaller deltas
are not signal. Prints the median delta first: if it is large, the
whole run drifted (load/thermal) and per-query flags are suspect.
"""
import json
import re
import statistics
import sys


def load(path: str) -> tuple:
    """Returns (queries, isolated) — isolated may be empty (pre-r10 runs)."""
    raw = open(path).read()
    try:
        d = json.loads(raw)
        if isinstance(d, dict) and "queries" in d:
            return d["queries"], d.get("isolated", {})
        if isinstance(d, dict):  # driver artifact
            if d.get("parsed") and "queries" in d["parsed"]:
                return d["parsed"]["queries"], d["parsed"].get("isolated", {})
            tail = d.get("tail", "")
            m = re.findall(r'\{"metric":"total".*?\}\}', tail)
            if m:
                p = json.loads(m[-1])
                return p["queries"], p.get("isolated", {})
        raise ValueError("no queries found")
    except json.JSONDecodeError:
        for line in raw.splitlines():
            if '"metric":"total"' in line:
                p = json.loads(line[line.index('{'):])
                return p["queries"], p.get("isolated", {})
        raise


def main(old_path: str, new_path: str) -> int:
    (old, old_iso), (new, new_iso) = load(old_path), load(new_path)
    common = sorted(set(old) & set(new))
    deltas = [new[k] - old[k] for k in common]
    med = statistics.median(deltas) if deltas else 0.0
    print(f"{len(common)} common queries; sum {sum(old[k] for k in common):.1f}s -> "
          f"{sum(new[k] for k in common):.1f}s; median delta {med:+.3f}s"
          + ("  [WHOLE-RUN DRIFT — per-query flags suspect]" if abs(med) > 0.03 else ""))
    for k in sorted(set(new) - set(old)):
        print(f"  NEW      {k:26s} {new[k]:6.2f}s")
    for k in sorted(set(old) - set(new)):
        print(f"  REMOVED  {k:26s} (was {old[k]:.2f}s)")
    flagged = 0
    for k in sorted(common, key=lambda k: old[k] - new[k]):
        d = new[k] - old[k] - med  # drift-corrected
        if d > 0.3 and d > 0.25 * max(old[k], 0.01):
            print(f"  SLOWER   {k:26s} {old[k]:6.2f} -> {new[k]:6.2f}  (+{d:.2f} after drift)")
            flagged += 1
        elif -d > 0.3 and -d > 0.25 * max(old[k], 0.01):
            print(f"  faster   {k:26s} {old[k]:6.2f} -> {new[k]:6.2f}  ({d:.2f} after drift)")
    # isolated companion map (fresh-JVM min-of-3 for the heap-heavy
    # keys): no drift correction — these numbers are suite-independent,
    # so a delta here is a REAL per-query change, flagged tighter
    iso_common = sorted(set(old_iso) & set(new_iso))
    if iso_common:
        print(f"isolated ({len(iso_common)} keys):")
        for k in iso_common:
            d = new_iso[k] - old_iso[k]
            mark = ""
            if d > 0.2 and d > 0.15 * max(old_iso[k], 0.01):
                mark = "  SLOWER"
                flagged += 1
            elif -d > 0.2 and -d > 0.15 * max(old_iso[k], 0.01):
                mark = "  faster"
            print(f"  {k:26s} {old_iso[k]:6.2f} -> {new_iso[k]:6.2f}{mark}")
    # summary LAST so it counts isolated regressions too
    print(f"{flagged} regressions flagged")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
