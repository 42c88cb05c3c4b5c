#!/usr/bin/env python3
"""Merge N clean bench trace legs into a reference trace.

Usage: python3 dev/merge_traces.py OUT LEG1 LEG2 [LEG3 ...]

Per query, every numeric field is the per-field MEDIAN across the legs
(wall_sec medians damp run-to-run noise; task counts / shuffle bytes are
identical across clean legs, so their median is just the value). Queries
missing from any leg are dropped with a warning — the reference must only
contain queries every leg measured.
"""
import json
import statistics
import sys


def main() -> None:
    out, legs = sys.argv[1], sys.argv[2:]
    if len(legs) < 2:
        sys.exit("need at least 2 legs")
    traces = [json.load(open(p)) for p in legs]
    common = set(traces[0])
    for t in traces[1:]:
        common &= set(t)
    for t, p in zip(traces, legs):
        extra = set(t) - common
        if extra:
            print(f"WARN {p}: dropping {sorted(extra)} (not in every leg)")
    merged = {}
    for q in sorted(common):
        # non-numeric diagnostics (e.g. a streaming query's per-batch
        # [id, ms, rows] list) come verbatim from the median-wall leg
        med_leg = sorted(traces, key=lambda t: t[q]["wall_sec"])[
            len(traces) // 2]
        row = {}
        for f, v0 in traces[0][q].items():
            if isinstance(v0, float):
                row[f] = round(statistics.median(t[q][f] for t in traces), 3)
            elif isinstance(v0, int):
                row[f] = int(statistics.median(t[q][f] for t in traces))
            else:
                row[f] = med_leg[q][f]
        merged[q] = row
    with open(out, "w") as fh:
        json.dump(merged, fh, indent=0, sort_keys=True)
    walls = [sum(t[q]["wall_sec"] for q in common) for t in traces]
    total = sum(merged[q]["wall_sec"] for q in common)
    print(f"{out}: {len(merged)} queries, leg totals "
          f"{[round(w, 1) for w in walls]} -> median-merged {total:.1f}s")


if __name__ == "__main__":
    main()
