#!/usr/bin/env python3
"""Render graft.Bench JSON (the one-line {"metric":...} output) as the
uniform per-query baseline markdown table for BASELINE.md: one row per
query, median and min seconds, sorted by median descending."""
import json
import sys


def main(path):
    line = None
    with open(path) as f:
        for ln in f:
            ln = ln.strip()
            if '"metric"' in ln:
                line = ln[ln.index('{'):]
    if line is None:
        sys.exit(f"no metric line in {path}")
    d = json.loads(line)
    med, mn = d["queries"], d.get("queries_min", {})
    print(f'Total: **{d["value"]} s over {len(med)} queries** '
          f'(reps={d.get("reps")}, sf={d.get("sf")}, zero failures '
          f'{"CONFIRMED" if not d.get("errors") else "ERRORS: " + str(d["errors"])})')
    print()
    print("| query | median s | min s |")
    print("|---|---|---|")
    for q in sorted(med, key=lambda q: -med[q]):
        print(f"| `{q}` | {med[q]:.3f} | {mn.get(q, float('nan')):.3f} |")


if __name__ == "__main__":
    main(sys.argv[1])
