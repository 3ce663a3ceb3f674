#!/usr/bin/env python3
"""Build the full-suite sf1/sf0.1 cost-ratio table (round-13 verdict
task #1): read two graft.Bench JSON lines (same jar, same session,
back-to-back on an idle host), join per-query medians, and emit a
markdown table sorted by ratio descending plus summary stats.

Usage: python3 tools/sf1_ratio_table.py /tmp/bench_sf01_r13.json \
           /tmp/bench_sf1_r13.json [threshold]

Queries with ratio > threshold (default 10.0 = the data growth) are
flagged SUPERLINEAR — each needs a named cause and a fix or a
documented contract (the llm_lm_retrieval precedent).
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.loads(f.read().strip())


def main():
    a = load(sys.argv[1])  # sf0.1
    b = load(sys.argv[2])  # sf1
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    qa, qb = a["queries"], b["queries"]
    rows = []
    for q in sorted(qa):
        if q in qb and qa[q] > 0:
            rows.append((q, qa[q], qb[q], qb[q] / qa[q]))
    rows.sort(key=lambda r: -r[3])
    flagged = [r for r in rows if r[3] > thr]
    print(f"| query | sf0.1 s | sf1 s (10x data) | cost ratio |")
    print(f"|---|---|---|---|")
    for q, x, y, r in rows:
        mark = " **SUPERLINEAR**" if r > thr else ""
        print(f"| `{q}` | {x:.3f} | {y:.3f} | {r:.2f}x{mark} |")
    n = len(rows)
    import statistics
    med = statistics.median(r[3] for r in rows)
    print()
    print(f"queries: {n}; median ratio {med:.2f}x; "
          f"max {rows[0][0]} {rows[0][3]:.2f}x; "
          f"total sf0.1 {sum(r[1] for r in rows):.1f}s, "
          f"sf1 {sum(r[2] for r in rows):.1f}s; "
          f">={thr}x flagged: {len(flagged)}")
    print(f"missing in sf1 run: {sorted(set(qa) - set(qb))}")
    print(f"errors sf0.1: {a.get('errors', {})}")
    print(f"errors sf1: {b.get('errors', {})}")


if __name__ == "__main__":
    main()
