#!/usr/bin/env python3
"""Compare a fresh close JSON (tools/run_close.py output) against the
previous round's BASELINE_QUERIES.json on min-of-reps, printing the
rows whose ratio exceeds a threshold — the record of which rows moved
under a protocol or plan change.

Usage: python3 tools/close_compare.py BENCH_close.json [--flag 1.5]
"""
import argparse, json, os, statistics

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("close_json")
    ap.add_argument("--flag", type=float, default=1.5)
    args = ap.parse_args()
    cur = json.load(open(args.close_json))
    prev = json.load(open(os.path.join(REPO, "BASELINE_QUERIES.json")))
    pq = prev["queries"]
    rows = []
    for q, mn in cur["queries_min"].items():
        if q in pq and pq[q].get("min_s"):
            rows.append((q, pq[q]["min_s"], mn, mn / pq[q]["min_s"]))
    rows.sort(key=lambda r: -r[3])
    ratios = [r[3] for r in rows]
    print(f"{len(rows)} shared rows; median min-ratio "
          f"{statistics.median(ratios):.2f}x; "
          f"{sum(1 for r in ratios if r > args.flag)} above "
          f"{args.flag:.2f}x, {sum(1 for r in ratios if r < 1/args.flag)} "
          f"below {1/args.flag:.2f}x")
    print(f"\nrows > {args.flag:.2f}x (prev min s -> new min s):")
    for q, pm, nm, r in rows:
        if r > args.flag:
            print(f"  {q}: {pm:.2f} -> {nm:.2f}  ({r:.2f}x)")
    print(f"\nrows < {1/args.flag:.2f}x (improvements):")
    for q, pm, nm, r in sorted(rows, key=lambda r: r[3]):
        if r < 1 / args.flag:
            print(f"  {q}: {pm:.2f} -> {nm:.2f}  ({r:.2f}x)")
    new = sorted(set(cur["queries_min"]) - set(pq))
    if new:
        print(f"\nnew queries (no baseline row): {new}")


if __name__ == "__main__":
    main()
