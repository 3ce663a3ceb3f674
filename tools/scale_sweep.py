#!/usr/bin/env python3
"""Repeatable two-point scale sweep (r14 verdict task #5).

One command reproduces the BENCH_SCALE artifacts: build the scaled
corpus if absent (tools/make_scale_data.py), run the suite (or a
subset) CHUNKED at the base scale and the scaled corpus via the same
separate-JVM protocol as tools/run_close.py, and emit the ratio table
(JSON artifact per scale point + a markdown table on stdout, ratios on
min-of-reps — the stable read).

Usage:
  python3 tools/scale_sweep.py --tag r15 \
      [--base /root/testdata/sf0.1] [--factor 10] [--scaled-dir auto] \
      [--only q1,q2] [--reps 2] [--chunk 25] [--flag 2.0]

Artifacts: BENCH_SCALE_<tag>_base.json, BENCH_SCALE_<tag>_scaled.json
in the repo root. Queries whose min-of-reps ratio exceeds --flag are
listed under FLAGGED — re-measure those targeted before calling them
superlinear (suite-position noise is real; see BASELINE.md).
"""
import argparse, json, os, subprocess, sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_close(out, sf_dir, reps, chunk, only, action):
    cmd = [sys.executable, os.path.join(REPO, "tools", "run_close.py"),
           "--out", out, "--sf-dir", sf_dir, "--reps", str(reps),
           "--chunk", str(chunk), "--action", action]
    if only:
        cmd += ["--only", only]
    r = subprocess.run(cmd, cwd=REPO)
    if r.returncode != 0:
        print(f"WARNING: close run for {sf_dir} exited {r.returncode} "
              f"(per-query errors are in {out})", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True, help="artifact name stem")
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--factor", type=int, default=10,
                    help="replication factor for make_scale_data.py")
    ap.add_argument("--scaled-dir", default="auto",
                    help="'auto' -> /tmp/graft_scale_<factor>x")
    ap.add_argument("--only", default=None)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--chunk", type=int, default=25)
    ap.add_argument("--action", default="noop", choices=["noop", "count"])
    ap.add_argument("--flag", type=float, default=2.0,
                    help="flag ratios above this in the table")
    args = ap.parse_args()

    scaled = (f"/tmp/graft_scale_{args.factor}x"
              if args.scaled_dir == "auto" else args.scaled_dir)
    if not os.path.exists(os.path.join(scaled, "lineitem.parquet")):
        print(f"building {args.factor}x corpus at {scaled} ...", flush=True)
        subprocess.run([sys.executable,
                        os.path.join(REPO, "tools", "make_scale_data.py"),
                        str(args.factor), args.base, scaled],
                       cwd=REPO, check=True)

    base_out = os.path.join(REPO, f"BENCH_SCALE_{args.tag}_base.json")
    scaled_out = os.path.join(REPO, f"BENCH_SCALE_{args.tag}_scaled.json")
    print(f"== base leg: {args.base}", flush=True)
    run_close(base_out, args.base, args.reps, args.chunk, args.only,
              args.action)
    print(f"== scaled leg: {scaled} ({args.factor}x)", flush=True)
    run_close(scaled_out, scaled, args.reps, args.chunk, args.only,
              args.action)

    b = json.load(open(base_out))
    s = json.load(open(scaled_out))
    rows = []
    for q, bmin in sorted(b["queries_min"].items()):
        smin = s["queries_min"].get(q)
        if smin is None or bmin <= 0:
            continue
        rows.append((q, bmin, smin, smin / bmin))
    rows.sort(key=lambda r: -r[3])
    flagged = [r for r in rows if r[3] > args.flag]
    print(f"\n| query | base min s | {args.factor}x min s | ratio |")
    print("|---|---|---|---|")
    for q, bm, sm, ratio in rows:
        mark = " **FLAG**" if ratio > args.flag else ""
        print(f"| `{q}` | {bm:.2f} | {sm:.2f} | {ratio:.2f}x{mark} |")
    import statistics
    if rows:
        print(f"\nmedian ratio {statistics.median(r[3] for r in rows):.2f}x "
              f"over {len(rows)} queries; {len(flagged)} above "
              f"{args.flag:.1f}x", flush=True)
    missing = (set(b["queries_min"]) ^ set(s["queries_min"]))
    if missing:
        print(f"NOT in both legs (errors/subset drift): {sorted(missing)}")
    if b.get("errors") or s.get("errors"):
        print(f"errors: base={b.get('errors')} scaled={s.get('errors')}")


if __name__ == "__main__":
    main()
