#!/usr/bin/env python3
"""Contamination-proof close runner (r14 verdict task #1).

Runs graft.Bench over the full query suite as CHUNKED SEPARATE JVM
invocations (SPARK_GRAFT_ONLY batches), so no query inherits another
chunk's accumulated session/JVM state, and concatenates the per-chunk
JSON into one close artifact. Within a chunk, Bench additionally
recycles the SparkSession every SPARK_GRAFT_RECYCLE queries (belt and
braces; a chunk <= recycle size means one session per chunk).

Usage:
  python3 tools/run_close.py --out BENCH_close.json \
      [--sf-dir /root/testdata/sf0.1] [--reps 2] [--chunk 25] \
      [--action noop] [--only q1,q2] [--heap 8g]

The classpath is exported from sbt once and cached at
target/close_classpath.txt (delete it after a dependency change;
recompiles are picked up automatically because the classpath points at
target/scala-2.13/classes).
"""
import argparse, json, os, subprocess, sys, time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ADD_OPENS = [
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
]


def classpath():
    cache = os.path.join(REPO, "target", "close_classpath.txt")
    if os.path.exists(cache):
        return open(cache).read().strip()
    out = subprocess.run(
        ["sbt", "-batch", "--error", "export Runtime/fullClasspath"],
        cwd=REPO, capture_output=True, text=True, check=True).stdout
    # last non-empty line is the colon-separated classpath
    cp = [l for l in out.splitlines() if l.strip() and ":" in l][-1].strip()
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    open(cache, "w").write(cp)
    return cp


def java_cmd(cp, heap, main, extra_props=()):
    cmd = ["java", f"-Xmx{heap}"]
    for p in ADD_OPENS:
        cmd += ["--add-opens", f"{p}=ALL-UNNAMED"]
    cmd += ["-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC"]
    cmd += list(extra_props) + ["-cp", cp, main]
    return cmd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--chunk", type=int, default=25)
    ap.add_argument("--action", default="noop", choices=["noop", "count"])
    ap.add_argument("--only", default=None,
                    help="comma-separated subset (still chunked)")
    ap.add_argument("--heap", default="8g")
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--recycle", default="25")
    args = ap.parse_args()

    cp = classpath()
    if args.only:
        names = sorted(set(args.only.split(",")))
    else:
        r = subprocess.run(java_cmd(cp, "1g", "graft.QueryList"),
                           capture_output=True, text=True, check=True)
        names = [l.strip() for l in r.stdout.splitlines() if l.strip()]
    chunks = [names[i:i + args.chunk] for i in range(0, len(names), args.chunk)]
    print(f"close: {len(names)} queries in {len(chunks)} chunks of "
          f"<= {args.chunk}, reps={args.reps}, action={args.action}, "
          f"heap={args.heap}", flush=True)

    merged_med, merged_min, errors = {}, {}, {}
    t_start = time.time()
    for ci, chunk in enumerate(chunks):
        env = dict(os.environ,
                   SPARK_GRAFT_SF_DIR=args.sf_dir,
                   SPARK_GRAFT_REPS=str(args.reps),
                   SPARK_GRAFT_CPUS=args.cpus,
                   SPARK_GRAFT_RECYCLE=args.recycle,
                   SPARK_GRAFT_ACTION=args.action,
                   SPARK_GRAFT_ONLY=",".join(chunk))
        t0 = time.time()
        r = subprocess.run(java_cmd(cp, args.heap, "graft.Bench"),
                           env=env, capture_output=True, text=True)
        line = next((l for l in r.stdout.splitlines()
                     if l.startswith('{"metric"')), None)
        if line is None:
            for q in chunk:
                errors[q] = f"chunk {ci} produced no JSON (rc {r.returncode})"
            sys.stderr.write(r.stdout[-2000:] + "\n" + r.stderr[-2000:] + "\n")
            print(f"  chunk {ci + 1}/{len(chunks)} FAILED rc={r.returncode}",
                  flush=True)
            continue
        d = json.loads(line)
        merged_med.update(d["queries"])
        merged_min.update(d["queries_min"])
        errors.update(d.get("errors", {}))
        print(f"  chunk {ci + 1}/{len(chunks)} ok: {len(chunk)} q, "
              f"{d['value']:.1f}s timed, wall {time.time() - t0:.0f}s",
              flush=True)

    out = {
        "metric": "total",
        "value": round(sum(merged_med.values()), 3),
        "unit": "sec",
        "reps": args.reps,
        "action": args.action,
        "protocol": f"chunked separate-JVM close: {len(chunks)} chunks of "
                    f"<={args.chunk}, heap {args.heap}, recycle "
                    f"{args.recycle}, reps={args.reps}",
        "queries": merged_med,
        "queries_min": merged_min,
        "errors": errors,
        "n_failed": len(errors),
        "sf": args.sf_dir,
        "wall_sec": round(time.time() - t_start, 1),
    }
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(f"wrote {args.out}: {len(merged_med)} ok, {len(errors)} failed, "
          f"timed total {out['value']:.1f}s, wall {out['wall_sec']:.0f}s",
          flush=True)
    if errors:
        sys.exit(1)


if __name__ == "__main__":
    main()
