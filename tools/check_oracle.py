#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables, compare to the Spark parquet output
under outDir (row count, column names, sorted-value hash)."""
import sys, json, glob, hashlib, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def frame_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.sha256()
    for row in rows:
        h.update("|".join(canon(row[i]) for i in order).encode())
        h.update(b"\n")
    return h.hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Verify.scala-emitted list of queries whose result must be non-empty:
    # a 0-row result matching an equally empty oracle is a vacuous green.
    ne_path = f"{out_dir}/expect_nonempty.json"
    nonempty = set(json.load(open(ne_path))) if os.path.exists(ne_path) else set()
    n_pass = n_fail = 0
    # Type BASE names whose python/pandas rendering is identical across
    # readers. HUGEINT (duckdb sum(BIGINT)) becomes float64 under
    # pandas-based comparators ('123.0' != '123') and DECIMAL reprs as
    # Decimal('..') — both caused silent driver-side hash mismatches in
    # round 2. Matched on the base name (before any '(' parameters) so
    # DECIMAL(p,s)/TIMESTAMP WITH TIME ZONE stay loud while parameterized
    # spellings of safe types don't hard-fail spuriously.
    SAFE = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE", "FLOAT",
            "VARCHAR", "DATE", "BOOLEAN", "TIMESTAMP", "BLOB"}
    for name, sql in sorted(oracle.items()):
        try:
            odf = con.sql(sql)
            ocols = list(odf.columns)
            otypes = [str(t) for t in odf.types]
            orows = odf.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        risky = [(c, t) for c, t in zip(ocols, otypes)
                 if t.split("(")[0].strip() not in SAFE]
        if risky:
            print(f"FAIL {name}: oracle column types unsafe across readers: {risky}")
            n_fail += 1
            continue
        parts = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not parts:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        sdf = con.sql(f"SELECT * FROM read_parquet({parts!r})")
        scols = list(sdf.columns)
        srows = sdf.fetchall()
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={scols} oracle={ocols}")
        if len(srows) != len(orows):
            problems.append(f"rows spark={len(srows)} oracle={len(orows)}")
        if name in nonempty and len(srows) == 0 and len(orows) == 0:
            problems.append("vacuous: both engines returned 0 rows but the "
                            "query is declared expect-non-empty")
        if not problems:
            hs = frame_hash(srows, scols)
            ho = frame_hash(orows, ocols)
            if hs != ho:
                problems.append("hash mismatch")
                # locate first differing row for debugging
                so = sorted(range(len(scols)), key=lambda i: scols[i])
                oo = sorted(range(len(ocols)), key=lambda i: ocols[i])
                for k, (a, b) in enumerate(zip(srows, orows)):
                    ca = [canon(a[i]) for i in so]
                    cb = [canon(b[i]) for i in oo]
                    if ca != cb:
                        problems.append(f"first diff row {k}:\n  spark : {ca}\n  oracle: {cb}")
                        break
        if problems:
            n_fail += 1
            print(f"FAIL {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print("  " + p)
        else:
            n_pass += 1
            print(f"PASS {name} ({len(srows)} rows)")
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
