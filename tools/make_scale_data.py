#!/usr/bin/env python3
"""Build an sf1-scale copy of the sf0.1 test tables for the amortization
measurement (VERDICT r11 task #1): every table the 10 most expensive
queries read, replicated R x (default 10) with DENSITY PRESERVED — the
point is to scale the WORKLOAD linearly, not to densify hotspots:

- embeddings: vec_id += k*(max+1); dim0 += k*1.2 translates each
  replica's point cloud to a fresh grid band (the proximity grid spans
  ~[-0.58, 0.52] in dim0, cells are 0.04 wide), so local density — and
  with it the grid join's per-cell pair work — stays constant while
  |V| and |pairs| grow 10x. Jittered-in-place copies would square the
  per-cell work instead (workload distortion, not scale).
  vec_id offset is a multiple of 4, preserving the %4 batch split.
- documents: doc_id += k*(max+1) (multiple of 25 and 4 — boilerplate
  planting and quarter splits preserved); for k>0 a deterministic 60%
  of words get a _k suffix, so replicas are NOT near-dups of the
  originals (Jaccard ~ 0.25, below every banding threshold) and the
  dup structure scales linearly instead of exploding combinatorially.
- lineitem/part: l_orderkey/l_partkey/p_partkey offset per replica —
  10 disjoint copies of the co-order graph (|V| and |E| x10, degree
  distribution unchanged). p_partkey offset is a multiple of 100,
  preserving the betweenness seed rule.
- events: event_id/user_id offset per replica, SAME calendar — 10x
  daily traffic from disjoint users, the realistic stream-scale path.
- all other tables: copied unchanged.

Usage: python3 tools/make_scale_data.py [R] [src_dir] [out_dir]
Defaults: 10 /root/testdata/sf0.1 /tmp/graft_sf1
"""
import sys
import duckdb

R = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SRC = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
OUT = sys.argv[3] if len(sys.argv) > 3 else "/tmp/graft_sf1"

import os
os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
con.sql(f"CREATE VIEW ks AS SELECT unnest(generate_series(0, {R - 1})) AS k")


def write(name, sql):
    con.sql(f"COPY ({sql}) TO '{OUT}/{name}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM read_parquet('{OUT}/{name}.parquet')").fetchone()[0]
    print(f"{name}: {n}")


def src(name):
    return f"read_parquet('{SRC}/{name}.parquet')"


# deterministic word perturbation for replica k: suffix word i when
# (i + doc_id) % 5 < 3 — list_transform keeps it set-based and fast
write("documents", f"""
  SELECT doc_id + k * 5000 AS doc_id,
         CASE WHEN k = 0 THEN text
              ELSE list_aggregate(
                list_transform(list_zip(string_split(text, ' '),
                    range(1, len(string_split(text, ' ')) + 1)),
                  p -> CASE WHEN (p[2] + doc_id) % 5 < 3
                            THEN p[1] || '_' || CAST(k AS VARCHAR)
                            ELSE p[1] END),
                'string_agg', ' ') END AS text,
         lang, source, n_chars
  FROM {src('documents')}, ks
""")

write("embeddings", f"""
  SELECT vec_id + k * 2000 AS vec_id,
         CASE WHEN k = 0 THEN embedding
              ELSE list_transform(list_zip(embedding,
                     range(1, len(embedding) + 1)),
                p -> CASE WHEN p[2] = 1
                          THEN CAST(p[1] + k * 1.2 AS FLOAT)
                          ELSE p[1] END) END AS embedding,
         label
  FROM {src('embeddings')}, ks
""")

write("lineitem", f"""
  SELECT l_orderkey + k * 150000 AS l_orderkey,
         l_partkey + k * 20000 AS l_partkey,
         l_suppkey, l_linenumber, l_quantity, l_extendedprice,
         l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
  FROM {src('lineitem')}, ks
""")

write("part", f"""
  SELECT p_partkey + k * 20000 AS p_partkey,
         p_name, p_brand, p_type, p_size, p_retailprice
  FROM {src('part')}, ks
""")

write("events", f"""
  SELECT event_id + k * 100000 AS event_id, ts,
         user_id + k * 1500 AS user_id, event_type, value, props
  FROM {src('events')}, ks
""")

for t in ["region", "nation", "customer", "supplier", "orders"]:
    write(t, f"SELECT * FROM {src(t)}")
