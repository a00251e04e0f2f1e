#!/usr/bin/env python3
"""Generate the sf1 scale-growth corpus from sf0.1 (deterministic).

/root/testdata is read-only and the driver generates nothing above
sf0.1, so the scale smoke (tools/scale_smoke.py) builds its own 10x
tier under testdata_sf1/ by replicating sf0.1 with a seeded word-level
perturbation:

- documents: 10 replicas; replica 0 is sf0.1 verbatim, replica k
  offsets doc_id by k*N and rewrites each word with probability ~1/8
  to a deterministically hash-chosen vocabulary word. Keeps the
  length/vocabulary distribution (the miners' shingle statistics)
  while replicas stay distinct documents rather than exact copies.
- customer: 10 replicas with re-numbered c_custkey and the matching
  Customer#%09d name, so edit-distance-1 density stays in the same
  regime instead of exploding through 10 exact name copies.
- lineitem: 10 replicas with re-numbered l_orderkey; replicas k>0
  shift l_extendedprice by a deterministic hash-chosen cent offset in
  [-0.50, 0.49] so the distinct-value density the q64 percentile
  refinement navigates grows with the data instead of stacking 10
  exact copies of every price (l_quantity keeps its 50-value grid —
  the duplicate-spike path).
- embeddings: 10 replicas with re-numbered vec_id, replica 0 verbatim
  (seed/query ids stay valid); clones are exact, so cluster cells and
  IVF lists grow 10x and q112's within-cell pair work grows ~100x —
  the quadratic term its budget grades on.
- every other table is hard-linked from sf0.1.

Everything is pure SQL over hash() — no RNG state, same output on
every run. Run: python3 tools/gen_sf1.py [outdir]
"""
import duckdb
import os
import sys

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else \
    os.path.join(os.path.dirname(__file__), "..", "testdata_sf1")
REPLICAS = 10

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()

n_docs = con.execute(
    f"SELECT count(*), max(doc_id) FROM read_parquet('{SRC}/documents.parquet')"
).fetchone()
doc_stride = n_docs[1] + 1

con.execute(f"""
COPY (
  WITH base AS (SELECT * FROM read_parquet('{SRC}/documents.parquet')),
  vocab AS (
    SELECT list(word ORDER BY word) AS v, count(*) AS nv
    FROM (SELECT DISTINCT unnest(string_split(text, ' ')) AS word FROM base)
    WHERE len(word) > 0
  ),
  reps AS (SELECT unnest(range({REPLICAS})) AS k)
  SELECT
    b.doc_id + r.k * {doc_stride} AS doc_id,
    CASE WHEN r.k = 0 THEN b.text ELSE
      array_to_string(
        list_transform(
          list_zip(string_split(b.text, ' '),
                   range(1, len(string_split(b.text, ' ')) + 1)),
          p -> CASE
            WHEN len(p[1]) > 0
                 AND hash(b.doc_id * 1000003 + p[2] * 7919 + r.k) % 8 = 0
            THEN v.v[1 + CAST(hash(b.doc_id * 999983 + p[2] * 104729 + r.k)
                              % v.nv AS INT)]
            ELSE p[1] END),
        ' ')
    END AS text,
    b.lang, b.source,
    CAST(len(CASE WHEN r.k = 0 THEN b.text ELSE
      array_to_string(
        list_transform(
          list_zip(string_split(b.text, ' '),
                   range(1, len(string_split(b.text, ' ')) + 1)),
          p -> CASE
            WHEN len(p[1]) > 0
                 AND hash(b.doc_id * 1000003 + p[2] * 7919 + r.k) % 8 = 0
            THEN v.v[1 + CAST(hash(b.doc_id * 999983 + p[2] * 104729 + r.k)
                              % v.nv AS INT)]
            ELSE p[1] END),
        ' ')
    END) AS BIGINT) AS n_chars
  FROM base b, reps r, vocab v
  ORDER BY doc_id
) TO '{OUT}/documents.parquet' (FORMAT PARQUET)
""")

n_cust = con.execute(
    f"SELECT max(c_custkey) FROM read_parquet('{SRC}/customer.parquet')"
).fetchone()[0] + 1

con.execute(f"""
COPY (
  WITH base AS (SELECT * FROM read_parquet('{SRC}/customer.parquet')),
  reps AS (SELECT unnest(range({REPLICAS})) AS k)
  SELECT
    b.c_custkey + r.k * {n_cust} AS c_custkey,
    'Customer#' || lpad(CAST(b.c_custkey + r.k * {n_cust} AS VARCHAR), 9, '0')
      AS c_name,
    b.c_nationkey, b.c_acctbal, b.c_mktsegment
  FROM base b, reps r
  ORDER BY c_custkey
) TO '{OUT}/customer.parquet' (FORMAT PARQUET)
""")

n_ord = con.execute(
    f"SELECT max(l_orderkey) FROM read_parquet('{SRC}/lineitem.parquet')"
).fetchone()[0] + 1

con.execute(f"""
COPY (
  WITH base AS (SELECT * FROM read_parquet('{SRC}/lineitem.parquet')),
  reps AS (SELECT unnest(range({REPLICAS})) AS k)
  SELECT
    b.l_orderkey + r.k * {n_ord} AS l_orderkey,
    b.l_partkey, b.l_suppkey, b.l_linenumber, b.l_quantity,
    CASE WHEN r.k = 0 THEN b.l_extendedprice ELSE
      round(b.l_extendedprice +
            (CAST(hash(b.l_orderkey * 31 + b.l_linenumber * 7 + r.k) % 100
                  AS INT) - 50) / 100.0, 2)
    END AS l_extendedprice,
    b.l_discount, b.l_tax, b.l_returnflag, b.l_linestatus, b.l_shipdate
  FROM base b, reps r
  ORDER BY l_orderkey, l_linenumber
) TO '{OUT}/lineitem.parquet' (FORMAT PARQUET)
""")

n_vec = con.execute(
    f"SELECT max(vec_id) FROM read_parquet('{SRC}/embeddings.parquet')"
).fetchone()[0] + 1

con.execute(f"""
COPY (
  WITH base AS (SELECT * FROM read_parquet('{SRC}/embeddings.parquet')),
  reps AS (SELECT unnest(range({REPLICAS})) AS k)
  SELECT b.vec_id + r.k * {n_vec} AS vec_id, b.embedding, b.label
  FROM base b, reps r
  ORDER BY vec_id
) TO '{OUT}/embeddings.parquet' (FORMAT PARQUET)
""")

for t in ("region", "nation", "supplier", "part", "orders", "events"):
    dst = f"{OUT}/{t}.parquet"
    if not os.path.exists(dst):
        os.link(f"{SRC}/{t}.parquet", dst)

for t in ("documents", "customer", "lineitem", "embeddings"):
    n = con.execute(f"SELECT count(*) FROM read_parquet('{OUT}/{t}.parquet')").fetchone()[0]
    print(f"{t}: {n} rows")
print(f"sf1 tier ready at {OUT}")
