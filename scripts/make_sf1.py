#!/usr/bin/env python3
"""Builder-local sf1 scale probe data: replicate the driver's sf0.1
tables x10 with key-consistent shifts, so join fan-outs, group
cardinalities, and dedup candidate structure scale the way a real 10x
table would. region/nation stay fixed (true dimensions). Each copy k
shifts every entity key by k*OFFSET (same offset per key family on
both sides of each FK), appends a copy marker token to document text
(so near-dup structure scales instead of exploding into 10x exact
clones), and leaves timestamps unchanged.

Output: /root/repo/benchdata/sf1/*.parquet (gitignored scratch).
"""
import duckdb, os, sys

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/benchdata/sf1"
COPIES = 10
OFF = 10_000_000  # > every key in sf0.1

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

def gen(table, select_tpl):
    parts = [select_tpl.format(k=k, off=k * OFF) for k in range(COPIES)]
    q = " UNION ALL ".join(parts)
    con.execute(f"COPY ({q}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")

# true dimensions: copy through once
for t in ("region", "nation"):
    con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    print(t, "copied")

gen("customer", f"""
  SELECT c_custkey + {{off}} AS c_custkey, c_name, c_nationkey, c_acctbal,
         c_mktsegment FROM '{SRC}/customer.parquet'""")
gen("supplier", f"""
  SELECT s_suppkey + {{off}} AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM '{SRC}/supplier.parquet'""")
gen("part", f"""
  SELECT p_partkey + {{off}} AS p_partkey, p_name, p_brand, p_type, p_size,
         p_retailprice FROM '{SRC}/part.parquet'""")
gen("orders", f"""
  SELECT o_orderkey + {{off}} AS o_orderkey, o_custkey + {{off}} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{SRC}/orders.parquet'""")
gen("lineitem", f"""
  SELECT l_orderkey + {{off}} AS l_orderkey, l_partkey + {{off}} AS l_partkey,
         l_suppkey + {{off}} AS l_suppkey, l_linenumber, l_quantity,
         l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
         l_shipdate FROM '{SRC}/lineitem.parquet'""")
gen("events", f"""
  SELECT event_id + {{off}} AS event_id, ts, user_id + {{off}} AS user_id,
         event_type, value, props FROM '{SRC}/events.parquet'""")
# text gets a per-copy marker token: dedup/LSH sees 10x the corpus with
# the ORIGINAL near-dup structure per copy, not 10 exact clones of it
gen("documents", f"""
  SELECT doc_id + {{off}} AS doc_id,
         text || ' copymark{{k}}' AS text, lang, source,
         n_chars + {len('copymarkK') + 1} AS n_chars
  FROM '{SRC}/documents.parquet'""")
gen("embeddings", f"""
  SELECT vec_id + {{off}} AS vec_id, embedding, label
  FROM '{SRC}/embeddings.parquet'""")
print("done ->", DST)
