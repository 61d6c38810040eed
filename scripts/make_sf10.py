#!/usr/bin/env python3
"""sf10 scale-probe data: one more decade on top of make_sf1.py's sf1
(10 x sf1 = 100 x the driver's bench SF), same key-consistent shift
scheme with a bigger offset (sf1 keys reach ~10M + 10*10M). Documents
get a second copymark token so near-dup structure scales instead of
cloning. Output: /root/repo/benchdata/sf10 (gitignored scratch).
Usage: python3 scripts/make_sf1.py && python3 scripts/make_sf10.py
"""
import duckdb, os, sys

SRC = "/root/repo/benchdata/sf1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/benchdata/sf10"
COPIES = 10
OFF = 1_000_000_000  # > every key in sf1 (max ~1.1e8)

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

def gen(table, select_tpl):
    parts = [select_tpl.format(k=k, off=k * OFF) for k in range(COPIES)]
    q = " UNION ALL ".join(parts)
    con.execute(f"COPY ({q}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows", flush=True)

for t in ("region", "nation"):
    con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    print(t, "copied", flush=True)

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
gen("documents", f"""
  SELECT doc_id + {{off}} AS doc_id,
         text || ' deckmark{{k}}' AS text, lang, source,
         n_chars + {len('deckmarkK') + 1} AS n_chars
  FROM '{SRC}/documents.parquet'""")
gen("embeddings", f"""
  SELECT vec_id + {{off}} AS vec_id, embedding, label
  FROM '{SRC}/embeddings.parquet'""")
print("done ->", DST)
