#!/usr/bin/env python3
"""sf100 scale-probe data for the LLM-pipeline tables ONLY: a third
decade on top of make_sf10.py (100 x sf1 = 1000 x the driver's bench
SF) for documents / embeddings / events — the tables the dedup, ANN,
and sketch families read. The relational tables are deliberately
omitted (lineitem at sf100 is ~20 GB of scratch for ops the probe
doesn't target). Same key-consistent shift scheme, one more copymark
token so near-dup structure keeps scaling instead of cloning.
Output: /root/repo/benchdata/sf100 (gitignored scratch).
Usage: make_sf1.py && make_sf10.py && make_sf100.py
"""
import duckdb, os, sys

SRC = "/root/repo/benchdata/sf10"
DST = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/benchdata/sf100"
COPIES = 10
OFF = 100_000_000_000  # > every key in sf10 (max ~9.1e9)

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

def gen(table, select_tpl):
    parts = [select_tpl.format(k=k, off=k * OFF) for k in range(COPIES)]
    q = " UNION ALL ".join(parts)
    con.execute(f"COPY ({q}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{DST}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows", flush=True)

gen("events", f"""
  SELECT event_id + {{off}} AS event_id, ts, user_id + {{off}} AS user_id,
         event_type, value, props FROM '{SRC}/events.parquet'""")
gen("documents", f"""
  SELECT doc_id + {{off}} AS doc_id,
         text || ' centmark{{k}}' AS text, lang, source,
         n_chars + {len('centmarkK') + 1} AS n_chars
  FROM '{SRC}/documents.parquet'""")
gen("embeddings", f"""
  SELECT vec_id + {{off}} AS vec_id, embedding, label
  FROM '{SRC}/embeddings.parquet'""")
print("done ->", DST)
