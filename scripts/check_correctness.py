#!/usr/bin/env python3
"""DEV-ONLY local mimic of the driver's DuckDB-oracle compare.

Usage: python3 scripts/check_correctness.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sfDir
parquet tables, sorts columns by name, and compares values (both
row-ordered and row-sorted). Not part of the shipped library.
"""
import json, sys, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for compare
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.reset_index(drop=True)


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b or abs(a - b) < 1e-12 * max(1.0, abs(a), abs(b))
    return a == b


def frames_equal(a: pd.DataFrame, b: pd.DataFrame):
    if list(a.columns) != list(b.columns):
        return False, f"columns {list(a.columns)} != {list(b.columns)}"
    if len(a) != len(b):
        return False, f"rowcount {len(a)} != {len(b)}"
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            x = None if (x is pd.NaT or (isinstance(x, float) and pd.isna(x))) else x
            y = None if (y is pd.NaT or (isinstance(y, float) and pd.isna(y))) else y
            if x is pd.NA: x = None
            if y is pd.NA: y = None
            if x is None and y is None:
                continue
            if x is None or y is None or not values_equal(x, y):
                return False, f"col {c} row {i}: spark={x!r} oracle={y!r}"
    return True, ""


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    import glob
    names = sorted(d.split("/")[-1] for d in glob.glob(f"{out_dir}/*")
                   if not d.endswith(".json"))
    n_pass = n_fail = n_weak = 0
    for name in names:
        spark_df = canon(pd.concat(
            [pd.read_parquet(p) for p in sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))],
            ignore_index=True) if glob.glob(f"{out_dir}/{name}/*.parquet")
            else pd.read_parquet(f"{out_dir}/{name}"))
        if name not in oracle:
            ok = len(spark_df) > 0
            n_weak += 1
            print(f"{'PASS(rows-only)' if ok else 'FAIL(empty)'}  {name}  rows={len(spark_df)}")
            if not ok:
                n_fail += 1
            continue
        try:
            duck_df = canon(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL(oracle-error)  {name}: {e}")
            n_fail += 1
            continue
        ok, why = frames_equal(spark_df, duck_df)
        if ok:
            print(f"PASS  {name}  rows={len(spark_df)}")
            n_pass += 1
        else:
            # retry row-sorted in case ordering differs
            sa = spark_df.sort_values(list(spark_df.columns)).reset_index(drop=True)
            sb = duck_df.sort_values(list(duck_df.columns)).reset_index(drop=True)
            ok2, why2 = frames_equal(sa, sb)
            if ok2:
                print(f"PASS(sorted-only!)  {name}  — row ORDER differs: {why}")
                n_pass += 1
            else:
                print(f"FAIL  {name}: {why}")
                n_fail += 1
    print(f"\n{n_pass} pass, {n_weak} rows-only, {n_fail} FAIL")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
