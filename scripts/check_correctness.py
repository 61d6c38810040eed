#!/usr/bin/env python3
"""DEV-ONLY local mimic of the driver's DuckDB-oracle compare.

Usage: python3 scripts/check_correctness.py <sfDir> <verifyOutDir>
       python3 scripts/check_correctness.py --lint <sfDir> <oracle_sql.json>

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the sfDir
parquet tables, sorts columns by name, and compares values (both
row-ordered and row-sorted). Not part of the shipped library.

TYPE LINT (mechanized after the round-11 HUGEINT incident — the
round-6 dr53 lesson in prose decayed and five oracles reintroduced
un-cast integer sums): the driver's hash layer renders a DuckDB
HUGEINT through float64 ("123.0" vs Spark int64's "123"), so values
that compare equal here ("123 == 123.0") still hash-mismatch there.
Two mechanical guards, either of which catches the whole class:
  1. any oracle column typed HUGEINT/UHUGEINT is an outright FAIL;
  2. the Spark parquet schema class (int / float / string / ...)
     must match the oracle relation's declared type class per column
     (TYPE-DRIFT) — declared types, NOT pandas dtypes, so nullable
     int columns don't false-alarm through pandas' float widening.
`--lint` runs guard 1 (+ oracle executes at all) over every oracle
without needing Spark outputs.
"""
import json, sys, math
import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def type_class(t) -> str:
    """Coarse type class shared by DuckDB declared types and Arrow
    types; the driver's hash renders within-class identically and
    across-class differently, so class mismatch = hash risk."""
    s = str(t).upper()
    if "HUGEINT" in s:
        return "hugeint"
    if s.startswith("LIST") or s.startswith("STRUCT") or "[]" in s \
            or s.startswith("MAP"):
        return "nested"
    if "DECIMAL" in s:
        return "decimal"
    if "TIMESTAMP" in s:
        return "timestamp"
    if "DATE" in s:
        return "date"
    if "BOOL" in s:
        return "bool"
    if any(k in s for k in ("DOUBLE", "FLOAT", "REAL", "HALF")):
        return "float"
    if "INT" in s:  # TINYINT/SMALLINT/INTEGER/BIGINT/U*/int8..64
        return "int"
    if any(k in s for k in ("VARCHAR", "STRING", "TEXT", "CHAR")):
        return "string"
    return "other"


def oracle_type_lint(rel) -> list:
    """Guard 1: reject HUGEINT/UHUGEINT in an oracle relation's
    declared schema. Returns offending (column, type) pairs."""
    return [(c, str(t)) for c, t in zip(rel.columns, rel.types)
            if "HUGEINT" in str(t).upper()]


def spark_schema(out_path_or_glob) -> dict:
    """column -> arrow type, from the first Spark parquet part file."""
    import glob as g
    files = sorted(g.glob(f"{out_path_or_glob}/*.parquet")) or [out_path_or_glob]
    sch = pq.read_schema(files[0])
    return {f.name: f.type for f in sch}


def type_drift(spark_types: dict, rel) -> list:
    """Guard 2: per-column class compare, declared types on both
    sides. Returns offending (column, spark_type, oracle_type)."""
    oracle_types = dict(zip(rel.columns, rel.types))
    bad = []
    for c in sorted(set(spark_types) & set(oracle_types)):
        sc, oc = type_class(spark_types[c]), type_class(oracle_types[c])
        if sc != oc and "other" not in (sc, oc):
            bad.append((c, str(spark_types[c]), str(oracle_types[c])))
    return bad


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


def lint_main(sf_dir: str, oracle_json: str):
    """Sweep every registered oracle's declared result types for
    HUGEINT/UHUGEINT (and that the SQL plans at all)."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_json))
    n_bad = 0
    for name in sorted(oracle):
        try:
            rel = con.sql(oracle[name])
        except Exception as e:
            print(f"LINT-FAIL(oracle-error)  {name}: {e}")
            n_bad += 1
            continue
        bad = oracle_type_lint(rel)
        if bad:
            n_bad += 1
            for c, t in bad:
                print(f"LINT-FAIL(HUGEINT)  {name}: column {c} is {t} "
                      f"— CAST the aggregate to BIGINT in the oracle SQL")
    print(f"\nlint: {len(oracle)} oracles, {n_bad} with type violations")
    sys.exit(1 if n_bad else 0)


def main():
    if sys.argv[1] == "--lint":
        lint_main(sys.argv[2], sys.argv[3])
        return
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
            rel = con.sql(oracle[name])
        except Exception as e:
            print(f"FAIL(oracle-error)  {name}: {e}")
            n_fail += 1
            continue
        # type lints BEFORE the value compare: values can be equal
        # here while the driver's exact hash diverges on rendering.
        hug = oracle_type_lint(rel)
        if hug:
            print(f"FAIL(HUGEINT)  {name}: {hug} — CAST to BIGINT in "
                  f"the oracle SQL (driver hashes HUGEINT as float)")
            n_fail += 1
            continue
        drift = type_drift(spark_schema(f"{out_dir}/{name}"), rel)
        if drift:
            print(f"FAIL(TYPE-DRIFT)  {name}: {drift} — spark/oracle "
                  f"declared type classes differ, driver hash will "
                  f"mismatch even on equal values")
            n_fail += 1
            continue
        duck_df = canon(rel.df())
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
