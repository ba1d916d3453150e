#!/usr/bin/env python3
"""Local pre-validation: mirror the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
compares each <outDir>/<name> parquet result against the DuckDB result
of <outDir>/oracle_sql.json's SQL over the same sf tables.

Dev tool only — the shipped Scala library has no Python dependency.
"""
import json, sys, math
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize dtypes: timestamps -> iso strings, floats rounded
    out = {}
    for c in df.columns:
        s = df[c]
        if str(s.dtype).startswith("datetime"):
            s = s.astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            s = s.astype(str)
        out[c] = s
    df = pd.DataFrame(out)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def dtype_family(dtype) -> str:
    s = str(dtype)
    if s.startswith("datetime"):
        return "datetime"
    if s.startswith(("int", "uint", "Int", "UInt")):
        return "int"
    if s.startswith(("float", "Float")):
        return "float"
    if s == "bool":
        return "bool"
    return "object"

def compare(name, spark_df, duck_df, tol=1e-9):
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        return f"SCHEMA mismatch: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"
    if len(spark_df) != len(duck_df):
        return f"ROWS mismatch: spark={len(spark_df)} duck={len(duck_df)}"
    # The driver's gate hashes the SERIALIZED values, so an int64 Spark
    # column vs a HUGEINT->float64 oracle column fails there even when
    # every value matches numerically ("99111" vs "99111.0"). Mirror
    # that strictness for the int/float axis. (Date columns arrive as
    # pandas `object`-of-date from Spark parquet but `datetime64` from
    # DuckDB and serialize identically at the driver — don't flag those.)
    for c in spark_df.columns:
        fa, fb = dtype_family(spark_df[c].dtype), dtype_family(duck_df[c].dtype)
        if {fa, fb} == {"int", "float"}:
            return (f"DTYPE mismatch col={c}: spark={spark_df[c].dtype} ({fa}) "
                    f"duck={duck_df[c].dtype} ({fb}) — driver hash would differ")
    a, b = canon(spark_df), canon(duck_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            af = pd.to_numeric(av, errors="raise")
            bf = pd.to_numeric(bv, errors="raise")
            bad = ~((af.isna() & bf.isna()) | (abs(af - bf) <= tol + 1e-6 * abs(bf).fillna(0)))
            if bad.any():
                i = bad.idxmax()
                return f"VALUE mismatch col={c} row={i}: spark={af[i]} duck={bf[i]} ({int(bad.sum())} rows)"
        except (ValueError, TypeError):
            bad = av.astype(str) != bv.astype(str)
            if bad.any():
                i = bad.idxmax()
                return f"VALUE mismatch col={c} row={i}: spark={av[i]!r} duck={bv[i]!r} ({int(bad.sum())} rows)"
    return None

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    tables = ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark result ({e})"); n_bad += 1; continue
        try:
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_bad += 1; continue
        err = compare(name, spark_df, duck_df)
        if err:
            print(f"FAIL {name}: {err}"); n_bad += 1
        else:
            print(f"OK   {name} ({len(spark_df)} rows)"); n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
