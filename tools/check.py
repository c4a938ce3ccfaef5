#!/usr/bin/env python3
"""Local pre-check of the driver's t2 gate (dev tool only — the shipped
engine is pure Scala/Spark; this mirrors the driver-side DuckDB compare so
oracle drift is caught before a round ends).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [-x q_a,q_b] [query ...]

-x excludes queries (e.g. the O(n²)/recursive dedup oracles that dominate
the sf0.1 full-tier sweep) so they can run separately in the background.

Mimics the driver: for each query in <verifyOutDir>/oracle_sql.json, runs the
SQL in DuckDB with views over <sfDir>/*.parquet, loads the Spark parquet
result, sorts columns by name, and compares values exactly (row order
preserved). Reports schema/row/value mismatches per query.
"""
import json
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            if getattr(df[c].dtype, "tz", None) is not None:
                # tz-aware vs naive is a REAL schema divergence the driver may
                # reject; normalize for value compare but surface it loudly.
                print(f"  [warn] tz-aware column {c} — Spark side should emit TIMESTAMP_NTZ")
                df[c] = df[c].dt.tz_localize(None)
            df[c] = df[c].astype("datetime64[us]")
        # downcast pandas nullable ints from outer-join nulls comparisons
    # Mirror the driver: rows are sorted over ALL columns before comparing.
    # This is deliberately NOT wrapped in try/except — an array column makes
    # sort_values raise (unhashable ndarray), which is exactly how the driver
    # rejects such a query; it must FAIL here too (caught per-query in main).
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def values_equal(a, b) -> bool:
    if isinstance(a, (list, np.ndarray)) or isinstance(b, (list, np.ndarray)):
        a = list(a) if a is not None and not (isinstance(a, float) and pd.isna(a)) else None
        b = list(b) if b is not None and not (isinstance(b, float) and pd.isna(b)) else None
        if a is None or b is None:
            return a is None and b is None
        return len(a) == len(b) and all(values_equal(x, y) for x, y in zip(a, b))
    na_a = pd.isna(a)
    na_b = pd.isna(b)
    if na_a or na_b:
        return bool(na_a) and bool(na_b)
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    skip = set()
    only = set()
    # flags are recognized anywhere in the tail; unknown flags are an error
    # (previously "-x" after a query name was silently treated as a query
    # name and filtered everything to nothing)
    i = 0
    while i < len(rest):
        tok = rest[i]
        if tok == "-x":
            if i + 1 >= len(rest):
                sys.exit("error: -x requires a comma-separated query list")
            skip.update(rest[i + 1].split(","))
            i += 2
        elif tok.startswith("-"):
            sys.exit(f"error: unknown flag {tok!r}")
        else:
            only.add(tok)
            i += 1
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if (only and name not in only) or name in skip:
            continue
        try:
            spark_df = normalize(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark load/sort failed ({e})")
            n_fail += 1
            continue
        try:
            duck_df = normalize(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
            n_fail += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
            n_fail += 1
            continue
        bad = None
        for c in spark_df.columns:
            sv, dv = spark_df[c].values, duck_df[c].values
            try:
                eq = (pd.Series(sv) == pd.Series(dv)) | (pd.Series(sv).isna() & pd.Series(dv).isna())
                ok = bool(eq.all())
            except Exception:
                ok = all(values_equal(x, y) for x, y in zip(sv, dv))
            if not ok:
                idx = next(i for i in range(len(sv)) if not values_equal(sv[i], dv[i]))
                bad = (c, idx, sv[idx], dv[idx])
                break
        # dtype drift report (informational — driver may be stricter)
        dt = [(c, str(spark_df[c].dtype), str(duck_df[c].dtype))
              for c in spark_df.columns if str(spark_df[c].dtype) != str(duck_df[c].dtype)]
        if bad:
            c, i, s, dd = bad
            print(f"FAIL {name}: col={c} row={i} spark={s!r} duck={dd!r}")
            n_fail += 1
        else:
            note = f"  [dtype drift: {dt}]" if dt else ""
            print(f"PASS {name} ({len(spark_df)} rows){note}")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
