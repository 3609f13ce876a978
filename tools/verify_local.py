#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: read each query result
parquet produced by `graft.Verify`, run the matching oracle SQL in DuckDB over
the same testdata parquet tables, and compare (schema, row count, values).

Usage: python3 tools/verify_local.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_df = canon(con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df())
            oracle_df = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        problems = []
        if list(spark_df.columns) != list(oracle_df.columns):
            problems.append(
                f"columns spark={list(spark_df.columns)} oracle={list(oracle_df.columns)}")
        elif len(spark_df) != len(oracle_df):
            problems.append(f"rows spark={len(spark_df)} oracle={len(oracle_df)}")
        else:
            for c in spark_df.columns:
                sv, ov = spark_df[c].tolist(), oracle_df[c].tolist()
                bad = [i for i in range(len(sv)) if not values_equal(sv[i], ov[i])]
                if bad:
                    i = bad[0]
                    problems.append(
                        f"col {c}: {len(bad)} diffs, first@{i}: "
                        f"spark={sv[i]!r} oracle={ov[i]!r}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
