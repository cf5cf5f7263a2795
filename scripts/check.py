#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only; NOT part
of the engine). Compares Verify's parquet dumps against DuckDB running the
oracle SQL on the same fixture tables.

Usage: python3 scripts/check.py [sfDir] [outDir]
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def cells_equal(a, b) -> bool:
    if hasattr(a, "__len__") and not isinstance(a, str):
        if not (hasattr(b, "__len__") and not isinstance(b, str)):
            return False
        if len(a) != len(b):
            return False
        return all(cells_equal(x, y) for x, y in zip(a, b))
    if pd.isna(a) and pd.isna(b):
        return True
    try:
        if pd.isna(a) != pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    import numpy as np
    import datetime
    if isinstance(a, (np.datetime64, pd.Timestamp, datetime.date)) or \
       isinstance(b, (np.datetime64, pd.Timestamp, datetime.date)):
        try:
            return pd.Timestamp(a) == pd.Timestamp(b)
        except (TypeError, ValueError):
            return False
    if isinstance(a, float) or isinstance(b, float):
        try:
            return float(a) == float(b)
        except (TypeError, ValueError):
            return False
    return str(a) == str(b)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    with open(f"{out}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_ok = n_bad = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            spark_df = norm(pd.read_parquet(f"{out}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: no spark result ({e})")
            n_bad += 1
            continue
        try:
            duck_df = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns {list(spark_df.columns)} != "
                  f"{list(duck_df.columns)}")
            n_bad += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} != {len(duck_df)}")
            n_bad += 1
            continue
        bad = None
        for ci, c in enumerate(spark_df.columns):
            sv, dv = spark_df[c].values, duck_df[c].values
            for ri in range(len(spark_df)):
                if not cells_equal(sv[ri], dv[ri]):
                    bad = (ri, c, sv[ri], dv[ri])
                    break
            if bad:
                break
        if bad:
            ri, c, a, b = bad
            print(f"FAIL {name}: row {ri} col {c}: spark={a!r} duck={b!r}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(spark_df)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
