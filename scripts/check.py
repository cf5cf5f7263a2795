#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only; NOT part
of the engine). Compares Verify's parquet dumps against DuckDB running the
oracle SQL on the same fixture tables.

STRICT by design: the driver hashes *serialized* cell values after a
pandas round-trip, so dtype drift that a tolerant comparator would forgive
(Spark Decimal('0.00') vs DuckDB float64 0.0; int64 99111 vs HUGEINT-
widened float64 99111.0) is a real driver failure. Round 1 shipped a
tolerant float(a)==float(b) comparator here and got falsified by the
driver — this version fails exactly where the driver fails:

  * numeric cells must be the SAME class (bool/int/float/Decimal) on both
    sides AND equal in serialized form;
  * gate outputs may not contain DecimalType, ArrayType, BinaryType, or
    other non-scalar cells at all (the driver's pandas sort crashes on
    list/bytearray cells and hashes Decimals differently);
  * timestamps are compared as instants (engines only differ in ns-vs-us
    storage unit, which the driver's serialization normalizes).

Usage: python3 scripts/check.py [sfDir] [outDir]
"""
import datetime
import decimal
import json
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def cell_class(v) -> str:
    """Driver-equivalent serialization class of one cell."""
    if isinstance(v, (bool, np.bool_)):
        return "bool"
    if isinstance(v, decimal.Decimal):
        return "decimal"
    if isinstance(v, (int, np.integer)):
        return "int"
    if isinstance(v, (float, np.floating)):
        return "float"
    if isinstance(v, (np.datetime64, pd.Timestamp, datetime.datetime,
                      datetime.date)):
        return "datetime"
    if isinstance(v, str):
        return "str"
    if isinstance(v, (bytes, bytearray, np.ndarray, list, tuple, dict)):
        return "nonscalar"
    return "other"


def forbidden_cell(v) -> str | None:
    """Types no gate query may output (driver harness crashes or
    hash-mismatches on them). Returns a reason or None."""
    if isinstance(v, decimal.Decimal):
        return "Decimal cell (serialize: cast to DOUBLE at the boundary)"
    if isinstance(v, (bytes, bytearray)):
        return "binary cell (serialize: hex(...) at the boundary)"
    if isinstance(v, (np.ndarray, list, tuple, dict)):
        return "list/struct cell (serialize: to_json/concat_ws at the boundary)"
    return None


def cells_equal(a, b) -> bool:
    try:
        a_na, b_na = bool(pd.isna(a)), bool(pd.isna(b))
    except (TypeError, ValueError):
        a_na = b_na = False
    if a_na or b_na:
        return a_na and b_na
    ca, cb = cell_class(a), cell_class(b)
    if ca != cb:
        return False  # dtype drift IS a driver hash failure
    if ca == "datetime":
        # engines store the same instant at different unit precision;
        # the driver serializes both to the same form
        try:
            return pd.Timestamp(a) == pd.Timestamp(b)
        except (TypeError, ValueError):
            return False
    if ca == "bool":
        return bool(a) == bool(b)
    if ca == "int":
        return int(a) == int(b)
    if ca == "float":
        return repr(float(a)) == repr(float(b))
    if ca == "decimal":
        return str(a) == str(b)  # scale included: 0.00 != 0.0
    return str(a) == str(b)


def scan_forbidden(df: pd.DataFrame) -> str | None:
    """First forbidden cell in the frame (column dtypes that the driver's
    pandas harness cannot sort/hash)."""
    for c in df.columns:
        col = df[c]
        if col.dtype != object and not str(col.dtype).startswith("datetime"):
            continue
        for v in col.values:
            try:
                if pd.isna(v):
                    continue
            except (TypeError, ValueError):
                pass
            reason = forbidden_cell(v)
            if reason:
                return f"col {c}: {reason}"
            break  # parquet columns are homogeneous; first cell decides
    return None


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
    # every dumped result — including rows-only queries with no oracle —
    # goes through the driver's pandas sort, so ALL are type-scanned
    import os
    dumped = sorted(d for d in os.listdir(out)
                    if os.path.isdir(os.path.join(out, d)))
    for name in dumped:
        if name in oracle:
            continue  # scanned below, before the compare
        try:
            df = norm(pd.read_parquet(f"{out}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: unreadable rows-only result ({e})")
            n_bad += 1
            continue
        bad_type = scan_forbidden(df)
        if bad_type:
            print(f"FAIL {name}: forbidden output type: {bad_type}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(df)} rows, rows-only)")
            n_ok += 1
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            spark_df = norm(pd.read_parquet(f"{out}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: no spark result ({e})")
            n_bad += 1
            continue
        bad_type = scan_forbidden(spark_df)
        if bad_type:
            print(f"FAIL {name}: forbidden output type: {bad_type}")
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
