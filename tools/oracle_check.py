"""Local stand-in for the driver's DuckDB differential oracle.

Runs every registered query's PySpark program AND its DuckDB oracle SQL on
the same parquet directory, then compares row count, column names, and the
full (order-insensitive) set of values — STRICTER than the driver's hash
(exact equality, no float tolerance), so anything green here hash-matches.

Usage:
    python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from uk_procurement_data_pipeline_spark.catalog import TABLES
from uk_procurement_data_pipeline_spark.queries import registry
from uk_procurement_data_pipeline_spark.session import get_spark


def _canon_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — we demand bit-identical doubles
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return repr(v)


def canon_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def check_one(spark, con, spec, sf_dir: str) -> tuple[bool, str, float]:
    t0 = time.time()
    sdf = spec.fn(spark, sf_dir).toPandas()
    spark_s = time.time() - t0
    if spec.oracle is None:
        return True, f"rows-only ({len(sdf)} rows)", spark_s
    odf = con.sql(spec.oracle).df()
    if sorted(sdf.columns) != sorted(odf.columns):
        return False, f"SCHEMA spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}", spark_s
    if len(sdf) != len(odf):
        return False, f"ROWCOUNT spark={len(sdf)} oracle={len(odf)}", spark_s
    s_rows, o_rows = canon_rows(sdf), canon_rows(odf)
    if s_rows != o_rows:
        diffs = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:3]
        return False, f"VALUES {len(diffs)}+ diffs, first: {diffs}", spark_s
    return True, f"match ({len(sdf)} rows)", spark_s


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    names = []
    reg = registry()
    for a in args:
        if Path(a).is_dir():
            sf_dir = a
        elif a in reg:
            names.append(a)
        else:
            print(f"unknown query or sf dir {a!r}; registered: {sorted(reg)}")
            return 2
    if names:
        reg = {n: reg[n] for n in names}
    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb_conn(sf_dir)
    failures = 0
    for name, spec in reg.items():
        try:
            ok, msg, secs = check_one(spark, con, spec, sf_dir)
        except Exception as e:  # noqa: BLE001
            ok, msg, secs = False, f"EXC {type(e).__name__}: {str(e)[:400]}", 0.0
        status = "OK  " if ok else "FAIL"
        print(f"{status} {name:38s} {secs:6.2f}s  {msg}")
        failures += 0 if ok else 1
    print(f"\n{len(reg) - failures}/{len(reg)} queries match on {sf_dir}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
