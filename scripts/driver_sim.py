#!/usr/bin/env python
"""Simulate the driver's verify harness with a DELIBERATELY untuned
SparkSession (default confs, non-UTC timezone) to prove the
__spark_entry__ contract holds outside our own session factory.

Usage: python scripts/driver_sim.py [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def canon(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.6f}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.sql.session.timeZone", "America/New_York")  # hostile TZ
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    n = e.entry(spark).count()
    print(f"entry: {n} rows", flush=True)
    assert n > 0

    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    from nidaba_spark.sources.tables import TABLES

    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    bad = []
    for name in sorted(qs):
        try:
            sdf = qs[name](spark, SF)
            srows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                print(f"  {name}: rows-only ok ({len(srows)} rows)", flush=True)
                continue
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            ok = rowset(sdf.columns, srows) == rowset(dcols, drows)
            print(f"  {name}: {'MATCH' if ok else 'MISMATCH'} ({len(srows)} rows)", flush=True)
            if not ok:
                bad.append(name)
        except Exception as ex:  # noqa: BLE001
            print(f"  {name}: ERROR {type(ex).__name__}: {ex}", flush=True)
            bad.append(name)
    print("FAILURES:", bad)
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
