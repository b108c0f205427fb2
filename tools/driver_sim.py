"""Simulate the round driver against __spark_entry__ (see
.claude/skills/verify/SKILL.md). Run from anywhere:

    python /root/repo/tools/driver_sim.py [sf_dir]

Creates a PLAIN SparkSession (no engine confs — probes runtime
self-configuration), runs entry() and every queries() entry, and
compares oracle-backed ones against DuckDB. Exit 0 iff all match.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as e
    from oracle_harness import compare, duckdb_connection

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    n = len(e.entry(spark).collect())
    print(f"entry() -> {n} rows")
    assert n > 0

    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb_connection(sf)
    fails = []
    for name in sorted(qs):
        df = qs[name](spark, sf)
        if name in oracles:
            problems = compare(df, con, oracles[name])
            status = "OK  " if not problems else "FAIL"
            if problems:
                fails.append((name, problems))
            print(f"{status} {name}")
        else:
            rows = df.limit(10000).collect()
            print(f"ROWS {name} ({len(rows)} rows)")
    print(f"elapsed {time.time()-t0:.1f}s  queries={len(qs)} oracles={len(oracles)}")
    for name, problems in fails:
        print(f"FAIL {name}: {problems}")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
