"""Simulate the driver's verify pass against __spark_entry__.py.

Builds a *plain* SparkSession (no sdlt_spark tuning — the driver won't have
it), runs entry(), then every queries() entry at sf0.01 and compares against
oracle_sql() via DuckDB exactly like the driver's t2 gate. Exit 0 = all green.

Usage: python scripts/driver_sim.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as e  # noqa: E402
from tests.oracle_harness import compare  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> int:
    builder = (
        SparkSession.builder.master("local[32]")
        .appName("driver_sim")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
    )
    # Default stays a faithful plain session (1g heap, like the driver's
    # sf0.01 gate). The 10x pre-check (sf0.1) needs more heap for the
    # iterative dedup pipeline under 32 task threads: opt in with e.g.
    # SDLT_SIM_DRIVER_MEM=4g.
    mem = os.environ.get("SDLT_SIM_DRIVER_MEM")
    if mem:
        builder = builder.config("spark.driver.memory", mem)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    rows = e.entry(spark).collect()
    print(f"entry(): {len(rows)} rows in {time.time() - t0:.1f}s; first={rows[0]}")
    assert len(rows) > 0

    qs = e.queries()
    oracles = e.oracle_sql()
    failed: list[str] = []
    for name, fn in sorted(qs.items()):
        t0 = time.time()
        if name in oracles:
            problems = compare(spark, SF_DIR, name, fn, oracles[name])
            status = "OK " if not problems else "FAIL"
            if problems:
                failed.extend(problems)
        else:
            n = fn(spark, SF_DIR).count()
            status = f"OK (rows-only, {n} rows)" if n >= 0 else "FAIL"
        print(f"  {status} {name} ({time.time() - t0:.1f}s)")
    if failed:
        print("\nFAILURES:")
        for p in failed:
            print("  " + p)
        return 1
    print(f"\nall {len(qs)} queries green ({len(oracles)} oracle-checked)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
