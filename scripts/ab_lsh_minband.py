"""Interleaved in-session A/B of the uncapped minimal-agreeing-band
candidate emission (round-14 verdict item 1): alternates
``dedup._LSH_MINBAND`` True/False per rep inside ONE JVM, timing the
named bench queries through the noop sink with clearCache between runs —
same session, same codegen cache, so the only difference is the plan
form. Canary-bracketed.

Usage:
  SPARK_GRAFT_SF_DIR=... python scripts/ab_lsh_minband.py [reps] [query ...]
Defaults: 5 reps, minhash_lsh_dedup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import sdlt_spark.operators.dedup as _dedup  # noqa: E402
import sdlt_spark.queries as Q  # noqa: E402
from sdlt_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    queries = sys.argv[2:] or ["minhash_lsh_dedup"]
    spark = get_spark("sdlt_ab_minband")
    registry = Q.registry()
    try:
        registry["count_all"][0](spark, SF_DIR).collect()
    except Exception:
        registry["dedup_exact"][0](spark, SF_DIR).limit(1).collect()

    def canary() -> float:
        t0 = time.time()
        spark.range(200_000_000, numPartitions=32).agg(F.sum("id")).collect()
        return round(time.time() - t0, 3)

    c0 = min(canary() for _ in range(3))
    results: dict[str, dict[str, list[float]]] = {
        q: {"minband": [], "distinct": []} for q in queries
    }
    for rep in range(reps):
        # alternate side order per rep so a monotone host-speed drift
        # cannot systematically favor one side
        sides = ((True, "minband"), (False, "distinct"))
        for flag, label in (sides if rep % 2 == 0 else sides[::-1]):
            _dedup._LSH_MINBAND = flag
            for q in queries:
                if q == "minhash_lsh_dedup_incremental":
                    Q._MINHASH_INCREMENTAL.clear()
                spark.sparkContext.setJobDescription(f"ab {label} rep{rep} {q}")
                t0 = time.time()
                registry[q][0](spark, SF_DIR).write.mode("overwrite").format(
                    "noop"
                ).save()
                results[q][label].append(round(time.time() - t0, 3))
                spark.catalog.clearCache()
    c1 = min(canary() for _ in range(3))
    print(json.dumps({"canary_before": c0, "canary_after": c1,
                      "reps": reps, "results": results}))


if __name__ == "__main__":
    main()
