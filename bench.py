"""Benchmark harness (driver contract): runs the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": ...}

Each query is materialized through the `noop` sink (full execution, zero
driver-collect cost) so the number measures the engine, not py4j transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sdlt_spark.session import get_spark  # noqa: E402
import sdlt_spark.queries as Q  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per operator family (scan+filter, Q1 agg, distinct agg,
# rollup, fact-dim join, window, as-of join, sort/topk, merge relational,
# vintage state op, dedup exact + minhash, text, similarity, events window).
BENCH_QUERIES = [
    "filter_range",
    "groupby_agg",
    "count_distinct",
    "rollup_agg",
    "join_inner",
    "join_left",
    "window_rank",
    "window_moving_avg",
    "asof_join",
    "top_k",
    "merge_upsert",
    "vintage_merge",
    "dedup_exact",
    "token_counts",
    "bpe_token_count",
    "text_quality",
    "winnow_fingerprint",
    "minhash_lsh_dedup",
    "simhash_neardup",
    "cosine_topk",
    "neardup_cosine",
    "neardup_cosine_lsh",
    "ann_lsh_topk",
    "events_tumbling_window",
    "sessionize_sql",
    "resample_ffill",
    "tpch_q1_shape",
    "tpch_q3_shape",
    "tpch_q5_shape",
    "tpch_q6_shape",
    "range_join",
    "ann_ivf_topk",
    "cube_agg",
    "percentile_agg",
    "stats_agg",
    "pii_redact",
    "boilerplate_dedup",
    "url_blocklist",
    "token_budget_sample",
]


def main() -> None:
    spark = get_spark("sdlt_bench")
    registry = Q.registry()

    # warm the JVM + parquet footers once with the cheapest query
    registry["count_all"][0](spark, SF_DIR).collect()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn, _sql = registry[name]
        t0 = time.time()
        fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.time() - t0, 3)
        # queries are independent; drop operator-internal persisted RDDs so
        # one query's cache pressure can't skew the next measurement
        spark.catalog.clearCache()

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "sdlt_spark headline suite wall time",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
