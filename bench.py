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
    # round-8 additions: the heaviest round-7 LLM-pipeline operators, so
    # their perf trends are recorded from here on (47-query suite)
    "graph_pagerank",
    "exact_substring_dedup",
    "image_neardup_dhash",
    "html_extract_text",
    "dsir_weights",
    "ann_pq_topk",
    "bigram_logprob",
    "semantic_dedup",
    # round-9: the dhash-at-ingest amortization path (decode once, sweep
    # JVM-only) — recorded alongside image_neardup_dhash so the index's
    # advantage stays measured (48-query suite)
    "image_neardup_dhash_indexed",
    # round-10: the capped/composed dedup family (verdict item 7) plus the
    # scale-default wide-band dhash, so the 100 TB settings' costs are
    # tracked round-over-round, not just the uncapped classics
    # (53-query suite)
    "dedup_pipeline",
    "minhash_lsh_dedup_capped",
    "heavy_hitters",
    "weighted_sample",
    "image_neardup_dhash_wide",
    # round-10 (cont.): shard construction — the scalable global prefix
    # sum and the quota mixture draw (55-query suite). NOTE: through
    # BENCH_r10 the name "pack_sequences" was shadowed by the legacy
    # concat-then-chunk entry (now "pack_sequences_sharded"); r11 onward
    # the row measures the real two-level prefix-sum operator.
    "pack_sequences",
    "pack_sequences_sharded",
    "mixture_sample",
    # round-10 sf10 finding: hash-identical-first grouping is the only
    # banding shape that survives a mass-duplicate / concentrated-hash
    # corpus (57-query suite)
    "image_neardup_dhash_grouped",
    "simhash_neardup_grouped",
    # round-11: incremental IVF maintenance (append-workload fold+merge),
    # so regressions in the CDC fold / CoW merge path are tracked
    # round-over-round (verdict item 7)
    "ann_ivf_refresh",
    # round-13: incremental MinHash dedup against a persisted signature
    # index (verdict item 1) — the row measures the FULL lifecycle (corpus
    # write + index build incl. initial pairs + 2 CDC folds with probes),
    # like ann_ivf_refresh's lifecycle-composite row
    "minhash_lsh_dedup_incremental",
]


PASSES = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))

# Targeted re-measures (e.g. BASELINE.md drift investigations) can subset
# the suite without editing this file:
#   SPARK_GRAFT_BENCH_QUERIES=neardup_cosine,ann_lsh_topk python bench.py
if os.environ.get("SPARK_GRAFT_BENCH_QUERIES"):
    BENCH_QUERIES = [
        q.strip()
        for q in os.environ["SPARK_GRAFT_BENCH_QUERIES"].split(",")
        if q.strip()
    ]


def _timed(fn) -> float:
    t0 = time.time()
    fn()
    return round(time.time() - t0, 3)


def main() -> None:
    spark = get_spark("sdlt_bench")
    registry = Q.registry()

    # warm the JVM + parquet footers once with the cheapest query; partial
    # scale replicas (e.g. the documents+embeddings-only sf100 build) may
    # not carry lineitem, so fall back to a documents-based warmup
    try:
        registry["count_all"][0](spark, SF_DIR).collect()
    except Exception:
        registry["dedup_exact"][0](spark, SF_DIR).limit(1).collect()

    # Host-speed canary: a fixed, query-independent CPU workload (sum of
    # 200M longs across 32 tasks). Recorded alongside the suite so numbers
    # taken on different host-performance epochs can be normalized — this
    # box's effective CPU speed has been observed to shift 2-10x between
    # rounds/bursts (see BASELINE.md). Best of 3 for the same reason.
    from pyspark.sql import functions as _F

    canary = min(
        _timed(lambda: spark.range(200_000_000, numPartitions=32)
               .agg(_F.sum("id")).collect())
        for _ in range(3)
    )

    # Second anchor (round-13 verdict item 4): a fixed SMALL-QUERY
    # relational composite — one sequential pass of groupby_agg +
    # join_left + window_rank — run 3x, median taken. The spark.range
    # canary models raw CPU throughput, but sub-2s relational queries are
    # dominated by fixed overhead + scheduler weather the canary does not
    # see (the r11->r12 normalization whipsaw: identical code normalized
    # 78.3 vs 57.1 vs 37.9 across windows). Recording BOTH anchors lets
    # cross-round adjudication normalize each query class with the anchor
    # that models it: big scans/shuffles by canary ratio, small relational
    # rows by anchor ratio (BASELINE.md round-13 note).
    def _anchor_pass() -> float:
        t0 = time.time()
        for q in ("groupby_agg", "join_left", "window_rank"):
            registry[q][0](spark, SF_DIR).write.mode("overwrite").format(
                "noop"
            ).save()
        return time.time() - t0

    anchor = sorted(_anchor_pass() for _ in range(3))[1]
    ANCHOR_REF = float(os.environ.get("SPARK_GRAFT_ANCHOR_REF", "0"))

    # Per-query best of PASSES sequential suite runs (the methodology every
    # BASELINE.md number was recorded with: this host has documented
    # multi-minute external load bursts that inflate wall time 3-10x, and a
    # single pass can't distinguish engine cost from host weather; the
    # second pass also reuses Spark's compiled-codegen class cache, which
    # is how a long-lived cluster session runs these plans). Later passes
    # only re-run queries that measured above RERUN_FLOOR — sub-second
    # numbers are already at the fixed-overhead floor and re-running them
    # just risks tripping an external runner's overall timeout — and stop
    # entirely once the suite has spent BUDGET seconds.
    RERUN_FLOOR = float(os.environ.get("SPARK_GRAFT_BENCH_RERUN_FLOOR", "1.5"))
    BUDGET = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "480"))
    suite_t0 = time.time()
    timings: dict[str, float] = {}
    try:
        for p in range(PASSES):
            for name in BENCH_QUERIES:
                if p > 0 and (
                    timings.get(name, RERUN_FLOOR + 1) <= RERUN_FLOOR
                    or time.time() - suite_t0 > BUDGET
                ):
                    continue
                fn, _sql = registry[name]
                if name == "minhash_lsh_dedup_incremental":
                    # lifecycle composite: clear the per-session cache so
                    # every timed pass measures build + folds, not a
                    # cached checkpoint read
                    Q._MINHASH_INCREMENTAL.clear()
                if name == "ann_ivf_refresh":
                    # the entry caches its corpus/index per session; clear
                    # so every timed pass measures the full append-workload
                    # shape (corpus write + build + mutations + CDC fold +
                    # merge + probe), not a cached probe. The in-entry
                    # equality assert stays OFF here (r11 verdict item: it
                    # was ~16% of the suite headline and is pinned in
                    # tests/test_similarity.py) so the row measures the
                    # operator lifecycle, not the test.
                    Q._IVF_REFRESH.clear()
                    Q.ANN_REFRESH_VERIFY = False
                t0 = time.time()
                fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
                elapsed = round(time.time() - t0, 3)
                timings[name] = min(timings.get(name, elapsed), elapsed)
                # queries are independent; drop operator-internal persisted
                # RDDs so one query's cache pressure can't skew the next
                # measurement
                spark.catalog.clearCache()
    finally:
        # the verify flag is a module global scoped to the TIMED region
        # only — anything running in this process afterwards (correctness
        # checks, imported bench helpers) must see the default again
        Q.ANN_REFRESH_VERIFY = True

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    value = round(sum(timings.values()), 3)
    # Canary-normalized suite time: value scaled to the REFERENCE host
    # speed (CANARY_REF = the canary on the round-5 quiet window every
    # BASELINE.md number is comparable to). normalized = value *
    # (CANARY_REF / canary): a slower host (bigger canary) scales the
    # suite DOWN to what the reference host would have measured, so
    # cross-round comparisons stop needing hand analysis.
    CANARY_REF = float(os.environ.get("SPARK_GRAFT_CANARY_REF", "0.154"))
    print(
        json.dumps(
            {
                "metric": "sdlt_spark headline suite wall time",
                "value": value,
                "unit": "sec",
                "queries": timings,
                "canary_sec": canary,
                "canary_ref": CANARY_REF,
                "anchor_relational_sec": round(anchor, 3),
                **(
                    {"anchor_relational_ref": ANCHOR_REF}
                    if ANCHOR_REF
                    else {}
                ),
                "normalized_value": round(value * CANARY_REF / canary, 3)
                if canary > 0
                else value,
                "passes": PASSES,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
