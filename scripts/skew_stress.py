"""Adversarial-skew stress run for the dedup family (round-9 verdict
item 7): prove the hot-bucket caps hold under the exact failure mode they
target — a mass-duplicate cluster and a hot shingle planted by
``make_scale_replica.py --adversarial``.

For each operator it reports wall seconds, the CANDIDATE volume the cap
admitted (the quantity that goes quadratic without it), and the surviving
pair count. Run against both the plain and the adversarial replica to see
that (a) the adversarial corpus stays tractable at all, and (b) wall time
stays within a small factor of the clean corpus despite +100k clones.

Usage:
  python scripts/make_scale_replica.py /tmp/sdlt_sf1_adv 10 --adversarial
  python scripts/skew_stress.py /tmp/sdlt_sf1_adv
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main(sf_dir: str) -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.driver.memory", os.environ.get("SDLT_SIM_DRIVER_MEM", "8g"))
        .appName("skew-stress")
        .getOrCreate()
    )
    from sdlt_spark import tables
    from sdlt_spark.operators import dedup

    docs = tables.load(spark, sf_dir, "documents")
    n_docs = docs.count()
    results: dict[str, dict] = {"n_docs": n_docs}

    def timed(name, fn):
        spark.catalog.clearCache()
        t0 = time.time()
        out = fn()
        wall = round(time.time() - t0, 2)
        results[name] = {"wall_s": wall, **out}
        print(name, json.dumps(results[name]), flush=True)

    CAP = 64

    # candidate volume the cap admits (the uncapped twin would be ~5e9
    # pairs from the clone bucket alone — deliberately not run)
    def lsh_candidates():
        th = dedup.token_hashes(docs, "doc_id")
        sig = dedup._signatures_from_hashes(th, "doc_id", 32)
        n = dedup.lsh_candidate_pairs(
            sig, "doc_id", bands=4, rows_per_band=8, max_bucket_size=CAP
        ).count()
        return {"candidates": n}

    timed("lsh_candidates_capped", lsh_candidates)

    def pipeline():
        pairs = dedup.exact_then_minhash_pairs(
            docs, "doc_id", threshold=0.9, estimate_prefilter=False,
            max_bucket_size=CAP,
        )
        n_pairs = pairs.count()
        clusters = dedup.dedup_clusters(pairs, docs.select("doc_id"), "doc_id")
        biggest = (
            clusters.groupBy("cluster").count().agg(F.max("count")).head()[0]
        )
        return {"edges": n_pairs, "largest_cluster": int(biggest)}

    timed("dedup_pipeline_exact_first", pipeline)

    def simhash():
        n = dedup.simhash_neardup(
            docs, "doc_id", max_hamming=3, max_bucket_size=CAP
        ).count()
        return {"pairs": n}

    timed("simhash_capped", simhash)

    def ngram():
        n = dedup.ngram_jaccard_pairs(
            docs, "doc_id", n=3, threshold=0.5, max_doc_frequency=1000
        ).count()
        return {"pairs": n}

    timed("ngram_df_capped", ngram)

    # round-12 (round-11 verdict item 5): the OUTPUT-level guard, one level
    # above the candidate caps. At a loose threshold the correlated corpus's
    # true edge volume explodes (sf10 measured ~58M edges at hamming<=10);
    # with a budget the sweep must ABORT from the bucket-statistics estimate
    # in seconds — before the candidate join is submitted — instead of
    # spending the wall time to emit them.
    def budget_abort():
        t0 = time.time()
        try:
            dedup.simhash_neardup(
                docs, "doc_id", max_hamming=10, max_pairs=1_000_000
            ).count()
            return {"aborted": False}
        except dedup.PairBudgetExceeded as exc:
            return {
                "aborted": True,
                "abort_s": round(time.time() - t0, 2),
                "msg": str(exc)[:120],
            }

    timed("simhash_loose_pair_budget", budget_abort)

    print(json.dumps(results))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sdlt_sf1_adv")
