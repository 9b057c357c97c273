"""Phase-level wall-time breakdown of the minhash_lsh_dedup_incremental
lifecycle (the round-13 bench row): corpus write -> index build -> merge ->
refresh x2 -> union. Prints one JSON line with per-phase seconds so the
optimization work targets the real cost, not a guess.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/profile_minhash_incremental.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sdlt_spark import tables  # noqa: E402
from sdlt_spark.operators import minhash_index as _mi  # noqa: E402
from sdlt_spark.session import get_spark  # noqa: E402
from sdlt_spark.store import VintageTable  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark("sdlt_profile_mh_inc")
    sc = spark.sparkContext
    docs = tables.load(spark, SF_DIR, "documents").select("doc_id", "text")
    docs.limit(1).collect()  # warm JVM + footers

    canary0 = None
    t0 = time.time()
    spark.range(200_000_000, numPartitions=32).agg(F.sum("id")).collect()
    canary0 = round(time.time() - t0, 3)

    phases: dict[str, float] = {}

    def timed(name, fn):
        sc.setJobDescription(f"mh_inc: {name}")
        t0 = time.time()
        out = fn()
        phases[name] = round(time.time() - t0, 3)
        sc.setJobDescription(None)
        return out

    root = tempfile.mkdtemp(prefix="sdlt_mh_inc_prof_")
    corpus = VintageTable(spark, root + "/corpus", change_feed=True)
    timed("corpus_write_60pct", lambda: corpus.write(docs.filter(F.col("doc_id") % 5 < 3)))
    idx = root + "/index"
    pairs0, rep0 = timed(
        "index_build", lambda: _mi.minhash_index_build(corpus, idx, "doc_id", "text", threshold=0.9)
    )
    timed("merge_batch1", lambda: corpus.merge(docs.filter(F.col("doc_id") % 5 == 3), ["doc_id"]))
    p1, _s1, r1 = timed("refresh1", lambda: _mi.minhash_refresh(corpus, idx))
    timed("merge_batch2", lambda: corpus.merge(docs.filter(F.col("doc_id") % 5 == 4), ["doc_id"]))
    p2, _s2, r2 = timed("refresh2", lambda: _mi.minhash_refresh(corpus, idx))
    out = timed(
        "union_checkpoint",
        lambda: pairs0.unionByName(p1).unionByName(p2).localCheckpoint(eager=True),
    )
    timed("noop_sink", lambda: out.write.mode("overwrite").format("noop").save())

    t0 = time.time()
    spark.range(200_000_000, numPartitions=32).agg(F.sum("id")).collect()
    canary1 = round(time.time() - t0, 3)

    print(
        json.dumps(
            {
                "phases": phases,
                "total": round(sum(phases.values()), 3),
                "canary_before": canary0,
                "canary_after": canary1,
                "reports": {"build": rep0, "r1": r1, "r2": r2},
            }
        )
    )


if __name__ == "__main__":
    main()
