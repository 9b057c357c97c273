"""Refresh-vs-rebuild scale probe for the persisted MinHash signature
index (round-13, verdict item 1's "Done" evidence) — the minhash twin of
SCALE.md's round-10 ivf_refresh table.

Shape: write all but ``batch`` documents of ``$SPARK_GRAFT_SF_DIR`` as a
CDC-enabled corpus VintageTable, build the signature index (timed), merge
the held-out FIXED-SIZE batch, and time ``minhash_refresh`` against the
alternative a daily pipeline would otherwise run — the classic
from-scratch ``minhash_lsh_dedup`` over the full corpus. With the batch
held CONSTANT across scale points, O(batch)-dominated refresh cost stays
near-flat while the from-scratch cost grows with the corpus — the
exponent separation SCALE.md records.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
        python scripts/minhash_refresh_scale.py [batch_size] [workdir]
    SPARK_GRAFT_SF_DIR=/tmp/sdlt_sf1 SDLT_DRIVER_MEM=16g \
        python scripts/minhash_refresh_scale.py 500

Prints one JSON line: corpus size, batch size, canary bracket, and wall
seconds for build / refresh / classic full run / emitted refresh pairs.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sdlt_spark import tables  # noqa: E402
from sdlt_spark.operators import minhash_index as mi  # noqa: E402
from sdlt_spark.operators.dedup import minhash_dedup  # noqa: E402
from sdlt_spark.session import get_spark  # noqa: E402
from sdlt_spark.store import VintageTable  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _timed(fn):
    t0 = time.time()
    out = fn()
    return round(time.time() - t0, 3), out


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    workdir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="sdlt_mh_scale_"
    )
    spark = get_spark("sdlt_minhash_refresh_scale")
    docs = tables.load(spark, SF_DIR, "documents").select("doc_id", "text")
    n_docs = docs.count()
    canary = min(
        _timed(
            lambda: spark.range(200_000_000, numPartitions=32)
            .agg(F.sum("id"))
            .collect()
        )[0]
        for _ in range(3)
    )
    # hold out a FIXED-size batch: the highest doc_ids (stable, replica-safe)
    cut = (
        docs.select(F.col("doc_id")).orderBy(F.col("doc_id").desc())
        .limit(batch).agg(F.min("doc_id")).head()[0]
    )
    corpus = VintageTable(spark, os.path.join(workdir, "corpus"), change_feed=True)
    corpus.write(docs.filter(F.col("doc_id") < cut))
    idx = os.path.join(workdir, "index")

    build_sec, (_pairs0, rep0) = _timed(
        lambda: mi.minhash_index_build(
            corpus, idx, "doc_id", "text", threshold=0.9
        )
    )
    corpus.merge(docs.filter(F.col("doc_id") >= cut), ["doc_id"])
    refresh_sec, (p1, _s1, rep1) = _timed(lambda: mi.minhash_refresh(corpus, idx))
    n_new_pairs = p1.count()
    spark.catalog.clearCache()
    classic_sec, _ = _timed(
        lambda: minhash_dedup(
            corpus.read(), "doc_id", threshold=0.9, estimate_prefilter=False
        ).write.mode("overwrite").format("noop").save()
    )
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "n_docs": n_docs,
                "batch": batch,
                "canary_sec": canary,
                "build_sec": build_sec,
                "indexed_docs": rep0["indexed_docs"],
                "refresh_sec": refresh_sec,
                "refresh_upserts": rep1["upserts"],
                "refresh_new_pairs": n_new_pairs,
                "classic_full_sec": classic_sec,
                "refresh_vs_classic": round(classic_sec / max(refresh_sec, 1e-9), 2),
            }
        ),
        flush=True,
    )
    if len(sys.argv) <= 2:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
