"""Incremental analytics on the vintage store — the round-4 surface as a
user would compose it:

    python examples/incremental_analytics.py [sf_dir]

1. clustered ingest: orders written with ``cluster_by`` so zone maps prune
   from the first commit; a ``read_where`` range read lists only matching
   files
2. mutations land (merge + delete) with the change feed on
3. a per-status revenue aggregate refreshes INCREMENTALLY — one seed scan,
   then CDC-delta folds, never a snapshot rescan
4. the same fold runs continuously from the ``vintage_cdc`` stream into a
   persistent state table (exactly-once across restarts via txn ids)
5. embedding side: the corpus quantized to int8 and searched with integer
   dot products

Every stage is DataFrame work; see SCALE.md for the 100 TB analysis.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sdlt_spark import VintageTable, get_spark, tables
from sdlt_spark.operators.incremental import incremental_agg, maintain_agg_stream
from sdlt_spark.operators.similarity import quantized_cosine_topk


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("incremental_analytics")
    base = tempfile.mkdtemp(prefix="sdlt_example_")

    # 1. clustered ingest + data-skipping read
    orders = tables.load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("o_totalprice")
    )
    t = VintageTable(spark, base + "/orders", change_feed=True)
    t.write(orders, cluster_by=["o_orderkey"], num_files=8)
    narrow = t.read_where("o_orderkey", 0, 500)
    print(
        f"read_where scanned {len(narrow.inputFiles())} of "
        f"{len(t.read().inputFiles())} files for a narrow key range"
    )

    # 2. mutations with the change feed on
    t.merge(
        orders.filter(F.col("o_orderkey") % 10 == 0).withColumn(
            "o_orderstatus", F.lit("U")
        ),
        ["o_orderkey"],
    )
    t.delete("o_orderstatus = 'F'")

    # 3. batch incremental refresh: seed once, fold CDC deltas
    agg = incremental_agg(t, ["o_orderstatus"], "o_totalprice")
    print("incrementally maintained per-status totals:")
    agg.show()

    # 4. continuous maintenance from the CDC stream
    from sdlt_spark.streaming.vintage_source import VintageChangeDataSource

    spark.dataSource.register(VintageChangeDataSource)
    q = maintain_agg_stream(
        spark, t.path, base + "/mv", ["o_orderstatus"], "o_totalprice"
    )
    q.processAllAvailable()
    t.update("o_orderstatus = 'P'", {"o_totalprice": F.lit(0.0)})
    q.processAllAvailable()
    q.stop()
    print("stream-maintained state after an in-flight update:")
    VintageTable(spark, base + "/mv").read().show()

    # 5. int8 quantized similarity search
    emb = tables.load(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    print("int8 quantized top-5 neighbours of vec 0:")
    quantized_cosine_topk(
        emb.filter(F.col("vec_id") != 0), "embedding", "vec_id", list(query), k=5
    ).show()

    spark.stop()


if __name__ == "__main__":
    main()
