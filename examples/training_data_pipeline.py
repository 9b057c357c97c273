"""End-to-end LLM training-data curation pipeline on sdlt_spark — the
north-star extension surface, composed the way a data team would run it:

    python examples/training_data_pipeline.py [sf_dir]

raw documents
  -> language ID + quality scoring (JVM expressions, pure map)
  -> quality gate
  -> exact dedup (md5 fingerprint groupBy)
  -> near-dup dedup (MinHash -> LSH banding -> exact-Jaccard verify
     -> connected components -> keep cluster canonical)
  -> BPE-ish token accounting
  -> versioned publish into a VintageTable (reproducible snapshots:
     time-travel any past curation run)

plus an embedding-side pass: IVF cell assignment for ANN serving and
exact near-dup pairs above a cosine threshold.

Every stage is a DataFrame transformation — no collect() on row data;
see SCALE.md for the 100 TB analysis per operator family.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from sdlt_spark import VintageTable, get_spark, tables
from sdlt_spark.operators import dedup, similarity, text


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("training_data_pipeline")

    docs = tables.load(spark, sf_dir, "documents")
    n_raw = docs.count()
    print(f"raw documents:            {n_raw}")

    # 1. language ID + quality scoring, then gate
    scored = text.quality_score(text.language_scores(docs))
    gated = scored.filter((F.col("quality") >= 0.7) & F.col("pred_lang").isNotNull())
    n_gated = gated.count()
    print(f"after quality gate:       {n_gated}")

    # 2. exact dedup on normalized-text fingerprint
    survivors = text.fingerprint(gated).withColumn(
        "__keep",
        F.row_number().over(Window.partitionBy("fp").orderBy("doc_id")) == 1,
    )
    # several downstream actions reuse this frame — persist so the scan +
    # scoring + window chain runs once, not per action
    exact_kept = survivors.filter("__keep").drop("__keep", "fp").persist()
    n_exact = exact_kept.count()
    print(f"after exact dedup:        {n_exact}")

    # 3. near-dup dedup: pairs -> clusters -> canonical representative
    pairs = dedup.minhash_dedup(exact_kept, "doc_id", threshold=0.9)
    clusters = dedup.dedup_clusters(pairs, exact_kept.select("doc_id"), "doc_id")
    canonical = exact_kept.join(
        clusters.filter(F.col("doc_id") == F.col("cluster")).select("doc_id"),
        "doc_id",
        "left_semi",
    ).persist()
    n_canon = canonical.count()
    print(f"after near-dup dedup:     {n_canon}")

    # 4. token accounting (budgeting the training mix)
    budget = text.bpe_token_count(canonical).agg(
        F.sum("n_bpe_tokens").alias("total_bpe_tokens"),
        F.avg("n_bpe_tokens").alias("avg_bpe_tokens"),
    )
    row = budget.head()
    print(
        f"token budget:             {row['total_bpe_tokens']} BPE tokens "
        f"({row['avg_bpe_tokens']:.1f}/doc)"
    )

    # 4b. repetition gate (Gopher-style boilerplate/spam signals)
    rep = text.repetition_stats(canonical)
    clean = canonical.join(
        rep.filter(
            (F.col("dup_token_frac") <= 0.95) & (F.col("top_bigram_frac") <= 0.5)
        ).select("doc_id"),
        "doc_id",
        "left_semi",
    )

    # 4c. decontamination + mixture + packing manifests (see queries.py:
    # contamination_check / mixture_weights / pack_sequences for the
    # oracle-checked formulations of these stages)
    from sdlt_spark.operators.sampling import deterministic_split

    splits = deterministic_split(clean, "doc_id")
    per_split = splits.groupBy("split").count().orderBy("split")
    print(f"split sizes:              {[tuple(r) for r in per_split.collect()]}")

    # 5. versioned publish — curation runs become reproducible snapshots,
    # with a CHECK constraint guarding the quality gate at the storage layer
    out_dir = tempfile.mkdtemp() + "/curated_docs"
    table = VintageTable(spark, out_dir)
    table.write(clean.select("doc_id", "text", "lang", "quality"))
    table.add_constraint("quality_floor", "quality >= 0.7")
    print(
        f"published v{table.latest_version()} -> {out_dir} "
        f"(constraints: {table.constraints()})"
    )

    # 6. embedding side: IVF cells for ANN serving + exact near-dup pairs
    emb = tables.load(spark, sf_dir, "embeddings")
    cents = similarity.train_ivf_centroids(emb, "embedding", n_cells=16, sample_rows=2048, seed=42)
    celled = similarity.ivf_assign(emb, "embedding", cents)
    sizes = celled.groupBy("__cell").count().orderBy("__cell")
    print(f"IVF cells (for partitioned ANN serving): {sizes.count()} cells")
    near = similarity.neardup_cosine_pairs(emb, "embedding", "vec_id", threshold=0.9)
    print(f"embedding near-dup pairs (cos >= 0.9): {near.count()}")

    spark.stop()


if __name__ == "__main__":
    main()
