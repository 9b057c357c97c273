"""Search/retrieval stack on sdlt_spark — build-side and query-side, the way
a retrieval team would compose it:

    python examples/retrieval_pipeline.py [sf_dir]

build side (corpus -> indexes)
  -> inverted index: term -> document frequency + sorted postings
  -> BPE-style merge table (vocabulary induction over the corpus)
  -> persisted IVF index over embeddings (cell-clustered VintageTable)

query side
  -> BM25 lexical top-k for a term query
  -> ANN cosine top-k through the IVF index (probe only matching cells)
  -> entity resolution: link dirty name variants back to canonical rows

Every stage is a DataFrame transformation; the only driver traffic is
bounded scalars (BPE argmax pair, IVF training sample). See SCALE.md.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sdlt_spark import tables  # noqa: E402
from sdlt_spark.operators import similarity as sim  # noqa: E402
from sdlt_spark.operators.text import bpe_merge_table  # noqa: E402
from sdlt_spark.session import get_spark  # noqa: E402
import sdlt_spark.queries as Q  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("retrieval_pipeline")
    reg = Q.registry()

    print("== build: inverted index ==")
    inv = reg["inverted_index"][0](spark, SF_DIR)
    inv.orderBy(F.col("df").desc()).show(5, truncate=60)

    print("== build: BPE merge table (5 merges) ==")
    bpe_merge_table(tables.load(spark, SF_DIR, "documents"), num_merges=5).show(
        truncate=False
    )

    print("== build: persisted IVF index ==")
    emb = tables.load(spark, SF_DIR, "embeddings")
    idx_dir = tempfile.mkdtemp(prefix="retrieval_ivf_")
    index = sim.ivf_build(emb, "embedding", "vec_id", idx_dir, n_cells=8)

    print("== query: BM25 lexical top-10 for {join, filter, scan} ==")
    reg["bm25_topk"][0](spark, SF_DIR).show()

    print("== query: IVF ANN top-5 for vec_id=0's embedding ==")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    sim.ivf_search(
        spark, idx_dir, "embedding", "vec_id", list(qvec), k=5, nprobe=3
    ).show()

    print("== query: entity resolution (dirty part names -> canonical) ==")
    er = reg["entity_resolution"][0](spark, SF_DIR)
    truth = tables.load(spark, SF_DIR, "part").select(
        F.col("p_partkey").alias("right_id"), F.col("p_name").alias("true_name")
    )
    scored = er.join(truth, "right_id").persist()
    n = scored.count()
    # part names repeat across partkeys, so the honest metric is name
    # equality (min-id tiebreak may pick a different key with the SAME name)
    exact = scored.filter(F.col("cand_name") == F.col("true_name")).count()
    print(f"linked {n} dirty records; {exact} ({100.0 * exact / n:.1f}%) "
          "resolved to a row with the true name")
    scored.show(5, truncate=40)

    print("retrieval pipeline complete")


if __name__ == "__main__":
    main()
