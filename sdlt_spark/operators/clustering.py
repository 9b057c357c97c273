"""Distributed k-means clustering over embedding columns.

The reference has no clustering surface (its data is 3 fixed currency
series, /root/reference/README.md:64); this is a north-star extension for
corpus curation — cluster embeddings to stratify, balance, or dedup a
training corpus by semantic neighborhood.

Scale design (the Spark MLlib KMeans shape, re-expressed on DataFrames):

- **Assignment is executor-side**: one Arrow-batched numpy GEMM per batch
  (`argmin ||x - c||²` over k centroids) — the corpus never moves to the
  driver and never shuffles for assignment (map-only stage).
- **The update step is a partial aggregation**: per-(cluster, dim) sums via
  `posexplode` + groupBy — the shuffle carries k*dim partial rows per task,
  independent of corpus size.
- **Driver traffic is bounded at k*dim scalars per iteration** (the new
  centroid matrix), exactly like MLlib's `collect()` of centroid updates —
  NOT a data collect; this is what makes k-means on 100 TB feasible.
- Initialization is deterministic: the k rows with the smallest seeded
  md5(id) — a seeded shuffle-free sample (k-means++ would need k sequential
  passes; seeded-hash init plus a few Lloyd iterations is the standard
  large-scale tradeoff, cf. k-means|| motivation).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _assign_udf(centroids: np.ndarray):
    """Arrow-batched nearest-centroid (squared-L2 argmin) — one GEMM per
    batch via ||x-c||² = ||x||² - 2x·c + ||c||² expansion."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cents = np.asarray(centroids, dtype=np.float64)
    c_sq = (cents * cents).sum(axis=1)

    @pandas_udf("struct<cluster:int,dist:double>")
    def _assign(col):
        if not len(col):
            return pd.DataFrame({"cluster": pd.array([], dtype="Int32"),
                                 "dist": pd.array([], dtype="float64")})
        x = np.stack([np.asarray(v, dtype=np.float64) for v in col])
        d = (x * x).sum(axis=1, keepdims=True) - 2.0 * (x @ cents.T) + c_sq
        cl = np.argmin(d, axis=1)
        best = np.sqrt(np.maximum(d[np.arange(len(x)), cl], 0.0))
        return pd.DataFrame(
            {"cluster": cl.astype(np.int32), "dist": best}
        )

    return _assign


def init_centroids(
    df: DataFrame, vec_col: str, id_col: str, k: int, seed: int = 42
) -> np.ndarray:
    """Deterministic seeded init: the k rows with the smallest
    md5(seed || id). TakeOrderedAndProject keeps this a top-k, not a sort;
    the collect is k vectors (bounded, like IVF's training sample)."""
    rows = (
        df.select(vec_col, id_col)
        .filter(F.col(vec_col).isNotNull())
        .orderBy(F.md5(F.concat(F.lit(str(seed)), F.col(id_col).cast("string"))))
        .limit(k)
        .collect()
    )
    if not rows:
        raise ValueError("cannot init centroids on an empty corpus")
    return np.asarray([list(r[0]) for r in rows], dtype=np.float64)


def kmeans_fit(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    iters: int = 3,
    seed: int = 42,
) -> tuple[DataFrame, np.ndarray]:
    """Lloyd's algorithm, fully distributed. Returns (assigned_df, centroids)
    where assigned_df = df + ``cluster`` (int) + ``dist`` (L2 to its
    centroid). Empty clusters keep their previous centroid (standard
    fallback; re-seeding would break determinism).

    Rows with a NULL vector are DROPPED (a corrupt embedding must not
    crash the Arrow stack in the assignment UDF — the same tolerance the
    similarity UDFs apply; callers wanting the rows back left-join on
    the id)."""
    if iters < 1:
        raise ValueError(f"iters={iters}; need at least one Lloyd iteration")
    df = df.filter(F.col(vec_col).isNotNull())
    cents = init_centroids(df, vec_col, id_col, k, seed)
    work = df
    for it in range(iters):
        assigned = work.withColumn("__a", _assign_udf(cents)(F.col(vec_col)))
        if it == iters - 1:
            break
        # update: per-(cluster, dim) partial sums -> k*dim tiny rows
        sums = (
            assigned.select(
                F.col("__a.cluster").alias("cluster"),
                F.posexplode(vec_col).alias("pos", "v"),
            )
            .groupBy("cluster", "pos")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new = cents.copy()
        acc = np.zeros_like(cents)
        cnt = np.zeros(len(cents), dtype=np.int64)
        for r in sums:
            acc[r["cluster"], r["pos"]] = r["s"]
            cnt[r["cluster"]] = r["n"]
        nonempty = cnt > 0
        new[nonempty] = acc[nonempty] / cnt[nonempty, None]
        cents = new
    out = assigned.select(
        *df.columns,
        F.col("__a.cluster").alias("cluster"),
        F.col("__a.dist").alias("dist"),
    )
    return out, cents


def cluster_profile(assigned: DataFrame) -> DataFrame:
    """Per-cluster size + mean distance (the convergence/inertia readout)."""
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("dist"), 4).alias("avg_dist"),
        )
    )
