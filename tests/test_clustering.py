"""Distributed k-means (operators/clustering.py): determinism, numpy parity
of the assignment kernel, and Lloyd-iteration improvement."""

from __future__ import annotations

import numpy as np
import pytest

from sdlt_spark import tables
from sdlt_spark.operators import clustering

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return tables.load(spark, SF_DIR, "embeddings")


def _np_corpus(emb):
    rows = emb.select("vec_id", "embedding").collect()
    rows.sort(key=lambda r: r["vec_id"])
    ids = np.asarray([r["vec_id"] for r in rows])
    x = np.asarray([list(r["embedding"]) for r in rows], dtype=np.float64)
    return ids, x


def test_fit_deterministic(spark, emb):
    a1, c1 = clustering.kmeans_fit(emb, "embedding", "vec_id", k=4, iters=2)
    a2, c2 = clustering.kmeans_fit(emb, "embedding", "vec_id", k=4, iters=2)
    assert np.array_equal(c1, c2)
    r1 = sorted((r["vec_id"], r["cluster"]) for r in a1.collect())
    r2 = sorted((r["vec_id"], r["cluster"]) for r in a2.collect())
    assert r1 == r2


def test_assignment_matches_numpy(spark, emb):
    """The Arrow GEMM argmin must agree with a plain numpy replica given the
    same centroids."""
    cents = clustering.init_centroids(emb, "embedding", "vec_id", k=4, seed=7)
    assigned, _ = clustering.kmeans_fit(
        emb, "embedding", "vec_id", k=4, iters=1, seed=7
    )
    got = dict(
        (r["vec_id"], r["cluster"]) for r in assigned.select("vec_id", "cluster").collect()
    )
    ids, x = _np_corpus(emb)
    d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    want = np.argmin(d, axis=1)
    assert [got[i] for i in ids] == list(want)


def test_lloyd_iterations_reduce_inertia(spark, emb):
    def inertia(iters):
        assigned, _ = clustering.kmeans_fit(
            emb, "embedding", "vec_id", k=8, iters=iters
        )
        return assigned.agg({"dist": "sum"}).collect()[0][0]

    i1, i3 = inertia(1), inertia(3)
    assert i3 <= i1 + 1e-9


def test_rows_preserved_and_clusters_bounded(spark, emb):
    n = emb.count()
    assigned, cents = clustering.kmeans_fit(emb, "embedding", "vec_id", k=5, iters=2)
    assert assigned.count() == n
    assert cents.shape == (5, 64)
    got = assigned.select("cluster").distinct().collect()
    assert all(0 <= r["cluster"] < 5 for r in got)
