"""Property-based spot checks (SURVEY.md §5.2): merge idempotence, merge ==
relational formulation, time-travel immutability, as-of join vs pandas
merge_asof — on hypothesis-generated data, not just the fixtures.

Spark jobs per example are expensive: examples are capped and deadlines
disabled; the properties, not the volume, carry the value.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sdlt_spark.operators.asof import asof_join
from sdlt_spark.store import VintageTable

KEYS = st.integers(min_value=0, max_value=20)
VALS = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False)

rows_strategy = st.lists(st.tuples(KEYS, VALS), min_size=1, max_size=30)

_prop_settings = settings(
    max_examples=5, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture]
)


def _df(spark, rows):
    # one row per key (merge sources must be key-unique, like real SDMX)
    dedup = {k: v for k, v in rows}
    return spark.createDataFrame(list(dedup.items()), "k long, v double")


@given(base=rows_strategy, src=rows_strategy)
@_prop_settings
def test_merge_matches_relational_formulation(spark, tmp_path_factory, base, src):
    """VintageTable.merge == src UNION ALL (master ANTI JOIN src) — the M1
    oracle formulation (SURVEY.md §2.3) on arbitrary data."""
    t = VintageTable(spark, str(tmp_path_factory.mktemp("prop") / "t"))
    base_df, src_df = _df(spark, base), _df(spark, src)
    t.write(base_df)
    t.merge(src_df, ["k"])
    got = sorted(map(tuple, t.read().collect()))
    expected = sorted(
        map(
            tuple,
            src_df.unionByName(
                base_df.join(src_df.select("k"), "k", "left_anti")
            ).collect(),
        )
    )
    assert got == expected


@given(base=rows_strategy, src=rows_strategy)
@_prop_settings
def test_merge_idempotent(spark, tmp_path_factory, base, src):
    t = VintageTable(spark, str(tmp_path_factory.mktemp("prop") / "t"))
    t.write(_df(spark, base))
    t.merge(_df(spark, src), ["k"])
    once = sorted(map(tuple, t.read().collect()))
    t.merge(_df(spark, src), ["k"])
    twice = sorted(map(tuple, t.read().collect()))
    assert once == twice


@given(base=rows_strategy, src=rows_strategy, thresh=KEYS)
@_prop_settings
def test_time_travel_immutable_under_mutation(spark, tmp_path_factory, base, src, thresh):
    """Any prior version re-reads bit-identically after merge+delete."""
    t = VintageTable(spark, str(tmp_path_factory.mktemp("prop") / "t"))
    t.write(_df(spark, base))
    v0 = sorted(map(tuple, t.read(version=0).collect()))
    t.merge(_df(spark, src), ["k"])
    v1 = sorted(map(tuple, t.read().collect()))
    t.delete(f"k >= {thresh}")
    assert sorted(map(tuple, t.read(version=0).collect())) == v0
    assert sorted(map(tuple, t.read(version=1).collect())) == v1
    assert t.read().filter(F.col("k") >= thresh).count() == 0


asof_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 100), VALS), min_size=1, max_size=25
)


@given(left=asof_rows, right=asof_rows)
@_prop_settings
def test_asof_join_matches_pandas(spark, left, right):
    """asof_join == pd.merge_asof (backward, exact matches allowed) on
    arbitrary data, after identical (key, ts) dedup."""
    ldf = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts, _v) in enumerate(left)], "lid long, k long, ts long"
    )
    rdf = spark.createDataFrame(
        [(i, k, ts, v) for i, (k, ts, v) in enumerate(right)],
        "rid long, k long, ts long, v double",
    )
    got = {
        r["lid"]: r["v_asof"]
        for r in asof_join(ldf, rdf, on="k", ts="ts", value_cols=["v"], tiebreaker="rid").collect()
    }

    lp = ldf.toPandas().sort_values("ts", kind="stable")
    rp = (
        rdf.toPandas()
        .sort_values(["ts", "rid"], kind="stable")
        .groupby(["k", "ts"], as_index=False)
        .last()  # tiebreaker: max rid per (k, ts)
        .sort_values("ts", kind="stable")
    )
    merged = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
    expected = {int(r.lid): (None if pd.isna(r.v) else r.v) for r in merged.itertuples()}
    assert set(got) == set(expected)
    for lid, v in expected.items():
        if v is None:
            assert got[lid] is None
        else:
            assert got[lid] == pytest.approx(v)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)), min_size=0, max_size=20
    )
)
@_prop_settings
def test_dedup_clusters_match_union_find(spark, edges):
    """Label-propagation connected components == a reference union-find with
    min-label canonicalization, on arbitrary small graphs."""
    from sdlt_spark.operators.dedup import dedup_clusters

    n = 16
    clean = sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})
    ids = spark.range(n).select(F.col("id").alias("doc_id"))
    if clean:
        pairs = spark.createDataFrame(clean, "id_a long, id_b long")
    else:
        pairs = spark.createDataFrame([], "id_a long, id_b long")
    got = {
        r["doc_id"]: r["cluster"]
        for r in dedup_clusters(pairs, ids, "doc_id").collect()
    }

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in clean:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {}
    comp_min: dict[int, int] = {}
    for x in range(n):
        r = find(x)
        comp_min[r] = min(comp_min.get(r, x), x)
    for x in range(n):
        expected[x] = comp_min[find(x)]
    assert got == expected


TOKENS = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"]),
    min_size=1,
    max_size=8,
)


@given(texts=st.lists(TOKENS, min_size=2, max_size=12))
@_prop_settings
def test_minhash_dedup_precision_and_exact_jaccard(spark, texts):
    """Every pair minhash_dedup emits must truly satisfy jaccard >= t, with
    the exact set-jaccard value (LSH bounds recall, never precision)."""
    from sdlt_spark.operators.dedup import minhash_dedup

    rows = [(i, " ".join(toks)) for i, toks in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = minhash_dedup(df, "doc_id", threshold=0.5).collect()
    spark.catalog.clearCache()
    sets = {i: set(t.split(" ")) for i, t in rows}
    for r in out:
        a, b = sets[r["id_a"]], sets[r["id_b"]]
        true_j = len(a & b) / len(a | b)
        assert r["id_a"] < r["id_b"]
        assert true_j >= 0.5
        assert abs(r["jaccard"] - round(true_j, 4)) < 1e-9


# ------------------------------------------------------ incremental fold


OPS = st.lists(
    st.one_of(
        st.tuples(st.just("merge"), rows_strategy),
        st.tuples(st.just("delete"), KEYS),
        st.tuples(st.just("update"), KEYS),
    ),
    min_size=1,
    max_size=4,
)


@given(base=rows_strategy, ops=OPS)
@_prop_settings
def test_incremental_fold_equals_recompute(spark, tmp_path_factory, base, ops):
    """incremental_agg over an ARBITRARY mutation sequence must equal the
    from-scratch aggregate of the final snapshot — the CDC fold has no
    blind spots (empty deltas, vanished groups, update pairs...)."""
    from sdlt_spark.operators.incremental import incremental_agg

    path = str(tmp_path_factory.mktemp("inc") / "t")
    t = VintageTable(spark, path, change_feed=True)
    t.write(
        _df(spark, base).select(
            "k", (F.col("k") % 3).cast("string").alias("g"), "v"
        )
    )
    for op, arg in ops:
        if op == "merge":
            t.merge(
                _df(spark, arg).select(
                    "k", (F.col("k") % 2).cast("string").alias("g"), "v"
                ),
                ["k"],
            )
        elif op == "delete":
            t.delete(f"k = {arg}")
        else:
            t.update(f"k = {arg}", {"v": F.lit(1.25)})

    got = sorted(map(tuple, incremental_agg(t, ["g"], "v").collect()))
    want = sorted(
        map(
            tuple,
            t.read()
            .groupBy("g")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(
                    F.sum(F.col("v").cast("decimal(18,2)")).cast("double"), 2
                ).alias("total"),
            )
            .collect(),
        )
    )
    assert got == want


def test_hll_sketch_merge_accuracy(spark):
    """The unioned-sketch estimate must match the exact distinct count
    within HLL's expected error (default lgK=12 => ~1.6% sigma; assert 5%),
    and per-group estimates must each be within 5% too."""
    import sdlt_spark.queries as q
    from pyspark.sql import functions as F
    from sdlt_spark import tables

    sf = "/root/testdata/sf0.01"
    fn, _ = q.registry()["hll_distinct_merge"]
    got = {r["event_type"]: r["distinct_users"] for r in fn(spark, sf).collect()}
    ev = tables.load(spark, sf, "events")
    exact_total = ev.select("user_id").distinct().count()
    assert abs(got["__all__"] - exact_total) / exact_total < 0.05
    exact_per = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for k, n in exact_per.items():
        assert abs(got[k] - n) / n < 0.05, (k, got[k], n)
