"""Sequence packing + mixture sampling (operators/packing.py).

Oracle parity for the registry entries rides test_oracle_parity; these
tests pin the operator semantics directly: the two-level prefix sum must
equal the naive single-window form row-for-row, without ever planning a
single-partition exchange, and the mixture draw must be deterministic,
append-stable, and quota-starved gracefully.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sdlt_spark.operators.packing import (
    _prefilter_thresholds,
    _quotas,
    mixture_sample,
    mixture_sample_sql,
    pack_sequences,
    pack_sequences_sql,
)


def _corpus(spark, n=500, seed=7):
    rng = random.Random(seed)
    rows = []
    for i in rng.sample(range(10 * n), n):  # sparse, shuffled ids
        if i % 97 == 0:
            rows.append((i, None))  # NULL text counts 0 tokens
        else:
            rows.append((i, " ".join(f"w{rng.randrange(50)}" for _ in range(rng.randrange(1, 40)))))
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(8)


def _naive(df, budget):
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    ntok = F.when(F.col("text").isNull(), F.lit(0)).otherwise(
        F.size(F.split("text", " "))
    )
    return df.select(
        "doc_id",
        ntok.alias("n_tokens"),
        F.ceil(F.sum(ntok).over(w) / F.lit(float(budget)))
        .cast("bigint")
        .alias("bin"),
    )


def test_pack_equals_naive_single_window(spark):
    df = _corpus(spark)
    got = {tuple(r) for r in pack_sequences(df, budget=64, num_chunks=7).collect()}
    want = {tuple(r) for r in _naive(df, 64).collect()}
    assert got == want


def test_pack_chunk_count_invariance(spark):
    """Bin assignment must not depend on where the chunk boundaries land."""
    df = _corpus(spark, n=200, seed=11)
    a = sorted(map(tuple, pack_sequences(df, budget=100, num_chunks=3).collect()))
    b = sorted(map(tuple, pack_sequences(df, budget=100, num_chunks=64).collect()))
    assert a == b


def test_pack_never_plans_single_partition(spark):
    """The operator exists to avoid the global-window shape: its plan must
    carry no SinglePartition exchange (the naive form's signature)."""
    df = _corpus(spark, n=100, seed=3)
    plan = pack_sequences(df, budget=64)._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    naive_plan = _naive(df, 64)._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" in naive_plan  # the trap is real


def test_pack_sql_twin_is_the_same_packing(spark, tmp_path):
    import duckdb

    df = _corpus(spark, n=150, seed=5)
    path = str(tmp_path / "docs.parquet")
    df.coalesce(1).write.parquet(path)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{path}/*.parquet'")
    want = sorted(con.sql(pack_sequences_sql("documents", budget=64)).fetchall())
    got = sorted(map(tuple, pack_sequences(df, budget=64).collect()))
    assert got == want


WEIGHTS = {"en": 0.5, "zh": 0.3, "fr": 0.2}


def _langs(spark, n=300):
    rows = [(i, ["en", "zh", "fr", "de"][i % 4]) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_mixture_quotas_and_whitelist(spark):
    out = mixture_sample(_langs(spark), "lang", "doc_id", WEIGHTS, total=100)
    by_lang = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_lang == {"en": 50, "zh": 30, "fr": 20}  # 'de' dropped


def test_mixture_starved_stratum_keeps_what_exists(spark):
    small = _langs(spark, n=12)  # 3 docs per lang
    out = mixture_sample(small, "lang", "doc_id", WEIGHTS, total=100)
    by_lang = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_lang == {"en": 3, "zh": 3, "fr": 3}


def test_mixture_append_stable(spark):
    base = _langs(spark, n=200)
    chosen = {r["doc_id"] for r in mixture_sample(base, "lang", "doc_id", WEIGHTS, total=60).collect()}
    grown = base.unionByName(
        spark.createDataFrame([(10_000 + i, "en") for i in range(50)], "doc_id long, lang string")
    )
    out2 = mixture_sample(grown, "lang", "doc_id", WEIGHTS, total=60).collect()
    chosen2 = {r["doc_id"] for r in out2}
    # only 'en' grew: the other strata's selections must be EXACTLY stable,
    # and new 'en' rows may displace old picks but never reshuffle them —
    # every selected id is either an original pick or an appended row
    assert {r["doc_id"] for r in out2 if r["lang"] != "en"} == {
        r["doc_id"] for r in mixture_sample(base, "lang", "doc_id", WEIGHTS, total=60).collect()
        if r["lang"] != "en"
    }
    assert chosen2 <= chosen | {10_000 + i for i in range(50)}
    # and re-running on identical input is exactly reproducible
    chosen3 = {r["doc_id"] for r in mixture_sample(base, "lang", "doc_id", WEIGHTS, total=60).collect()}
    assert chosen == chosen3


def test_pack_rejects_null_ids(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (None, "c d"), (2, "e")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="non-NULL"):
        pack_sequences(df, budget=8).collect()


def test_pack_rejects_non_numeric_ids(spark):
    df = spark.createDataFrame([("a", "x y")], "doc_id string, text string")
    with pytest.raises(ValueError, match="numeric id column"):
        pack_sequences(df, budget=8)


def test_quotas_largest_remainder_hits_total_exactly():
    """Off-grid weights (the verdict's .34/.33/.33 x 200 example) must not
    under-fill the draw; property-checked over random weight vectors."""
    assert sum(_quotas({"a": 0.34, "b": 0.33, "c": 0.33}, 200).values()) == 200
    rng = random.Random(42)
    for _ in range(200):
        k = rng.randrange(1, 8)
        weights = {f"g{i}": rng.random() + 1e-9 for i in range(k)}
        total = rng.randrange(0, 500)
        qs = _quotas(weights, total)
        assert sum(qs.values()) == total, (weights, total, qs)
        assert all(v >= 0 for v in qs.values())
        # no stratum may exceed its exact share by more than the 1-seat
        # largest-remainder bump
        s = sum(weights.values())
        for g, v in qs.items():
            assert v <= math.floor(total * weights[g] / s) + 1


def test_quotas_float_representation_error():
    """Weights summing to 0.9999999999999999 (the ADVICE float-truncation
    case) must still apportion exactly."""
    w = {f"g{i}": 0.1 for i in range(10)}  # sums to 0.9999999999999999
    qs = _quotas(w, 100)
    assert qs == {f"g{i}": 10 for i in range(10)}


def test_mixture_prefilter_is_exact_and_bounds_window_input(spark):
    """The scale path: each large stratum's window input must be O(quota)
    (<= quota + 6*sqrt(quota) + 64 EXPECTED survivors; assert a 3x slack
    on the realized deterministic count), and the prefiltered draw must
    equal the unfiltered draw row-for-row."""
    n = 4000
    rows = [(i, ["en", "zh", "fr", "de"][i % 4]) for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    quotas = _quotas(WEIGHTS, 100)
    bounds = _prefilter_thresholds(df, "lang", "doc_id", quotas, "mix-v1")
    assert bounds is not None and set(bounds) == set(quotas)  # all strata large
    prefix = F.substring(
        F.md5(F.concat_ws(":", F.lit("mix-v1"), F.col("doc_id").cast("string"))),
        1,
        15,
    )
    for g, b in bounds.items():
        survivors = df.filter(
            (F.col("lang") == g) & (prefix <= F.lit(b))
        ).count()
        margin = quotas[g] + 6 * math.isqrt(quotas[g]) + 64
        assert quotas[g] <= survivors <= 3 * margin, (g, survivors, margin)
    # prefilter_min_bytes=0 forces the prefilter: a 4000-row local relation
    # is far below the default size gate (round 12), which would otherwise
    # (correctly) skip it and make this exactness check vacuous
    fast = sorted(
        map(
            tuple,
            mixture_sample(
                df, "lang", "doc_id", WEIGHTS, total=100, prefilter_min_bytes=0
            ).collect(),
        )
    )
    slow = sorted(
        map(
            tuple,
            mixture_sample(
                df, "lang", "doc_id", WEIGHTS, total=100, prefilter=False
            ).collect(),
        )
    )
    assert fast == slow
    by_lang = {}
    for r in fast:
        by_lang[r[1]] = by_lang.get(r[1], 0) + 1
    assert by_lang == quotas


def test_mixture_sql_escapes_quotes(spark, tmp_path):
    """ADVICE: stratum values / seeds containing quotes must produce valid
    oracle SQL with the same draw."""
    import duckdb

    rows = [(i, "o'brien" if i % 2 else "plain") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    weights = {"o'brien": 0.5, "plain": 0.5}
    path = str(tmp_path / "docs.parquet")
    df.coalesce(1).write.parquet(path)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{path}/*.parquet'")
    sql = mixture_sample_sql(
        "documents", "lang", "doc_id", weights, total=20, seed="it's",
        select_cols="doc_id, lang",
    )
    want = sorted(con.sql(sql).fetchall())
    got = sorted(
        map(
            tuple,
            mixture_sample(df, "lang", "doc_id", weights, total=20, seed="it's")
            .select("doc_id", "lang")
            .collect(),
        )
    )
    assert got == want



def test_mixture_prefilter_skips_small_inputs(spark, monkeypatch, tmp_path):
    """Round-12 (round-11 verdict item 3): the prefilter costs two eager
    aggregate jobs — pure overhead when the input is small enough that
    every window partition sorts in one task. Below the size gate
    (Catalyst plan statistics, zero jobs) the draw must be ONE lazy plan:
    _prefilter_thresholds is never called. Forcing the gate to zero
    re-enables it, and both paths draw identical rows.

    The input goes through parquet because the gate only trusts REAL
    stats: a file scan's sizeInBytes is the file size (driver metadata),
    while an in-memory LogicalRDD reports the unknown-stats sentinel
    (Long.MaxValue) and is conservatively treated as large — the right
    call at 100 TB, also pinned here."""
    from sdlt_spark.operators import packing

    n = 4000
    rows = [(i, ["en", "zh", "fr", "de"][i % 4]) for i in range(n)]
    mem = spark.createDataFrame(rows, "doc_id long, lang string")
    # unknown-stats inputs must NOT skip (conservative default)
    assert (s := packing._plan_size_bytes(mem)) is None or s >= 1 << 30
    path = str(tmp_path / "langs.parquet")
    mem.write.parquet(path)
    df = spark.read.parquet(path)
    size = packing._plan_size_bytes(df)
    assert size is not None and size < 1 << 30  # real file-size stats

    calls = []
    orig = packing._prefilter_thresholds
    monkeypatch.setattr(
        packing,
        "_prefilter_thresholds",
        lambda *a, **k: calls.append(1) or orig(*a, **k),
    )
    small = sorted(
        map(tuple, mixture_sample(df, "lang", "doc_id", WEIGHTS, total=100).collect())
    )
    assert calls == []  # size gate skipped the eager passes entirely
    forced = sorted(
        map(
            tuple,
            mixture_sample(
                df, "lang", "doc_id", WEIGHTS, total=100, prefilter_min_bytes=0
            ).collect(),
        )
    )
    assert calls == [1] and small == forced


def test_pack_small_input_takes_single_window_plan(spark, tmp_path):
    """Round-12: below the size gate a parquet-backed corpus must plan the
    oracle's own single-window form (ONE lazy job — the three eager
    control jobs of the chunked shape are pure overhead there), emit rows
    identical to the forced-chunked plan, and still reject NULL ids (the
    check rides the plan as raise_error). In-memory frames have unknown
    stats and stay on the chunked path — pinned by
    test_pack_never_plans_single_partition above."""
    df = _corpus(spark, n=300, seed=13)
    path = str(tmp_path / "docs.parquet")
    df.write.parquet(path)
    small = spark.read.parquet(path)

    fast = pack_sequences(small, budget=64)
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" in plan  # the gate chose the one-job form
    chunked = pack_sequences(small, budget=64, chunked_min_bytes=0)
    cplan = chunked._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in cplan  # forcing restores the scale path
    assert sorted(map(tuple, fast.collect())) == sorted(
        map(tuple, chunked.collect())
    )

    withnull = spark.createDataFrame(
        [(1, "a b"), (None, "c d")], "doc_id long, text string"
    )
    nullpath = str(tmp_path / "null.parquet")
    withnull.write.parquet(nullpath)
    import pyspark.errors

    with pytest.raises(Exception, match="non-NULL"):
        pack_sequences(spark.read.parquet(nullpath), budget=8).collect()
