"""Skew-mitigation utilities (SURVEY.md §4, BASELINE north-star scale
design).

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in our
session factory) handles most skew at runtime. These helpers cover the two
cases AQE cannot: aggregation skew (one hot group key) and broadcast-unable
skewed joins — both implemented as the classic salting transforms.

- ``salted_agg``: two-phase aggregation. Phase 1 aggregates on
  (key, salt) — the hot key's rows spread over ``num_salts`` reducers —
  phase 2 combines the partials per key. Works for any algebraic aggregate
  (sum/count/min/max; avg via sum+count).

- ``salted_join``: replicate the small(er) side ``num_salts`` times with an
  explicit salt column and salt the big side randomly-but-deterministically
  (hash of a row-unique column), so one hot join key fans across
  ``num_salts`` tasks instead of one straggler.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(col: str, num_salts: int) -> Column:
    """Deterministic pseudo-random salt derived from a row-unique column —
    reproducible across retries (rand() is not)."""
    return F.pmod(F.xxhash64(F.col(col)), F.lit(num_salts)).cast("int")


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    salt_source: str,
    aggs: dict[str, tuple[str, str]],
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output name -> (function, input column) with function in
    {sum, count, min, max}. Example::

        salted_agg(li, ["l_returnflag"], "l_orderkey",
                   {"sum_qty": ("sum", "l_quantity"), "n": ("count", "*")})
    """
    phase1_aggs, phase2_aggs = [], []
    for out, (fn, col) in aggs.items():
        if fn == "count":
            phase1_aggs.append(F.count(F.lit(1) if col == "*" else F.col(col)).alias(out))
            phase2_aggs.append(F.sum(out).alias(out))
        elif fn == "sum":
            phase1_aggs.append(F.sum(col).alias(out))
            phase2_aggs.append(F.sum(out).alias(out))
        elif fn == "min":
            phase1_aggs.append(F.min(col).alias(out))
            phase2_aggs.append(F.min(out).alias(out))
        elif fn == "max":
            phase1_aggs.append(F.max(col).alias(out))
            phase2_aggs.append(F.max(out).alias(out))
        else:
            raise ValueError(f"unsupported aggregate {fn!r} (not algebraic)")
    partial = (
        df.withColumn("__salt", _salt(salt_source, num_salts))
        .groupBy(*group_cols, "__salt")
        .agg(*phase1_aggs)
    )
    return partial.groupBy(*group_cols).agg(*phase2_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_source: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi join: salt the big side, replicate the small side.

    The small side is exploded ``num_salts``x (acceptable when it is orders
    of magnitude smaller — the usual skewed fact⋈dim case where the dim is
    still too big or too dynamic to broadcast).

    Only join types that never null-pad the REPLICATED side are legal: a
    right/full outer join would emit every unmatched small-side row once
    per salt replica (num_salts duplicate null-padded rows) — refused."""
    if how.replace("_", "").lower() not in ("inner", "left", "leftouter",
                                            "leftsemi", "leftanti", "semi",
                                            "anti"):
        raise ValueError(
            f"salted_join(how={how!r}): right/full outer joins would "
            "duplicate unmatched small-side rows once per salt replica; "
            "swap the sides or use a plain join"
        )
    salted_big = big.withColumn("__salt", _salt(salt_source, num_salts))
    replicated = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    out = salted_big.join(replicated, [on, "__salt"], how)
    return out.drop("__salt")


def skew_report(df: DataFrame, key_col: str, top_n: int = 20) -> DataFrame:
    """Join/agg-key skew diagnostics: the top-N heaviest keys with their row
    count, share of the table, and skew factor (count / mean-per-key) — the
    numbers that decide between broadcast, AQE skew split, and salting.
    One partial-agg shuffle of (key, count); the 1-row stats frame comes
    back as a broadcast."""
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
    stats = counts.agg(
        F.sum("n").alias("total"), F.avg("n").alias("avg_n")
    )
    return (
        counts.crossJoin(F.broadcast(stats))
        .select(
            key_col,
            "n",
            F.round(F.col("n") / F.col("total"), 6).alias("share"),
            F.round(F.col("n") / F.col("avg_n"), 4).alias("skew"),
        )
        .orderBy(F.col("n").desc(), key_col)
        .limit(top_n)
    )
