"""As-of join (SURVEY.md §2.5 J5).

For each left row, attach the most recent right row with
``right.ts <= left.ts`` (backward as-of, exact matches included) sharing the
join key. Spark has no native as-of join; the scalable formulation used here
is the union + last-value-window trick:

    union(left tagged side=1, right tagged side=0)
      -> window partitionBy(key) orderBy(ts, side)
      -> F.last(right_value, ignorenulls=True) over rows unbounded preceding
      -> keep side=1 rows

Cost model: ONE hash shuffle on the join key + a per-partition sort — no
pairwise join explosion, no range-condition nested loop. At 100 TB this is
the plan you want: it is exactly the shuffle a sort-merge join would pay,
without the O(matches) blow-up of an inequality join. Caveat on skew: AQE
skew-split applies to shuffled JOINs, not to a window's hash exchange —
one pathologically hot key funnels through one window task. The standard
mitigation is pre-bucketing hot keys by a coarse time range (each
sub-range carries the previous range's last right row as a seed), the
same sub-bucketing note token_budget_sample documents.

Right-side ties on (key, ts) are resolved before the union (keep the row
with the largest tiebreaker) so results are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    value_cols: list[str],
    tiebreaker: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join. Returns all left columns plus, for each
    ``v`` in ``value_cols``, a column ``v + suffix`` holding the value from
    the latest right row with ``right[ts] <= left[ts]`` and equal ``on`` key
    (null when no such row exists).

    NULL semantics match an equi join: a NULL join key or NULL timestamp
    never matches anything — right rows with either are dropped (they
    could otherwise pair with left NULL-key rows through the shared
    window partition, which no SQL ASOF join would do); left rows with
    NULLs are kept with null value columns, like unmatched rows.
    """
    right = right.filter(F.col(on).isNotNull() & F.col(ts).isNotNull())
    if tiebreaker is not None:
        w_dedup = Window.partitionBy(on, ts).orderBy(F.col(tiebreaker).desc())
        right = (
            right.withColumn("__rn", F.row_number().over(w_dedup))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    out_cols = [f"{v}{suffix}" for v in value_cols]
    left_cols = left.columns
    # fail fast on name collisions: emitting a second 'v_asof' next to an
    # existing left column of that name would return a frame whose next
    # select/write dies with AMBIGUOUS_REFERENCE far from the cause; the
    # reserved plumbing names would collide inside the union below
    clash = sorted(set(out_cols) & set(left_cols))
    if clash:
        raise ValueError(
            f"asof_join output column(s) {clash} already exist on the left "
            "side; pass a different suffix="
        )
    reserved = sorted({"__side", "__pack"} & set(left_cols))
    if reserved:
        raise ValueError(
            f"left side uses reserved asof_join column name(s) {reserved}"
        )

    # Values ride in ONE struct per right row: last(.., ignorenulls) then
    # tracks "latest right ROW", not "latest non-null value" — a right row
    # whose value is legitimately NULL must win over an older non-null row
    # (matching SQL ASOF JOIN semantics).
    pack_type = "struct<" + ",".join(
        f"`{v}`:{right.schema[v].dataType.simpleString()}" for v in value_cols
    ) + ">"
    l_tagged = left.select(
        *left_cols,
        F.lit(1).alias("__side"),
        F.lit(None).cast(pack_type).alias("__pack"),
    )
    r_tagged = right.select(
        F.col(on),
        F.col(ts),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in (on, ts)],
        F.lit(0).alias("__side"),
        F.struct(*[F.col(v) for v in value_cols]).alias("__pack"),
    ).select(*left_cols, "__side", "__pack")

    unioned = l_tagged.unionByName(r_tagged)
    # side=0 (right) sorts before side=1 (left) at equal ts => exact matches count.
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *left_cols,
        "__side",
        F.last("__pack", ignorenulls=True).over(w).alias("__pack"),
    )
    return (
        filled.filter(F.col("__side") == 1)
        .select(
            *left_cols,
            *[F.col(f"__pack.{v}").alias(o) for v, o in zip(value_cols, out_cols)],
        )
    )
