"""Scale-safe global ranking (SURVEY.md §2.6 W-extras).

``Window.orderBy(...)`` with no ``partitionBy`` funnels every row through a
single task — correct, but a scale-killer. ``global_rank`` computes the same
total-order rank with bounded parallelism:

1. one pass computes explicit range boundaries for the first order column
   (``approxQuantile``; collected once to the driver, so both downstream
   jobs see the SAME literal boundaries — no reliance on deterministic
   re-sampling inside a range exchange);
2. one tiny aggregation counts rows per bucket (partial agg, shuffles
   ``n_buckets`` rows) from which cumulative offsets are derived;
3. the data pass groups by bucket (one shuffle) and ranks each bucket
   locally inside ``applyInPandas``, adding its bucket's offset — per-task
   memory is one bucket, parallelism is ``n_buckets``.

The bucketing only uses the FIRST order column, so it is a monotone
coarsening of the full order: ties on the boundary value land in one bucket
and are resolved locally by the remaining columns. Callers must therefore
pass a tie-breaking final column (unique key) — which they need anyway for
a deterministic, oracle-checkable rank.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    n_buckets: int | None = None,
    rank_col: str = "grank",
) -> tuple[DataFrame, int]:
    """Total-order row_number over ``order_cols`` (last one must be unique).

    Returns ``(df + rank_col, total_rows)``; the total comes free from the
    bucket-count pass. All three jobs are executor-parallel; driver state is
    O(n_buckets) boundary/offset scalars.

    NULL ordering matches ``Window.orderBy`` ascending (nulls FIRST, on
    every order column): rows with a NULL first column go to a dedicated
    bucket ranked before all value buckets (``approxQuantile`` ignores
    nulls, so boundaries only describe non-null values), and the in-bucket
    pandas sort uses ``na_position='first'``. NaN (distinct from NULL in
    Spark: it orders LAST, as the largest value) is routed to the top
    bucket by Spark's comparison semantics and sorted last in-bucket via
    a NaN->+inf shadow key — Arrow hands pandas NULL and NaN as the same
    NaN, so the shadow key is what keeps the two apart.

    The first order column must be NUMERIC (``approxQuantile`` is how the
    boundaries are computed without a global sort); map strings/dates
    through a monotone numeric key first, or use ``Window.orderBy`` when
    the input is small enough for one task.
    """
    from pyspark.sql.types import NumericType

    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = max(2, spark.sparkContext.defaultParallelism)
    first = order_cols[0]
    if not isinstance(df.schema[first].dataType, NumericType):
        raise ValueError(
            f"global_rank needs a NUMERIC first order column for its "
            f"approxQuantile boundaries; {first!r} is "
            f"{df.schema[first].dataType.simpleString()} — map it through "
            "a monotone numeric key (e.g. unix_timestamp) first"
        )

    qs = [i / n_buckets for i in range(1, n_buckets)]
    # collected once -> literal boundaries shared by the count and data jobs
    bounds = df.stat.approxQuantile(first, qs, 0.001)

    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + F.when(F.col(first) > F.lit(b), 1).otherwise(0)
    # nulls-first: their own bucket, ordered before every value bucket
    bucket = F.when(F.col(first).isNull(), F.lit(-1)).otherwise(bucket)
    bucketed = df.withColumn("__bucket", bucket.cast("int"))

    counts = {
        r["__bucket"]: r["n"]
        for r in bucketed.groupBy("__bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    total = sum(counts.values())
    n_nulls = counts.get(-1, 0)
    # The null bucket is ONE applyInPandas task (approxQuantile boundaries
    # only describe non-null values, so nulls can't be range-split on the
    # first column). When nulls dominate — a sparse metric column — that
    # task would sort an unbounded row set; recurse instead: rank the null
    # rows by the REMAINING order columns (exactly their relative order
    # under nulls-first semantics, since their first column is all-equal)
    # and the non-null rows by the normal bucketed path, offset after.
    if (
        n_nulls
        and len(order_cols) > 1
        # the recursion re-enters with order_cols[1] as the quantile
        # column — only possible when it is numeric; otherwise fall
        # through to the single-task null bucket (correct, slower)
        and isinstance(df.schema[order_cols[1]].dataType, NumericType)
        and n_nulls > 4 * max(1, total // n_buckets)
    ):
        nulls_ranked, _ = global_rank(
            df.filter(F.col(first).isNull()), order_cols[1:], n_buckets, rank_col
        )
        rest_ranked, n_rest = global_rank(
            df.filter(F.col(first).isNotNull()), order_cols, n_buckets, rank_col
        )
        ranked = nulls_ranked.unionByName(
            rest_ranked.withColumn(rank_col, (F.col(rank_col) + F.lit(n_nulls)).cast("long"))
        )
        return ranked, n_nulls + n_rest
    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]

    # NaN vs NULL: Spark orders NULL first and NaN LAST (largest), but
    # Arrow hands pandas both as NaN — a float order column needs a
    # NaN->+inf shadow key so na_position='first' keeps serving NULLs
    # while true NaNs sort last, matching Window.orderBy
    shadow = {
        c: f"__sk_{c}"
        for c in order_cols
        if df.schema[c].dataType.simpleString() in ("double", "float")
    }
    for c, s in shadow.items():
        bucketed = bucketed.withColumn(
            s,
            F.when(F.isnan(F.col(c)), F.lit(float("inf"))).otherwise(
                F.col(c)
            ),
        )
    sort_cols = [shadow.get(c, c) for c in order_cols]
    drop_cols = ["__bucket"] + list(shadow.values())

    out_fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
    out_schema = f"{out_fields}, {rank_col} long"

    def _rank(pdf: pd.DataFrame) -> pd.DataFrame:
        b = int(pdf["__bucket"].iloc[0])
        pdf = pdf.sort_values(sort_cols, kind="mergesort", na_position="first")
        pdf[rank_col] = offsets[b] + pd.RangeIndex(1, len(pdf) + 1)
        return pdf.drop(columns=drop_cols)

    ranked = bucketed.groupBy("__bucket").applyInPandas(_rank, out_schema)
    return ranked, total


def ntile_expr(rank: F.Column, n: int, k: int) -> F.Column:
    """SQL NTILE(k) bucket for a 1-based total-order rank over n rows:
    the first n % k tiles get floor(n/k)+1 rows, the rest floor(n/k)."""
    base, rem = divmod(n, k)
    big_span = rem * (base + 1)
    small = F.lit(rem) + F.ceil((rank - big_span) / F.lit(base)) if base else F.lit(None)
    return (
        F.when(rank <= big_span, F.ceil(rank / F.lit(base + 1)))
        .otherwise(small)
        .cast("int")
    )


def percent_rank_expr(rank: F.Column, n: int) -> F.Column:
    """SQL PERCENT_RANK for a tie-free total order: (rank-1)/(n-1), 0.0 when
    n == 1 (matching Spark/DuckDB)."""
    if n <= 1:
        return F.lit(0.0)
    return (rank - 1).cast("double") / F.lit(float(n - 1))
