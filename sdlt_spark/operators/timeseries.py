"""Time-series resampling: align irregular observations onto a regular
grid and gap-fill (the standard prep step before window features on
irregular event data; the reference's time series are row-per-period and
never need it, but any real feed does).

Scale notes: the per-key grid is generated executor-side
(sequence+explode — no driver loop); the only shuffles are the per-(key,
bucket) last-observation aggregate and the per-key forward-fill window,
both hash-partitioned on the key. Grid width is bounded per key by its own
observed range, so one ancient key cannot explode every key's grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_cols: list[str] | None = None,
    freq: str = "1 day",
    bucket: str = "day",
) -> DataFrame:
    """Regularize each key's series to one row per ``bucket`` over the key's
    own [first, last] observation range, carrying the last observed value
    forward across empty buckets.

    Per bucket the LAST observation wins, ordered by (ts, *tiebreak_cols) —
    pass a unique column (e.g. an event id) to make ties deterministic.
    Returns (key, bucket_start, value).

    ``freq`` must step exactly one ``bucket`` (a grid coarser than the
    bucket would silently DROP observed buckets that fall between grid
    points; a finer one would emit grid rows no observation can ever
    match) — mismatches are refused, not guessed.
    """
    _bucket_freq = {
        "second": {"1 second"},
        "minute": {"1 minute"},
        "hour": {"1 hour"},
        "day": {"1 day"},
        "week": {"1 week", "7 day"},
        "month": {"1 month"},
        "quarter": {"3 month", "1 quarter"},
        "year": {"1 year", "12 month"},
    }
    allowed = _bucket_freq.get(bucket)
    if allowed is None:
        # an unknown bucket must REFUSE, not skip validation — the
        # docstring's contract is "mismatches are refused, not guessed"
        raise ValueError(
            f"bucket={bucket!r} is not a supported date_trunc unit for "
            f"resampling; expected one of {sorted(_bucket_freq)}"
        )
    canon = freq.strip().lower()
    canon = canon[:-1] if canon.endswith("s") else canon
    if canon not in allowed:
        raise ValueError(
            f"freq={freq!r} does not step one {bucket!r} bucket: grid "
            "points would silently miss (or never match) the truncated "
            "observation buckets; pass a freq of exactly one bucket "
            f"(e.g. {sorted(allowed)[0]!r}) or change bucket="
        )
    tiebreak = tiebreak_cols or []
    b = F.date_trunc(bucket, F.col(ts_col))
    w_last = Window.partitionBy(key_col, "__bucket").orderBy(
        F.col(ts_col).desc(), *[F.col(c).desc() for c in tiebreak]
    )
    daily = (
        df.withColumn("__bucket", b)
        .withColumn("__rn", F.row_number().over(w_last))
        .filter(F.col("__rn") == 1)
        .select(key_col, "__bucket", F.col(value_col).alias("__v"))
    )
    grid = (
        daily.groupBy(key_col)
        .agg(F.min("__bucket").alias("__lo"), F.max("__bucket").alias("__hi"))
        .select(
            key_col,
            F.explode(
                F.sequence(F.col("__lo"), F.col("__hi"), F.expr(f"interval {freq}"))
            ).alias("__bucket"),
        )
    )
    w_fill = (
        Window.partitionBy(key_col)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.join(daily, [key_col, "__bucket"], "left").select(
        F.col(key_col),
        F.col("__bucket").alias("bucket_start"),
        F.last("__v", ignorenulls=True).over(w_fill).alias("value"),
    )
