"""Shared Morton (Z-curve) clustering key — Delta's OPTIMIZE ZORDER.

One implementation serves both stores: the vintage table's
``compact(zorder_by=...)`` and the Delta export's
``optimize_delta_export(zorder_by=...)`` build the same interleaved-bit
key, so clustering quality (and its zone-map pruning payoff) is
identical whichever side owns the table.

Column buckets (``bits`` per column, NULL -> bucket 0, Delta's
nulls-first):

- numeric: ``width_bucket`` over the min/max from one tiny agg;
- string, <= ``dict_max`` distinct: dictionary rank — sorted distinct
  values (one small agg, driver holds only the dictionary) mapped to
  scaled indices, preserving lexicographic locality so string zone maps
  prune ranges AND points;
- string, higher cardinality: hash buckets — equal values still cluster
  (point-predicate pruning works) but range locality is given up rather
  than paying a global sort; delta-spark samples a range partitioner
  here, a fine future upgrade.

Everything is JVM-side expression work: two bounded driver aggregations
(min/max scalars, small dictionaries), then a codegen'd bit-interleave —
no Python in the row path, so the key costs what any derived column
costs at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DateType,
    StringType,
    TimestampNTZType,
    TimestampType,
)

DICT_MAX_DEFAULT = 4096


def zorder_key(
    df: DataFrame,
    zorder_by: list[str],
    dict_max: int = DICT_MAX_DEFAULT,
    bits: int = 10,
) -> Column:
    """Morton key over ``zorder_by`` as a codegen'd long Column. Columns
    whose range degenerates (all-null / single value) contribute nothing
    — matching a sort key where that column is constant."""
    if len(zorder_by) < 2:
        raise ValueError("zorder_by needs >= 2 columns; use sort_by for 1")
    # the interleave must fit a 64-bit long: Spark's shiftleft masks its
    # amount mod 64, so an out-of-range shift would SILENTLY alias high
    # bucket bits onto low Morton positions (near-random clustering, no
    # error). Shrink bits to fit — more columns = coarser per-column
    # buckets, the standard Morton trade.
    bits = min(bits, 64 // len(zorder_by))
    if bits < 1:
        raise ValueError(
            f"zorder_by lists {len(zorder_by)} columns; at most 64 fit a "
            "64-bit Morton key"
        )
    n_buckets = 1 << bits

    def _as_num(c: str) -> Column | None:
        """Numeric view of a non-string column, safe for BOTH the bounds
        agg and width_bucket: temporal types go through their epoch form
        (float(datetime) on the driver would TypeError)."""
        dt = df.schema[c].dataType
        if isinstance(dt, StringType):
            return None
        if isinstance(dt, DateType):
            return F.unix_date(F.col(c)).cast("double")
        if isinstance(dt, (TimestampType, TimestampNTZType)):
            return F.col(c).cast("double")  # epoch seconds
        return F.col(c).cast("double")

    num_exprs = {c: e for c in zorder_by if (e := _as_num(c)) is not None}
    # bounds aggregated on the CONVERTED expression, so lo/hi land on the
    # driver as plain floats whatever the column type
    bounds = (
        df.agg(
            *[F.min(e).alias(f"__lo_{c}") for c, e in num_exprs.items()],
            *[F.max(e).alias(f"__hi_{c}") for c, e in num_exprs.items()],
        ).head()
        if num_exprs
        else None
    )
    z = F.lit(0).cast("long")
    for d, c in enumerate(zorder_by):
        if c in num_exprs:
            lo, hi = bounds[f"__lo_{c}"], bounds[f"__hi_{c}"]
            if lo is None or hi is None or lo == hi:
                continue
            bucket = (
                F.width_bucket(
                    num_exprs[c],
                    F.lit(float(lo)),
                    F.lit(float(hi)),
                    F.lit(n_buckets),
                )
                - 1
            ).cast("long")
            # clamp width_bucket's overflow bucket (value == hi)
            bucket = F.least(bucket, F.lit(n_buckets - 1))
        else:
            vals = [
                r[0]
                for r in df.select(c)
                .filter(F.col(c).isNotNull())
                .distinct()
                .orderBy(c)
                .limit(dict_max + 1)
                .collect()
            ]
            if len(vals) <= 1:
                continue
            if len(vals) > dict_max:
                bucket = F.pmod(F.xxhash64(F.col(c)), F.lit(n_buckets)).cast(
                    "long"
                )
            else:
                idx = F.create_map(
                    *[
                        x
                        for i, v in enumerate(vals)
                        for x in (F.lit(v), F.lit(i * n_buckets // len(vals)))
                    ]
                )[F.col(c)]
                bucket = idx.cast("long")
        bucket = F.coalesce(bucket, F.lit(0).cast("long"))
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftrightunsigned(bucket, i).bitwiseAND(
                        F.lit(1).cast("long")
                    ),
                    i * len(zorder_by) + d,
                )
            )
    return z
