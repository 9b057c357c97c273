"""Incremental aggregate maintenance over the vintage change feed.

The materialized-view problem at 100 TB: a per-key COUNT/SUM over a mutating
table costs a full scan per refresh if recomputed, but each commit's change
rows already say exactly how the aggregate moves. ``incremental_agg`` seeds
the state from ONE snapshot scan, then folds only the CDC deltas of later
commits — O(changed rows) per refresh, the same contract Delta's
change-data-feed-driven MV refresh gives (reference has no MV surface;
this extends README.md:125-130's merge choreography to its natural
downstream consumer).

Count/sum are self-maintainable under insert+delete (updates arrive as a
delete/insert pair from the change feed), so the fold is a weighted union:
snapshot rows weigh +1, CDC inserts +1, CDC deletes -1. Sums run over
DECIMAL so the result is exact regardless of fold order — bit-identical to
a from-scratch recompute, which is what the tests and the DuckDB oracle
assert. Compaction commits (dataChange=false) emit no change rows and fall
out of the fold for free.

The same fold works continuously: feed ``vintage_cdc`` micro-batches
through ``foreachBatch`` and apply each batch's deltas to the stored state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def incremental_agg(
    table,
    keys: list[str],
    value_col: str,
    from_version: int = 0,
    to_version: int | None = None,
) -> DataFrame:
    """Per-``keys`` row count + exact SUM(``value_col``) of the snapshot at
    ``to_version`` (default: latest), computed as snapshot(``from_version``)
    plus the folded change feed — never a rescan of the current snapshot.

    Returns columns ``*keys, n, total`` (total = DOUBLE rounded to 2 dp,
    derived from an exact DECIMAL fold). Keys whose count reaches zero drop
    out, matching a recompute exactly.
    """
    latest = table.latest_version() if to_version is None else to_version
    seed = table.read(version=from_version).select(
        *keys, F.lit(1).alias("__w"), F.col(value_col).alias("__v")
    )
    if latest > from_version:
        ch = table.table_changes(from_version + 1, latest)
        w = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(F.lit(-1))
        seed = seed.unionByName(
            ch.select(*keys, w.alias("__w"), F.col(value_col).alias("__v"))
        )
    return (
        seed.groupBy(*keys)
        .agg(
            F.sum("__w").alias("n"),
            F.sum(F.col("__v").cast("decimal(18,2)") * F.col("__w")).alias("__total"),
        )
        .filter(F.col("n") > 0)
        .select(*keys, "n", F.round(F.col("__total").cast("double"), 2).alias("total"))
    )
