"""Deterministic, engine-portable dataset splitting / sampling for training
pipelines (north-star extension; no reference analogue — the reference is
batch SDMX only).

``sample()``/``randomSplit()`` are seeded RNG draws: reproducible within one
Spark version but not across engines, partitionings, or re-runs on changed
data (a row's assignment depends on scan order). Training-data pipelines
need the opposite: every row's split decided by a pure function of its KEY,
so (a) the same id always lands in the same split — membership is stable
under re-partitioning, incremental appends, and engine swaps; (b) the split
is auditable in SQL (the DuckDB oracle runs the same expression).

Mechanism: the first two hex chars of ``md5(seed ':' id)`` give a uniform
bucket in [0, 256); cumulative weight boundaries are compared as hex
STRINGS — lowercase-hex ordering is identical in every engine, so no hex->
int conversion (whose SQL differs per dialect) is needed. Split fractions
are therefore quantized to 1/256 — fine for 80/10/10-style splits; use more
hex chars if a finer grain is ever needed.

Scale: one md5 per row, no shuffle, no RNG state — a pure map Catalyst
pipelines into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_boundaries(weights: dict[str, float]) -> list[tuple[str, str]]:
    """[(split_name, exclusive upper hex-bound), ...] in declaration order;
    the last bound is always 'ff' + 1 territory (catch-all)."""
    total = sum(weights.values())
    bounds = []
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        bounds.append((name, format(min(255, int(acc * 256)), "02x")))
    bounds.append((names[-1], "zz"))  # > any hex pair: catch-all
    return bounds


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    n_per_stratum: int,
    seed: str = "sample-v1",
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer if the stratum is
    smaller), chosen by md5 order over the seeded key — the balanced-corpus
    draw (equal docs per language, per source...) with every property
    deterministic_split has: re-runnable, append-stable per id, and
    auditable in portable SQL (md5 hex ordering is engine-independent,
    unlike seeded sampleBy). One window shuffle on the stratum key."""
    from pyspark.sql import Window

    h = F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string")))
    w = Window.partitionBy(stratum_col).orderBy(h, id_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def deterministic_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float] | None = None,
    seed: str = "split-v1",
    split_col: str = "split",
) -> DataFrame:
    """Assign each row a stable split label from md5(seed ':' id).

    Changing ``seed`` re-shuffles membership wholesale; appending rows
    never moves existing ones between splits.
    """
    if weights is None:
        weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    bucket = F.substring(
        F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string"))), 1, 2
    )
    expr = None
    for name, bound in split_boundaries(weights):
        cond = bucket < F.lit(bound)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn(split_col, expr)


def deterministic_split_sql(
    id_col: str,
    weights: dict[str, float] | None = None,
    seed: str = "split-v1",
) -> str:
    """The SAME assignment as ANSI-ish SQL (DuckDB-compatible) — the oracle
    half, and what an auditor would run."""
    if weights is None:
        weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    # STRING (not VARCHAR) is the one text-cast spelling BOTH engines parse:
    # Spark rejects bare VARCHAR (needs a length), DuckDB aliases STRING=VARCHAR.
    bucket = f"substr(md5(concat_ws(':', '{seed}', CAST({id_col} AS STRING))), 1, 2)"
    parts = [
        f"WHEN {bucket} < '{bound}' THEN '{name}'"
        for name, bound in split_boundaries(weights)
    ]
    return "CASE " + " ".join(parts) + " END"


def token_budget_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    text_col: str = "text",
    budget: int = 2000,
    seed: str = "budget-v1",
) -> DataFrame:
    """Greedy per-stratum sampling to a token budget: order each stratum's
    documents by a seeded md5 key (deterministic, engine-portable — the
    same keying deterministic_split uses) and keep documents while the
    running token total stays within ``budget``. The standard mixture-
    construction step: 'take ~N tokens per domain, stably'.

    One shuffle (the per-stratum sort window). At 100 TB a stratum's rows
    share a window partition, so strata must be finer than executor memory
    — the natural fix is sub-bucketing big strata by a hash prefix and
    budgeting per sub-bucket (the window never needs the whole corpus).
    Returns (id, stratum, n_tokens, cum_tokens) for kept documents."""
    from pyspark.sql.window import Window

    key = F.md5(
        F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string"))
    )
    ntok = F.size(F.split(F.col(text_col), " "))
    w = Window.partitionBy(stratum_col).orderBy(key, id_col)
    return (
        df.select(
            F.col(id_col),
            F.col(stratum_col),
            ntok.alias("n_tokens"),
            F.sum(ntok).over(w).alias("cum_tokens"),
        )
        .filter(F.col("cum_tokens") <= budget)
    )
