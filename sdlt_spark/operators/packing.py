"""Sequence packing and mixture construction for training-data pipelines.

Two operators a pre-training data pipeline runs after filtering/dedup,
immediately before writing training shards:

- :func:`pack_sequences` — assign every document to a training-sequence
  bin by cumulative token count in a deterministic global order (the
  "pack documents into 4096-token sequences" step). The global running
  sum is computed scalably: quantile-derived ordered chunks, per-chunk
  subtotals (map-side combined, bounded driver state), broadcast chunk
  offsets, then ONE corpus shuffle for the within-chunk window. No
  single-partition global window anywhere in the plan.
- :func:`mixture_sample` — draw a fixed-size corpus whose domain
  proportions match target mixture weights (the "70% web / 20% code /
  10% books" step), deterministically: per-stratum quotas over a seeded
  md5 order, re-runnable and append-stable like
  ``sampling.deterministic_split``.

Both have exact ANSI-SQL twins (the ``*_sql`` helpers) so the driver's
DuckDB oracle checks them value-for-value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "pack_sequences",
    "pack_sequences_sql",
    "mixture_sample",
    "mixture_sample_sql",
]


def _portable_token_count(text_col: str) -> Column:
    """Whitespace token count with NULL -> 0 — the same split('  ', ' ')
    semantics (empty string = 1 token, consecutive blanks produce empty
    tokens) in Spark and DuckDB, so the oracle matches byte-for-byte."""
    return F.when(F.col(text_col).isNull(), F.lit(0)).otherwise(
        F.size(F.split(F.col(text_col), " "))
    )


def _token_count_sql(text_col: str) -> str:
    return (
        f"CASE WHEN {text_col} IS NULL THEN 0 "
        f"ELSE len(string_split({text_col}, ' ')) END"
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 4096,
    num_chunks: int | None = None,
) -> DataFrame:
    """Assign each document to a training-sequence bin: documents are
    taken in ``id_col`` order and ``bin = ceil(cum_tokens / budget)``
    where ``cum_tokens`` is the inclusive running token total. Bin *i*
    therefore holds the documents whose cumulative total first crosses
    ``(i-1)*budget`` — the deterministic first-fit packing a sequential
    packer produces when documents may straddle a boundary (each bin's
    overflow is bounded by one document; trainers that hard-truncate do
    so downstream). Returns ``(id, n_tokens, bin)`` for every row.

    Plan shape (the scalable global-prefix-sum pattern): a cumulative sum
    over a total order is the textbook "everything in one window
    partition" trap — ``SUM() OVER (ORDER BY id)`` puts the corpus on one
    task. Instead:

    1. chunk boundaries from ``approxQuantile`` over ``id_col`` (one
       column-pruned pass; boundaries are a bounded driver-side list, and
       the RESULT is invariant to where they land — only balance moves);
    2. per-chunk token subtotals via partial-aggregated ``groupBy`` (the
       shuffle carries ``num_chunks`` rows);
    3. chunk offsets = exclusive running sum of subtotals on the driver
       (bounded: one long per chunk), re-broadcast as a literal CASE map;
    4. ONE corpus shuffle: a window partitioned BY CHUNK ordered by id,
       plus the chunk's offset.

    ``num_chunks`` defaults to 4x the default parallelism; at cluster
    scale size it so a chunk's rows (~corpus/num_chunks) fit a window
    sort comfortably (the sort spills gracefully past that). Token
    counting is the portable whitespace split (NULL text counts 0), the
    same contract as ``sampling.token_budget_sample``.
    """
    spark = df.sparkSession
    if num_chunks is None:
        num_chunks = 4 * spark.sparkContext.defaultParallelism
    base = df.select(
        F.col(id_col), _portable_token_count(text_col).alias("n_tokens")
    )
    # interior quantile boundaries: num_chunks-1 cut points, left-closed
    probs = [i / num_chunks for i in range(1, num_chunks)]
    bounds = sorted(set(base.approxQuantile(id_col, probs, 0.001)))
    chunk = F.lit(0)
    for b in bounds:  # codegen'd comparison chain, <= num_chunks terms
        chunk = chunk + (F.col(id_col) > F.lit(b)).cast("int")
    chunked = base.withColumn("__chunk", chunk)
    # bounded driver state: one (chunk, subtotal) row per chunk
    subtotals = {
        r["__chunk"]: r["t"]
        for r in chunked.groupBy("__chunk")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    }
    offsets, acc = {}, 0
    for c in sorted(subtotals):
        offsets[c] = acc
        acc += subtotals[c]
    off = F.lit(0)
    for c, o in offsets.items():
        if o:
            off = F.when(F.col("__chunk") == c, F.lit(o)).otherwise(off)
    w = Window.partitionBy("__chunk").orderBy(id_col)
    cum = off + F.sum("n_tokens").over(w)
    return chunked.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.ceil(cum / F.lit(float(budget))).cast("bigint").alias("bin"),
    )


def pack_sequences_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text", budget: int = 4096
) -> str:
    """The exact packing as one ANSI window query (the oracle / audit
    form — correct, but single-partition over a total order; the operator
    exists precisely to avoid executing this shape at scale)."""
    return f"""
    WITH t AS (
      SELECT {id_col}, {_token_count_sql(text_col)} AS n_tokens FROM {table}
    )
    SELECT {id_col}, n_tokens,
           CAST(ceil(SUM(n_tokens) OVER (ORDER BY {id_col}
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     / {float(budget)}) AS BIGINT) AS bin
    FROM t
    """


def _quotas(weights: dict[str, float], total: int) -> dict[str, int]:
    s = sum(weights.values())
    return {k: int(total * v / s) for k, v in weights.items()}


def mixture_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    weights: dict[str, float],
    total: int,
    seed: str = "mix-v1",
) -> DataFrame:
    """Draw ~``total`` rows whose ``stratum_col`` proportions match
    ``weights`` (normalized): stratum *g* contributes
    ``floor(total * w_g / sum(w))`` rows — fewer only if the stratum runs
    out — chosen by seeded-md5 order, the same deterministic keying as
    ``sampling.deterministic_split`` (re-runnable; appending rows never
    evicts chosen ones unless they hash earlier). Strata absent from
    ``weights`` are dropped — the mixture is a whitelist. One window
    shuffle on the stratum key; quotas ride as a literal CASE map, so no
    join and no driver-side corpus state."""
    quotas = _quotas(weights, total)
    quota = F.lit(0)
    for g, q in quotas.items():
        quota = F.when(F.col(stratum_col) == g, F.lit(q)).otherwise(quota)
    h = F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string")))
    w = Window.partitionBy(stratum_col).orderBy(h, id_col)
    return (
        df.filter(F.col(stratum_col).isin(*quotas))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= quota)
        .drop("__rn")
    )


def mixture_sample_sql(
    table: str,
    stratum_col: str,
    id_col: str,
    weights: dict[str, float],
    total: int,
    seed: str = "mix-v1",
    select_cols: str = "*",
) -> str:
    """The same draw in portable SQL (oracle / audit form)."""
    quotas = _quotas(weights, total)
    in_list = ", ".join(f"'{g}'" for g in quotas)
    quota_case = (
        "CASE "
        + " ".join(f"WHEN {stratum_col} = '{g}' THEN {q}" for g, q in quotas.items())
        + " ELSE 0 END"
    )
    return f"""
    SELECT {select_cols} FROM (
      SELECT *, row_number() OVER (
               PARTITION BY {stratum_col}
               ORDER BY md5(concat_ws(':', '{seed}', CAST({id_col} AS STRING))),
                        {id_col}) AS __rn
      FROM {table} WHERE {stratum_col} IN ({in_list})
    ) WHERE __rn <= {quota_case}
    """
