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

import math
from fractions import Fraction

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
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
    chunked_min_bytes: int = 1 << 28,
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

    Precondition: ``id_col`` must be numeric (approxQuantile's contract)
    and non-NULL (a total order has no position for NULL) — both raise a
    clear ValueError rather than failing downstream. Validation timing
    diverges by plan: the chunked path raises EAGERLY (its subtotal
    control job sees the NULL chunk), while the small-input plan below is
    deliberately one lazy job, so its NULL check rides the plan as a
    ``raise_error`` branch on BOTH computed columns (``n_tokens`` and
    ``bin``) — it surfaces at first execution of either, and cannot be
    pruned away by any projection that consumes a computed value.

    Small inputs take the single-window plan directly: the chunked shape
    pays three eager control jobs (quantile pass, compact-frame
    checkpoint, subtotal collect) that exist to keep any ONE task's sort
    bounded — pure overhead when the whole corpus sorts comfortably in
    one task. Below ``chunked_min_bytes`` of optimizer-estimated input
    (default 256 MiB; the window sorts ~20-byte (id, n_tokens) rows, and
    tokenization still runs map-parallel BEFORE the exchange) the
    operator emits exactly the oracle's ``SUM() OVER (ORDER BY id)``
    form — one lazy job, identical rows (pinned by the chunk-count
    invariance test, which proves bin assignment is chunking-invariant).
    Unknown statistics (in-memory relations) are treated as large — the
    conservative choice, and what keeps every plan-shape/NULL test on
    the chunked path.
    """
    spark = df.sparkSession
    if num_chunks is None:
        num_chunks = 4 * spark.sparkContext.defaultParallelism
    id_type = df.schema[id_col].dataType
    if not isinstance(id_type, T.NumericType):
        raise ValueError(
            f"pack_sequences requires a numeric id column for its quantile "
            f"chunking; {id_col!r} is {id_type.simpleString()}"
        )
    base = df.select(
        F.col(id_col),
        # long, matching the SQL twin's len() type
        _portable_token_count(text_col).cast("long").alias("n_tokens"),
    )
    if chunked_min_bytes:
        size = _plan_size_bytes(df)
        if size is not None and size < chunked_min_bytes:
            w = Window.orderBy(id_col).rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
            bin_col = F.ceil(F.sum("n_tokens").over(w) / F.lit(float(budget)))
            # the NULL-id guard rides EVERY computed column (not just bin):
            # this path's validation is lazy by design (one job is the
            # whole point), and a caller projecting only (id, n_tokens)
            # would silently prune a bin-only raise_error — so n_tokens
            # carries the same branch and the check survives any
            # projection that consumes a computed value (ADVICE round 12)
            null_guard = F.raise_error(
                F.lit(
                    f"pack_sequences requires non-NULL {id_col!r} "
                    "values: packing is a total order over ids and "
                    "NULL has no position in it"
                )
            )
            return base.select(
                F.col(id_col),
                F.when(F.col(id_col).isNull(), null_guard.cast("bigint"))
                .otherwise(F.col("n_tokens"))
                .alias("n_tokens"),
                F.when(F.col(id_col).isNull(), null_guard.cast("bigint"))
                .otherwise(bin_col.cast("bigint"))
                .alias("bin"),
            )
    # interior quantile boundaries: num_chunks-1 cut points, left-closed
    probs = [i / num_chunks for i in range(1, num_chunks)]
    bounds = sorted(set(base.approxQuantile(id_col, probs, 0.001)))
    chunk = F.lit(0)
    for b in bounds:  # codegen'd comparison chain, <= num_chunks terms
        chunk = chunk + (F.col(id_col) > F.lit(b)).cast("int")
    # NULL ids have no position in the total order; route them to a NULL
    # chunk so the subtotal pass below rejects them with a clear error
    # even when bounds is empty (constant-id or single-chunk corpora)
    chunk = F.when(F.col(id_col).isNull(), F.lit(None)).otherwise(chunk)
    # checkpoint the COMPACT frame (id, n_tokens, chunk — ~20 bytes/row):
    # the subtotal pass and the window pass would otherwise each re-scan
    # and re-tokenize the full text column (measured ~2x at sf10); the
    # checkpoint's blocks are O(ids), never O(text), and are reclaimed by
    # the ContextCleaner when the result frame is dropped
    chunked = base.withColumn("__chunk", chunk).localCheckpoint(eager=True)
    # bounded driver state: one (chunk, subtotal) row per chunk
    subtotals = {
        r["__chunk"]: r["t"]
        for r in chunked.groupBy("__chunk")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    }
    if None in subtotals:
        # a NULL id compares NULL against every boundary, landing in a
        # NULL chunk with no defined position in the global order
        raise ValueError(
            f"pack_sequences requires non-NULL {id_col!r} values: packing "
            "is a total order over ids and NULL has no position in it"
        )
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
    """Largest-remainder apportionment of ``total`` across ``weights``:
    each stratum gets floor(total * w / sum(w)) and the leftover seats go
    to the largest fractional remainders (ties broken by stratum key for
    determinism). Exact arithmetic via Fraction so float representation
    error can never drop a seat; sum(quotas) == total always. Both the
    Spark operator and the SQL oracle embed these Python-computed quotas,
    so they stay in lockstep by construction."""
    fracs = {k: Fraction(v).limit_denominator(10**12) for k, v in weights.items()}
    s = sum(fracs.values())
    exact = {k: total * v / s for k, v in fracs.items()}
    base = {k: math.floor(e) for k, e in exact.items()}
    leftover = total - sum(base.values())
    by_remainder = sorted(
        weights, key=lambda k: (exact[k] - base[k], k), reverse=True
    )
    for k in by_remainder[:leftover]:
        base[k] += 1
    return base


def _mix_hash(seed: str, id_col: str) -> Column:
    return F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string")))


def _plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's sizeInBytes statistic for ``df``'s optimized plan — for a
    file scan this is driver-side metadata (sum of file sizes scaled by
    filter selectivity), no job runs. Returns None when the stat is
    unavailable (exotic plans, API drift) so callers fall back to the
    conservative path."""
    try:
        stat = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        # py4j maps scala BigInt to a python int; fall back to the decimal
        # string for bridge versions that hand back the java object
        return stat if isinstance(stat, int) else int(stat.toString())
    except Exception:  # noqa: BLE001 — stats are an optimization, never required
        return None


def _prefilter_thresholds(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    quotas: dict[str, int],
    seed: str,
) -> dict[str, str] | None:
    """Per-stratum 15-hex-digit md5-prefix bounds such that filtering to
    ``prefix <= bound`` provably preserves the top-``quota`` rows of the
    seeded order, while shrinking each window partition to O(quota).

    Exactness argument: the survivor set {prefix <= bound} is downward-
    closed under the (md5, id) selection order — if a survives and b's
    hash sorts before a's, b's prefix <= a's prefix, so b survives too.
    Hence whenever a stratum keeps >= min(quota, |stratum|) survivors,
    its top-quota over survivors equals its top-quota over the whole
    stratum. We VERIFY that count per stratum (one pruned aggregate over
    the prefix indicator — the hashes are data-deterministic, not random
    at run time) and keep everything for any stratum that undershoots,
    so the operator is exact unconditionally, not just w.h.p.

    The bound targets quota + 6*sqrt(quota) + 64 expected survivors — a
    Binomial mean 8+ standard deviations above the quota — so the
    verified fallback is astronomically rare on real corpora. Returns
    None when no stratum is large enough to bother prefiltering (the
    plain window is already O(quota) there)."""
    counts = {
        r[0]: r[1]
        for r in df.filter(F.col(stratum_col).isin(*quotas))
        .groupBy(stratum_col)
        .agg(F.count(F.lit(1)))
        .collect()
    }
    bounds: dict[str, str] = {}
    for g, n in counts.items():
        q = quotas[g]
        margin = q + 6 * math.isqrt(q) + 64
        if n <= margin:
            continue  # small stratum: the window input is already bounded
        frac = Fraction(margin, n)
        cut = min(16**15 - 1, (frac.numerator * 16**15) // frac.denominator)
        bounds[g] = format(cut, "015x")
    if not bounds:
        return None
    prefix = F.substring(_mix_hash(seed, id_col), 1, 15)
    keep = F.lit(None).cast("boolean")
    for g, b in bounds.items():
        keep = F.when(F.col(stratum_col) == g, prefix <= F.lit(b)).otherwise(keep)
    survivors = {
        r[0]: r[1]
        for r in df.filter(F.col(stratum_col).isin(*bounds))
        .groupBy(stratum_col)
        .agg(F.sum(keep.cast("int")))
        .collect()
    }
    # exactness guard: a stratum whose survivor count fell below its
    # quota (possible only under extreme hash skew) keeps all its rows
    return {
        g: b
        for g, b in bounds.items()
        if survivors.get(g, 0) >= min(quotas[g], counts[g])
    } or None


def mixture_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    weights: dict[str, float],
    total: int,
    seed: str = "mix-v1",
    prefilter: bool = True,
    prefilter_min_bytes: int = 1 << 30,
) -> DataFrame:
    """Draw ``total`` rows whose ``stratum_col`` proportions match
    ``weights`` (normalized, largest-remainder apportioned so the draw
    hits ``total`` exactly) — fewer only if a stratum runs out — chosen
    by seeded-md5 order, the same deterministic keying as
    ``sampling.deterministic_split`` (re-runnable; appending rows never
    evicts chosen ones unless they hash earlier). Strata absent from
    ``weights`` are dropped — the mixture is a whitelist.

    Scale shape: quotas are small constants, so windowing each FULL
    stratum (``row_number`` over ``PARTITION BY stratum``) would sort a
    whole domain — half the corpus — through one task. Instead a seeded
    md5-prefix threshold prefilters each large stratum to O(quota) rows
    (bounds derived from one pruned count aggregate; exactness verified,
    see :func:`_prefilter_thresholds`) BEFORE the quota window, so no
    window partition ever exceeds ~quota + 6*sqrt(quota) + 64 rows. The
    quota window itself then touches only ~total rows regardless of
    corpus size. Quotas ride as a literal CASE map — no join, no
    driver-side corpus state beyond one row per stratum.

    The prefilter itself costs two eager aggregate jobs (stratum counts +
    survivor verification), pure overhead when the input is small enough
    that every window partition sorts comfortably in one task. So it
    engages only past ``prefilter_min_bytes`` of optimizer-estimated
    input (default 1 GiB — a single-task external sort handles that; the
    prefilter targets strata orders of magnitude beyond it), read from
    Catalyst's plan statistics: O(1) driver metadata, zero jobs, so a
    small-corpus draw is ONE lazy plan exactly like the pre-prefilter
    operator. Unknown size (no stats) is treated as large — the
    conservative choice at 100 TB."""
    quotas = _quotas(weights, total)
    quota = F.lit(0)
    for g, q in quotas.items():
        quota = F.when(F.col(stratum_col) == g, F.lit(q)).otherwise(quota)
    h = _mix_hash(seed, id_col)
    base = df.filter(F.col(stratum_col).isin(*quotas))
    if prefilter:
        size = _plan_size_bytes(df)
        if size is not None and size < prefilter_min_bytes:
            prefilter = False
    if prefilter:
        bounds = _prefilter_thresholds(df, stratum_col, id_col, quotas, seed)
        if bounds:
            prefix = F.substring(h, 1, 15)
            keep = F.lit(True)
            for g, b in bounds.items():
                keep = F.when(
                    F.col(stratum_col) == g, prefix <= F.lit(b)
                ).otherwise(keep)
            base = base.filter(keep)
    w = Window.partitionBy(stratum_col).orderBy(h, id_col)
    return (
        base.withColumn("__rn", F.row_number().over(w))
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
    """The same draw in portable SQL (oracle / audit form — exact, but
    windows each full stratum; the operator's prefilter exists to avoid
    executing that shape at scale)."""

    def lit(s: str) -> str:  # SQL string literal, quotes doubled
        return "'" + s.replace("'", "''") + "'"

    quotas = _quotas(weights, total)
    in_list = ", ".join(lit(g) for g in quotas)
    quota_case = (
        "CASE "
        + " ".join(
            f"WHEN {stratum_col} = {lit(g)} THEN {q}" for g, q in quotas.items()
        )
        + " ELSE 0 END"
    )
    return f"""
    SELECT {select_cols} FROM (
      SELECT *, row_number() OVER (
               PARTITION BY {stratum_col}
               ORDER BY md5(concat_ws(':', {lit(seed)}, CAST({id_col} AS STRING))),
                        {id_col}) AS __rn
      FROM {table} WHERE {stratum_col} IN ({in_list})
    ) WHERE __rn <= {quota_case}
    """
