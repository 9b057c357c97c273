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


# ---------------------------------------------------------------------------
# DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
# arXiv:2302.03169): score raw documents by how target-like their hashed
# n-gram distribution is, then keep the top-weighted slice. The standard
# "make CommonCrawl look like Wikipedia" pretraining-mixture step.
# ---------------------------------------------------------------------------


def hashed_ngram_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
) -> DataFrame:
    """(id, __b) rows: every unigram and bigram OCCURRENCE hashed into
    ``n_buckets`` via the engine-portable md5 hash (the same
    ``portable_hash31`` the minhash family uses, so the DuckDB oracle can
    replay it). Codegen'd HOFs build the gram list; the md5 runs once per
    exploded gram in a JVM projection — no Python anywhere."""
    from sdlt_spark.operators.dedup import portable_hash31

    toks = F.split(F.col(text_col), " ")
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat_ws(
                "_", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(
        F.col(id_col), F.explode(F.concat(toks, bigrams)).alias("__g")
    ).select(
        id_col,
        (portable_hash31(F.col("__g")) % F.lit(n_buckets)).alias("__b"),
    )


def dsir_weights(
    df: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
) -> DataFrame:
    """Per-document DSIR importance weight: ``log_w = sum over the doc's
    hashed n-gram occurrences of log p_target(b) - log p_raw(b)`` with
    Laplace-smoothed bucket unigram models (p(b) = (c_b + 1) / (N + B)).
    Returns (id, n_grams, log_w) for every row of ``df``; null-text docs
    get weight 0 (an empty string still carries one empty unigram, the
    same as the SQL oracle's string_split).

    Plan shape: two bounded aggregations build the B-row bucket models
    (B = ``n_buckets``, constant — the models land on the DRIVER and
    re-broadcast at any corpus size, the same bounded-driver-state class
    as k-means centroids); scoring is the exploded gram table joined to
    the broadcast ratio map plus ONE shuffle keyed by document id with
    map-side partial sums. No persist() (a long-lived session must not
    accumulate cache entries per call) and each gram table's lineage
    evaluates exactly twice: model aggregation + scoring pass.

    Float discipline (for the exact DuckDB parity oracle): each bucket's
    log-ratio is computed in a fixed algebraic form and rounded to 12
    decimals BEFORE the per-doc sum, so engine libm last-ulp differences
    and summation-order noise stay ~1e-12 — invisible at the advertised
    4-decimal output precision.

    Pass discipline: an under-parallel scan (one small file = one task)
    is repartitioned so the explode+md5 — the dominant cost — uses every
    core. The gram table itself is deliberately NOT persisted — it is
    O(token occurrences), corpus-sized at 100 TB."""
    import math

    from sdlt_spark.operators.dedup import _scan_underparallel

    par = df.sparkSession.sparkContext.defaultParallelism
    # gate EACH input on its own layout: the common shape is a
    # well-partitioned raw corpus with a single-file target (make CC look
    # like Wikipedia), where only the target's model pass would serialize.
    # Only the GRAM pass (explode+md5, the dominant cost) reads the
    # repartitioned frame: the final id-list join branch reads `df`
    # directly — it needs a hash exchange on id_col anyway, so routing it
    # through the round-robin repartition just stacked a second Exchange
    # under the join's (plan: RoundRobin(32) -> hashpartitioning(doc_id)).
    raw_docs = df.repartition(par) if _scan_underparallel(df) else df
    if _scan_underparallel(target):
        target = target.repartition(par)
    raw_g = hashed_ngram_buckets(raw_docs, id_col, text_col, n_buckets)
    tgt_g = hashed_ngram_buckets(target, id_col, text_col, n_buckets)
    # bounded driver state: <= n_buckets rows per model, by construction
    rc = {
        r["__b"]: r["__cr"]
        for r in raw_g.groupBy("__b")
        .agg(F.count(F.lit(1)).alias("__cr"))
        .collect()
    }
    tc = {
        r["__b"]: r["__ct"]
        for r in tgt_g.groupBy("__b")
        .agg(F.count(F.lit(1)).alias("__ct"))
        .collect()
    }
    n_raw = sum(rc.values())
    n_tgt = sum(tc.values())
    # raw-side buckets cover every bucket any scored doc touches; the
    # log-ratio is computed ONCE per bucket on the driver (same libm, same
    # 12-decimal rounding as the SQL oracle)
    ratio_rows = [
        (
            int(b),
            round(
                math.log(tc.get(b, 0) + 1.0)
                - math.log(float(n_tgt + n_buckets))
                - math.log(cr + 1.0)
                + math.log(float(n_raw + n_buckets)),
                12,
            ),
        )
        for b, cr in rc.items()
    ]
    ratio = df.sparkSession.createDataFrame(
        ratio_rows, "__b long, __lr double"
    )
    scored = (
        raw_g.join(F.broadcast(ratio), on="__b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.round(F.sum("__lr"), 4).alias("log_w"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).cast("int").alias("n_grams"),
            F.coalesce("log_w", F.lit(0.0)).alias("log_w"),
        )
    )


def dsir_topk(
    df: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
) -> DataFrame:
    """The selection step: keep the ``k`` most target-like documents by
    DSIR weight (deterministic tie-break on id — resampling with Gumbel
    noise is the paper's variant for diversity; a seeded Gumbel column
    would slot in here). TakeOrdered plan: no global sort materializes."""
    w = dsir_weights(df, target, id_col, text_col, n_buckets)
    return w.orderBy(F.col("log_w").desc(), F.col(id_col)).limit(k)


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    n: int,
    seed: str = "wsample-v1",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via Efraimidis-Spirakis
    exponential keys (Information Processing Letters 2006): each row
    draws key = ln(u)/w with u a seeded md5-uniform in (0, 1], and the
    global top-``n`` keys are exactly a weight-proportional sample
    drawn without replacement. The mixture-construction workhorse when
    quotas must follow a quality or importance weight rather than a
    stratum.

    Deterministic (seeded hash, no RNG state), append-stable per id, and
    single-pass: the plan is a map-only key computation into a
    distributed TakeOrderedAndProject — per-partition top-n heaps, no
    corpus shuffle, no driver data path.

    Rows with NULL or non-positive weight are excluded (selection
    probability proportional to a weight of 0 is 0; a negative weight is
    meaningless and would otherwise always outrank every valid row —
    and a zero weight would be a DIVIDE_BY_ZERO under Spark's default
    ANSI mode). Float discipline: ln(u) rounds to 12 decimals BEFORE the
    exact IEEE division by the weight, so engine libm last-ulp noise on
    the log cannot flip the selection boundary while the key keeps the
    weight's full dynamic range (rounding the quotient would collapse
    keys to 0 for very large weights); ties break on id. The same
    expression is portable ANSI SQL for the audit side."""
    # u = (first 13 md5 hex digits + 1) / (16^13 + 1): 52 bits, exact in
    # a double, never 0 (ln(0) would be -inf on one engine, an error on
    # another)
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.lit(seed), F.col(id_col).cast("string")
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(16**13) + 1.0)
    key = F.round(F.log(u), 12) / F.col(weight_col)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__es_key", key)
        .orderBy(F.col("__es_key").desc(), F.col(id_col))
        .limit(n)
        .drop("__es_key")
    )
