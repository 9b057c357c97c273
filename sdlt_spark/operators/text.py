"""Text-analysis operators for LLM-data pipelines (SURVEY.md §2.11 X4 +
north-star extensions): token stats, quality scoring, language-ID heuristic,
document fingerprinting.

Everything here is built-in-expression only (split/filter/size/regexp/md5 —
JVM-side, whole-stage codegen'd); no Python runs per row, so these scale to
100 TB as pure map-side work with zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny per-language stopword profiles for the n-gram/stopword heuristic.
# Deliberately small: the operator demonstrates the scoring plumbing; a real
# deployment swaps in fastText or CLD3 via mapInPandas (see multimodal.py for
# the pattern).
LANG_PROFILES: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "en": ["the", "a", "and", "is", "of", "to", "in", "that"],
    "es": ["el", "la", "los", "y", "es", "de", "que", "un"],
    "fr": ["le", "la", "les", "et", "est", "de", "que", "un"],
}

def tokens(text: Column | str) -> Column:
    """Whitespace tokenization as an array column."""
    return F.split(text, " ")


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document token counts + quality ratios (length, punctuation,
    stopword density) — the classic pre-training quality signals."""
    toks = tokens(F.col(text_col))
    stop_arr = F.array(*[F.lit(w) for w in LANG_PROFILES["en"]])
    n_tokens = F.size(toks)
    return df.withColumns(
        {
            "n_tokens": n_tokens,
            "n_chars": F.length(text_col).cast("long"),
            "chars_per_token": F.round(F.length(text_col).cast("double") / n_tokens, 4),
            "punct_ratio": F.round(
                F.length(F.regexp_replace(text_col, r"[a-zA-Z0-9\s]", "")).cast("double")
                # nullif: an EMPTY document (which exact_substring_dedup /
                # remove_boilerplate legitimately emit) must read a null
                # ratio, not ANSI-DIVIDE_BY_ZERO the whole job
                / F.nullif(F.length(text_col), F.lit(0)),
                4,
            ),
            "stopword_ratio": F.round(
                F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast("double")
                / n_tokens,
                4,
            ),
        }
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite 0..1 quality score from the token stats (heuristic in the
    spirit of C4/Gopher filtering rules, SQL-expressible end to end)."""
    stats = token_stats(df, text_col)
    return stats.withColumn(
        "quality",
        F.round(
            (F.when(F.col("n_tokens") >= 10, 0.4).otherwise(0.0))
            + (F.when((F.col("chars_per_token") >= 3) & (F.col("chars_per_token") <= 12), 0.3).otherwise(0.0))
            + (F.when(F.col("punct_ratio") <= 0.2, 0.3).otherwise(0.0)),
            2,
        ),
    )


def language_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-profile language scores + argmax prediction (n-gram/stopword
    heuristic language-ID). Deterministic tiebreak: first language in sorted
    order wins (the CASE chain below)."""
    toks = tokens(F.col(text_col))
    out = df

    def _score(words: list[str]):
        arr = F.array(*[F.lit(w) for w in words])
        # single-parameter lambda only: PySpark reads a 2nd param as the index
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    for lang in sorted(LANG_PROFILES):
        out = out.withColumn(f"score_{lang}", _score(LANG_PROFILES[lang]))
    langs = sorted(LANG_PROFILES)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.lit(None).cast("string")
    expr = None
    for lang in langs:
        cond = F.col(f"score_{lang}") == best
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    out = out.withColumn("pred_lang", expr)
    return out


# GPT-2-style pre-tokenizer pattern, ASCII subset: contractions, letter
# runs, digit runs, punctuation runs (each optionally space-prefixed),
# residual whitespace. Plain alternation/classes only, and whitespace is an
# EXPLICIT class: Java's \s includes vertical tab (\x0B), RE2's does not,
# so a \s-based pattern diverges between Spark and DuckDB on \x0B.
_WS = " \\t\\n\\f\\r"
BPE_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+"
    rf"| ?[^{_WS}a-zA-Z0-9]+|[{_WS}]+"
)


def bpe_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Pre-tokenizer token counts: BPE-ish regex segments (the unit LLM
    tokenizers split on before merges — a good proxy for real token cost)
    next to whitespace words. regexp_count is JVM-side codegen'd map work;
    no shuffle, no Python."""
    return df.withColumns(
        {
            "n_bpe_tokens": F.regexp_count(F.col(text_col), F.lit(BPE_PATTERN)).cast("long"),
            "n_ws_tokens": F.size(tokens(F.col(text_col))).cast("long"),
        }
    )


def winnow_fingerprints(
    df: DataFrame, id_col: str, text_col: str = "text", k: int = 5, w: int = 4
) -> DataFrame:
    """Rolling-hash document fingerprints via winnowing (Schleimer et al.,
    SIGMOD'03 — the MOSS algorithm): hash every k-token shingle, then keep
    the minimum hash of each w-wide sliding window. Guarantees any shared
    run of >= w+k-1 tokens contributes a shared fingerprint, with ~2/(w+1)
    of the shingle hashes retained.

    Emits (id, fp) exploded — ready for an equi self-join to find local
    (passage-level) overlap that whole-document MinHash misses.

    Split: token hashing stays JVM-side — a codegen'd portable_hash31
    projection over posexploded token rows (md5-derived, so the DuckDB
    oracle reproduces every fingerprint; an earlier ``F.transform`` lambda
    form evaluated the md5 INTERPRETED per element), reassembled in token
    order by sorting the collected (pos, hash) structs; the rolling k-gram
    combine (polynomial mod 2^31-1, the same arithmetic the minhash band
    hashes use) and sliding-window min run as vectorized numpy over the
    int64 hash arrays in an Arrow-batched UDF. (A pure-expression
    formulation — slice+concat per shingle, then array_min(slice) per
    window — is interpreted per element and was ~50x slower: O(n*(k+w))
    object churn per document.) Documents shorter than k+w-1 tokens yield
    no fingerprints."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from sdlt_spark.operators.dedup import _BAND_K, MINHASH_PRIME, portable_hash31

    # NULL text: tokens(NULL) is NULL -> posexplode emits no row -> the doc
    # is absent, matching the previous form's empty-fingerprint output.
    tk = df.select(
        F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("__i", "__t")
    )
    th = tk.select(id_col, "__i", portable_hash31(F.col("__t")).alias("__h"))
    ordered = th.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("__i", "__h"))), lambda s: s["__h"]
        ).alias("__hs")
    )

    @pandas_udf("array<bigint>")
    def _winnow(col):
        out = []
        for v in col:
            if v is None:  # defensive: groups always carry >= 1 token now
                out.append([])
                continue
            a = np.asarray(v, dtype=np.int64)
            if len(a) < k + w - 1:
                out.append([])
                continue
            sw = np.lib.stride_tricks.sliding_window_view(a, k)
            # fold mod p: intermediates < p * _BAND_K ~ 2^51, exact in int64
            kh = np.zeros(len(sw), dtype=np.int64)
            for j in range(k):
                kh = (kh * _BAND_K + sw[:, j]) % MINHASH_PRIME
            wins = np.lib.stride_tricks.sliding_window_view(kh, w).min(axis=1)
            out.append(np.unique(wins).tolist())
        return pd.Series(out)

    return ordered.select(
        F.col(id_col), F.explode(_winnow("__hs")).alias("fp")
    )


def winnow_oracle_sql(
    table: str, id_col: str, text_col: str = "text", k: int = 5, w: int = 4
) -> str:
    """DuckDB SQL recomputing winnow_fingerprints exactly: per-position
    portable 31-bit token hashes, the k-term polynomial fold via lead()
    windows, the w-wide window min, then DISTINCT per document (matching
    the kernel's np.unique)."""
    from sdlt_spark.operators.dedup import _BAND_K, MINHASH_PRIME

    p = MINHASH_PRIME
    fold = "h"
    for j in range(1, k):
        fold = f"(({fold}) * {_BAND_K} + lead(h, {j}) OVER win) % {p}"
    return f"""
    WITH toks AS (
      SELECT {id_col}, string_split({text_col}, ' ') AS t FROM {table}
    ),
    th AS (
      SELECT {id_col}, u.i,
             CAST(('0x' || substr(md5(t[u.i]), 1, 8)) AS BIGINT) % {p} AS h
      FROM toks, LATERAL unnest(range(1, len(t) + 1)) AS u(i)
    ),
    kh AS (
      SELECT {id_col}, i, {fold} AS kh,
             lead(h, {k - 1}) OVER win AS last_tok
      FROM th
      WINDOW win AS (PARTITION BY {id_col} ORDER BY i)
    ),
    valid AS (SELECT {id_col}, i, kh FROM kh WHERE last_tok IS NOT NULL),
    wins AS (
      SELECT {id_col},
             min(kh) OVER (PARTITION BY {id_col} ORDER BY i
                           ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS fp,
             lead(kh, {w - 1}) OVER (PARTITION BY {id_col} ORDER BY i) AS wlast
      FROM valid
    )
    SELECT DISTINCT {id_col}, fp FROM wins WHERE wlast IS NOT NULL
    """


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fp") -> DataFrame:
    """Deterministic document fingerprint: md5 over the case/whitespace
    normalized text. Used as the exact-dedup key at scale (fixed-width key
    shuffles far cheaper than full documents)."""
    return df.withColumn(out_col, F.md5(F.lower(F.trim(F.col(text_col)))))


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021 §A1.1:
    high duplicate-n-gram fraction marks boilerplate/spam for pre-training
    filters):

    - ``dup_token_frac``  — fraction of token occurrences whose token occurs
      more than once in the document;
    - ``token_entropy``   — Shannon entropy (bits) of the unigram
      distribution, via the shuffle-free identity
      H = log2(n) - sum(c*log2(c))/n over per-token counts;
    - ``top_bigram_frac`` — fraction of bigram occurrences taken by the most
      frequent bigram.

    Shape for 100 TB: tokens/bigrams are exploded then counted with
    map-side-combinable groupBys keyed on (doc, gram) — no per-doc window,
    no Python, and the per-doc reductions that follow operate on the tiny
    count tables, not the corpus. Documents with fewer than two tokens are
    excluded (bigram stats undefined)."""
    toks = tokens(F.col(text_col))
    base = df.select(F.col(id_col), toks.alias("__toks")).filter(
        F.size("__toks") >= 2
    )
    uc = (
        base.select(id_col, F.explode("__toks").alias("g"))
        .groupBy(id_col, "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_uni = uc.groupBy(id_col).agg(
        F.sum("c").alias("n_tokens"),
        F.round(
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)) / F.sum("c"), 4
        ).alias("dup_token_frac"),
        F.sum(F.col("c") * F.log2("c")).alias("__slc"),
    )
    per_uni = per_uni.select(
        id_col,
        "n_tokens",
        "dup_token_frac",
        F.round(F.log2("n_tokens") - F.col("__slc") / F.col("n_tokens"), 4).alias(
            "token_entropy"
        ),
    )
    bigrams = F.expr(
        "transform(sequence(1, size(__toks) - 1),"
        " i -> concat(element_at(__toks, i), ' ', element_at(__toks, i + 1)))"
    )
    per_bi = (
        base.select(id_col, F.explode(bigrams).alias("bg"))
        .groupBy(id_col, "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(
            F.round(F.max("c") / F.sum("c"), 4).alias("top_bigram_frac")
        )
    )
    return per_uni.join(per_bi, id_col)


# ----------------------------------------------------------- PII redaction

# Patterns deliberately restricted to syntax Java regex (Spark) and RE2
# (DuckDB) interpret identically: char classes, bounded repetition, \b, \d.
# No lookaround, no backreferences. Order matters: email first (it would
# otherwise leave '@' orphans when its host part looks like a bare domain),
# then phone, then IPv4.
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("phone", r"\b\d{2,3}-\d{3}-\d{3,4}-\d{4}\b"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
]


def redact_pii(df: DataFrame, text_col: str = "text", out_col: str = "redacted") -> DataFrame:
    """Scrub emails / phone numbers / IPv4 addresses, replacing each match
    with a typed placeholder (<EMAIL>, <PHONE>, <IPV4>), and count matches
    per type (counted on the ORIGINAL text, so counts are independent of
    replacement order). Pure regexp expressions — map-only, codegen'd, no
    shuffle; at 100 TB this is a free rider on whatever scan feeds it.

    Redaction must run BEFORE near-dup hashing in a curation pipeline:
    redacted placeholders normalize documents that differ only in contact
    details, which is exactly the duplicate class PII scrubbing exists to
    expose."""
    counts = {
        f"n_{name}": F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
        for name, pat in PII_PATTERNS
    }
    red = F.col(text_col)
    for name, pat in PII_PATTERNS:
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
    return df.withColumns({**counts, out_col: red})


# ------------------------------------------------- corpus-level segment dedup


def remove_boilerplate(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    seg_len: int = 8,
    max_docs: int = 2,
) -> DataFrame:
    """RefinedWeb-style corpus-frequency segment removal: split every doc
    into consecutive ``seg_len``-token segments, drop each segment that
    occurs in more than ``max_docs`` DISTINCT documents (boilerplate:
    headers, footers, licence blocks), and reassemble the survivors in
    order. Returns (id, n_segs, n_kept, cleaned) for every document —
    ``cleaned`` is '' when everything was boilerplate.

    Scale shape: the corpus-frequency aggregation shuffles a 16-byte md5
    fingerprint per segment (never segment text); the removal anti-join is
    an equi join on the same fingerprint; reassembly is a bounded-size
    collect_list per document (a document's own segments), sorted by
    position. Three shuffles total, all on compact keys."""
    # NULL text must keep its row ('for every document'): coalesce to ''
    # -> one empty segment -> (id, 1, n_kept, '') instead of silently
    # vanishing from the posexplode
    df = df.withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
    toks = F.split(text_col, " ")
    nseg = F.ceil(F.size(toks) / F.lit(float(seg_len))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), nseg - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * seg_len + 1, seg_len)),
    )
    segs = df.select(F.col(id_col), F.posexplode(chunks).alias("pos", "seg")).withColumn(
        "fp", F.md5("seg")
    )
    boiler = (
        segs.groupBy("fp")
        .agg(F.count_distinct(id_col).alias("ndocs"))
        .filter(F.col("ndocs") > max_docs)
        .select("fp")
    )
    kept = segs.join(boiler, "fp", "left_anti")
    # per-doc segment totals need no third evaluation of the segs lineage
    # (tokenize + chunk + posexplode + a groupBy shuffle): posexplode
    # emits exactly nseg rows per document by construction, so the total
    # is the map-only nseg expression on the source rows — one full
    # corpus pass and one exchange removed from the plan (long cast
    # matches the count(*) column type the oracle expects)
    tot = df.select(F.col(id_col), nseg.cast("long").alias("n_segs"))
    agg = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg"))), lambda x: x["seg"]
            ),
            " ",
        ).alias("cleaned"),
    )
    return tot.join(agg, id_col, "left").select(
        F.col(id_col),
        "n_segs",
        F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
        F.coalesce("cleaned", F.lit("")).alias("cleaned"),
    )


# ------------------------------------------------------------------- URLs

URL_PATTERN = r"[hH][tT][tT][pP][sS]?://[^ \t\n\r]+"


def extract_urls(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """One row per URL occurrence: (id, url, host) with the URL normalized
    (lowercase, scheme and leading www. stripped, trailing slash stripped)
    — the canonical form a blocklist or frequency analysis keys on.
    Map-only regexp expressions + one explode; no shuffle."""
    raw = F.explode(
        F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), F.lit(0))
    ).alias("raw")
    ex = df.select(F.col(id_col), raw)
    url = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("raw")), r"^https?://", ""),
            r"^www\.",
            "",
        ),
        r"/$",
        "",
    )
    return ex.select(
        F.col(id_col),
        url.alias("url"),
        F.regexp_extract(url, r"^([^/?]+)", 1).alias("host"),
    )


def blocklist_filter(urls: DataFrame, blocklist: DataFrame, host_col: str = "host") -> DataFrame:
    """Tag each URL row with whether its host is blocklisted. The blocklist
    side is broadcast — real blocklists (millions of hosts, a few hundred
    MB) still fit executor memory, and broadcasting turns the check into a
    map-side hash probe with zero shuffle of the (huge) URL table."""
    b = F.broadcast(blocklist.select(F.col(host_col)).distinct().withColumn("__blocked", F.lit(True)))
    return (
        urls.join(b, host_col, "left")
        .withColumn("blocked", F.coalesce("__blocked", F.lit(False)))
        .drop("__blocked")
    )


def bpe_merge_table(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 5,
    sample_fraction: float | None = None,
    seed: int = 42,
) -> DataFrame:
    """Byte-pair-encoding-style vocabulary induction over the token corpus:
    repeatedly find the most frequent ADJACENT token pair and fuse it into
    one unit, recording (rank, left, right, merged, n) — the merge-table
    half of training a BPE tokenizer (here on whitespace tokens; character
    BPE is the same loop with `split(text, '')`).

    Distribution shape per iteration:
    - adjacent-pair counting is an explode + hash aggregate (one shuffle of
      (pair, count) with map-side combine — never sequence bodies);
    - the argmax pair is ONE collected row (count desc, then lexicographic
      tiebreak — deterministic), the same bounded-scalar driver traffic as
      k-means centroids or IVF training;
    - the merge application is an Arrow-batched pandas UDF doing the greedy
      left-to-right non-overlapping fuse per sequence (map-only, no
      shuffle), persisted so the next iteration starts from materialized
      sequences instead of a growing lineage.

    Iterative by nature (each merge changes the pair distribution), so this
    is declared rows-only — the unit test pins exact merges on a
    hand-computed corpus.

    SCALE BOUND: the loop is inherently ``num_merges`` sequential passes
    over whatever it iterates on, so at corpus scale pass
    ``sample_fraction`` — vocabulary induction on a bounded deterministic
    sample is standard practice (pair frequencies concentrate; a 100 TB
    corpus does not change the top pairs a 10 GB sample finds), turning
    the cost from O(corpus x merges) into O(sample x merges). Sampling is
    seeded so reruns induce the same vocabulary."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    spark = df.sparkSession
    if sample_fraction is not None and sample_fraction < 1.0:
        df = df.sample(fraction=sample_fraction, seed=seed)
    seqs = df.select(tokens(F.col(text_col)).alias("toks")).persist()
    seqs.count()
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(num_merges):
        pairs = seqs.select(
            F.explode(
                F.expr(
                    "CASE WHEN size(toks) >= 2 THEN "
                    "transform(sequence(0, size(toks) - 2), "
                    "j -> struct(toks[j] AS a, toks[j + 1] AS b)) "
                    "ELSE array() END"
                )
            ).alias("p")
        )
        top = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < 2:
            break
        a, b, n = top[0]["a"], top[0]["b"], top[0]["n"]
        merged = f"{a} {b}"
        merges.append((rank, a, b, merged, n))

        def _make_fuse(_a: str, _b: str, _m: str):
            @pandas_udf("array<string>")
            def _fuse(col):
                out = []
                for toks in col:
                    if toks is None:
                        out.append(None)
                        continue
                    res, i, L = [], 0, len(toks)
                    while i < L:
                        if i + 1 < L and toks[i] == _a and toks[i + 1] == _b:
                            res.append(_m)
                            i += 2
                        else:
                            res.append(toks[i])
                            i += 1
                    out.append(res)
                return pd.Series(out)

            return _fuse

        nxt = seqs.select(_make_fuse(a, b, merged)("toks").alias("toks")).persist()
        nxt.count()
        seqs.unpersist()
        seqs = nxt
    seqs.unpersist()
    return spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, n bigint"
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str = "text",
    bench_text_col: str | None = None,
    n: int = 8,
) -> DataFrame:
    """Benchmark-contamination detection: count, per training document, the
    distinct word ``n``-grams it shares with a held-out benchmark corpus —
    the standard pre-training decontamination step (strip eval questions
    that leaked into the crawl).

    Returns ``(id_col, n_hits, contaminated)`` for EVERY input document
    (``n_hits`` = distinct shared shingles, 0 for clean docs), so callers
    can either filter or audit.

    Scale shape: the benchmark side reduces to a DISTINCT shingle set —
    tiny next to a 100 TB corpus (a full eval suite is MBs) — so Catalyst
    broadcasts it and the corpus side stays a map-only scan + explode with
    NO corpus-wide shuffle: the only aggregation groups the (broadcast-)
    joined hits by doc id, and the left join back to ``docs`` keys on the
    id. Hot-shingle skew (a benchmark preamble shared by 100k+ training
    docs) needs no df-cap here, unlike the pair-emitting self-joins in
    ``dedup``: the distinct'ed benchmark side gives the join multiplicity
    <= 1 PER CORPUS SHINGLE OCCURRENCE, so output is bounded by the
    corpus' own shingle count — linear by construction, never d·(d-1)/2
    (pinned by tests/test_text.py::
    test_decontaminate_hot_shingle_preamble_is_linear). Shingles compare as md5 fingerprints is NOT done here — exact
    strings keep the oracle trivial and the join still broadcasts; switch
    the key to ``md5(ngram)`` if benchmark shingle bytes ever matter."""
    from sdlt_spark.operators.dedup import doc_ngrams

    bench_col = bench_text_col or text_col
    bench_grams = (
        doc_ngrams(
            benchmark.select(F.lit(0).alias("__bid"), F.col(bench_col)),
            "__bid",
            bench_col,
            n,
        )
        .select("ngram")
        .distinct()
    )
    hits = (
        doc_ngrams(docs, id_col, text_col, n)
        .join(bench_grams, "ngram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def bpe_apply(
    df: DataFrame,
    merges,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode each document with an induced BPE merge table — the APPLY
    half of the tokenizer story (:func:`bpe_merge_table` is the training
    half). Merges replay in rank order with the same greedy left-to-right
    non-overlapping fuse the induction used, so encoding the training
    corpus reproduces the token stream the induction ended on.

    ``merges``: the DataFrame returned by :func:`bpe_merge_table`, or a
    pre-collected ``[(left, right, merged), ...]`` list in rank order.
    The table is vocabulary-sized — bounded driver traffic, shipped to
    executors in the UDF closure (a broadcast in spirit and in cost).

    Returns ``(id, n_tokens, n_bpe_tokens, bpe_tokens)``. Invariant:
    joining ``bpe_tokens`` back with single spaces reproduces the
    whitespace token stream exactly (merged units keep their internal
    space), i.e. BPE segmentation is lossless — the property test pins
    this.

    Scale shape: ONE Arrow-batched ``mapInPandas`` pass, map-only, no
    shuffle; per-doc cost is O(len x n_merges) worst case (fine for the
    word-level vocabularies this induces; a character-BPE deployment with
    50k merges would swap the inner loop for the standard heap-merge
    encoder inside the same stage)."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    if isinstance(merges, DataFrame):
        rows = merges.orderBy("rank").collect()  # vocab-sized, bounded
        table = [(r["left"], r["right"], r["merged"]) for r in rows]
    else:
        table = [tuple(m) for m in merges]

    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("n_tokens", T.IntegerType(), True),
            T.StructField("n_bpe_tokens", T.IntegerType(), True),
            T.StructField("bpe_tokens", T.ArrayType(T.StringType()), True),
        ]
    )

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, n_raw, n_bpe, toks_out = [], [], [], []
            for did, text in zip(pdf["__id"], pdf["__text"]):
                ids.append(did)
                if text is None:
                    n_raw.append(None)
                    n_bpe.append(None)
                    toks_out.append(None)
                    continue
                toks = text.split(" ")
                n_raw.append(len(toks))
                for a, b, m in table:
                    if a not in toks:  # cheap skip: fuse needs a left hit
                        continue
                    res, i, L = [], 0, len(toks)
                    while i < L:
                        if i + 1 < L and toks[i] == a and toks[i + 1] == b:
                            res.append(m)
                            i += 2
                        else:
                            res.append(toks[i])
                            i += 1
                    toks = res
                n_bpe.append(len(toks))
                toks_out.append(toks)
            yield pd.DataFrame(
                {
                    "id": ids,
                    "n_tokens": pd.array(n_raw, dtype="Int32"),
                    "n_bpe_tokens": pd.array(n_bpe, dtype="Int32"),
                    "bpe_tokens": toks_out,
                }
            )

    return (
        df.select(
            F.col(id_col).cast("long").alias("__id"),
            F.col(text_col).alias("__text"),
        )
        .mapInPandas(_encode, out_schema)
        .withColumnRenamed("id", id_col)
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """CCNet-style statistical quality score: per-document mean negative
    log probability of each token given its predecessor, under an
    add-alpha-smoothed bigram model trained on the corpus itself
    (Wenzek et al., "CCNet", LREC'20 trains a KenLM 5-gram; the bigram
    form keeps the model a pure relational artifact). High score = rare
    transitions = boilerplate/noise; the standard pre-training filter is
    a percentile cut on this column.

    P(w2 | w1) = (c(w1,w2) + alpha) / (c(w1) + alpha * V), V = corpus
    vocabulary size. c(w1) is the CONTEXT count (occurrences of w1 with a
    successor), so probabilities sum to 1 over the vocabulary per context.

    Scale: bigram extraction is map-only (zip_with over two array slices —
    no posexplode + window shuffle for adjacency). ONE histogram
    aggregation shuffles compact (token-pair, count) rows; the context
    count rides the SAME relation as a window sum over it (c(w1) =
    sum of c(w1, *) partitioned by w1 — O(distinct bigrams) rows, never
    a second corpus pass), so one join attaches both counts — AQE
    broadcasts the model while the vocabulary is small and falls back to
    a shuffle join when it isn't. The vocabulary size is a 1-row
    broadcast. Documents with < 2 tokens have no bigram
    transitions and are absent from the output (consistent with the
    DuckDB oracle's QUALIFY filter)."""
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    pair_len = F.greatest(n - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(toks, F.lit(1), pair_len),
        F.slice(toks, F.lit(2), pair_len),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bg = df.select(F.col(id_col), F.explode(pairs).alias("p")).select(
        id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt2"))
    # c(w1) is the CONTEXT count = number of bigrams led by w1 = the sum of
    # c(w1, *) — a window sum OVER the bigram histogram itself, so the
    # model is ONE relation carrying both counts: the former second
    # corpus-wide tokenize+explode+aggregate pass for c1 and its separate
    # join are gone STRUCTURALLY (round 13; a c1 = c2.groupBy variant was
    # tried first, but duplicates c2's whole subtree in the initial plan
    # and leaves the dedup to AQE stage reuse — the window form needs no
    # optimizer favor). Values identical: sum of longs is a long, and
    # every bg row finds its (w1, w2) in c2 by construction, so the
    # single inner join emits exactly the rows the two-join form did.
    w1_totals = Window.partitionBy("w1")
    model = c2.withColumn("cnt1", F.sum("cnt2").over(w1_totals))
    # Build-side discipline: the window wrapper hides the aggregate from
    # the planner's size heuristics, and left alone Catalyst broadcast the
    # EXPLODED BIGRAM side (O(corpus tokens), with doc_id!) at bench scale
    # — exactly backwards. Hint the model side, but only when Catalyst's
    # estimate of the TEXT SCAN feeding it is broadcast-small (the
    # packing.py size-gate pattern; the histogram is bounded by its input,
    # and gating on the bare scan keeps the driver-side check to one
    # trivial plan — optimizing the full c2 subtree here cost 0.5 s per
    # call): at 100 TB the scan estimate is huge, the hint stays off, and
    # the join degrades to the same shuffle join the pre-window form
    # chose there.
    from sdlt_spark.operators.packing import _plan_size_bytes

    scan_bytes = _plan_size_bytes(df.select(text_col))
    if scan_bytes is not None and scan_bytes < 64 << 20:
        model = F.broadcast(model)
    vocab = (
        df.select(F.explode(toks).alias("w"))
        .agg(F.count_distinct("w").alias("vocab"))
    )
    p = (F.col("cnt2") + F.lit(alpha)) / (
        F.col("cnt1") + F.lit(alpha) * F.col("vocab")
    )
    return (
        bg.join(model, ["w1", "w2"])
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.round(F.avg(-F.log(p)), 3).alias("avg_neg_logprob"),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
    )


def html_to_text(
    df: DataFrame, html_col: str = "html", out_col: str = "text"
) -> DataFrame:
    """Boilerplate HTML -> training text (the trafilatura-class extraction
    step every web-crawl pipeline runs, reduced to its deterministic
    core): drop <script>/<style> subtrees wholesale, strip every
    remaining tag, decode the common entities, collapse whitespace.
    Appends ``out_col`` plus ``n_links`` (anchor count — a standard
    page-quality signal: link farms score high).

    Entirely codegen'd regexp_replace/regexp_count expressions — map-only,
    no Python, no shuffle; at 100 TB this runs at parquet-scan speed. The
    patterns avoid lookarounds so the SAME strings run under Java regex
    (Spark) and RE2 (DuckDB oracle)."""
    c = F.col(html_col)
    n_links = F.regexp_count(c, F.lit(r"(?i)<a[\s>]")).cast("int")
    # subtree drops first (their inner text is NOT content), then tags
    c = F.regexp_replace(c, r"(?is)<script[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, r"(?is)<style[^>]*>.*?</style>", " ")
    c = F.regexp_replace(c, r"(?s)<[^>]+>", " ")
    for ent, rep in (
        ("&nbsp;", " "),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&amp;", "&"),  # LAST: earlier would double-decode &amp;lt;
    ):
        c = F.replace(c, F.lit(ent), F.lit(rep))
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return df.withColumns({out_col: c, "n_links": n_links})


def html_to_text_oracle_sql(html_expr: str) -> tuple[str, str]:
    """DuckDB SQL recomputing html_to_text exactly — same patterns, RE2
    flavor, with the 'g' (global) flag DuckDB needs for replace-all."""
    steps = f"regexp_replace({html_expr}, '(?is)<script[^>]*>.*?</script>', ' ', 'g')"
    steps = f"regexp_replace({steps}, '(?is)<style[^>]*>.*?</style>', ' ', 'g')"
    steps = f"regexp_replace({steps}, '(?s)<[^>]+>', ' ', 'g')"
    for ent, rep in (
        ("&nbsp;", " "),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "''"),
        ("&amp;", "&"),
    ):
        steps = f"replace({steps}, '{ent}', '{rep}')"
    text = f"trim(regexp_replace({steps}, '\\s+', ' ', 'g'))"
    links = f"len(regexp_extract_all({html_expr}, '(?i)<a[\\s>]'))"
    return text, links


def dedup_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "deduped",
) -> DataFrame:
    """Within-document duplicate-line removal (the Gopher/CCNet
    paragraph-dedup step: navigation bars, footers, and cookie banners
    repeat VERBATIM inside a page; keep each line's first occurrence in
    order). Appends ``out_col`` plus ``n_lines`` / ``n_unique`` counts.

    Pure codegen'd array expressions — split, order-preserving
    array_distinct, re-join — map-only at scan speed; no Python, no
    shuffle, no per-line state beyond the row."""
    lines = F.split(F.col(text_col), "\n")
    uniq = F.array_distinct(lines)  # keeps FIRST occurrence order
    return df.withColumns(
        {
            out_col: F.array_join(uniq, "\n"),
            "n_lines": F.size(lines).cast("int"),
            "n_unique": F.size(uniq).cast("int"),
        }
    )


def compression_ratio(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
) -> DataFrame:
    """Deflate compression ratio per document — the RefinedWeb/Gopher-class
    redundancy signal: highly repetitive text (keyword stuffing, templated
    boilerplate, scraped lists) compresses far below natural prose, so a
    low ratio is a strong junk indicator that needs no tokenizer or model.

    ratio = len(zlib(text)) / len(utf8(text)); emitted with both byte
    counts. NULL/empty text -> null ratio. Deterministic for a fixed zlib
    level (the DEFLATE output for a given input+level is stable across
    CPython builds, which is what pins the regression test).

    Scale: Arrow-batched pandas UDF — per-batch Python, compute-bound,
    partition-local, no shuffle; the output is 3 scalars per document."""
    import pandas as pd
    import zlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<raw_bytes: long, deflate_bytes: long>")
    def _sizes(col):
        raw, comp = [], []
        for t in col:
            if t is None:
                raw.append(None)
                comp.append(None)
            else:
                b = t.encode("utf-8")
                raw.append(len(b))
                comp.append(len(zlib.compress(b, level)))
        return pd.DataFrame({"raw_bytes": raw, "deflate_bytes": comp})

    out = df.withColumn("__sz", _sizes(F.col(text_col)))
    return out.select(
        id_col,
        F.col("__sz.raw_bytes").alias("raw_bytes"),
        F.col("__sz.deflate_bytes").alias("deflate_bytes"),
        F.when(
            F.col("__sz.raw_bytes") > 0,
            F.round(
                F.col("__sz.deflate_bytes").cast("double")
                / F.col("__sz.raw_bytes"),
                4,
            ),
        ).alias("compression_ratio"),
    )


def heavy_hitters(
    df: DataFrame,
    text_col: str = "text",
    k: int = 200,
) -> DataFrame:
    """EXACT corpus heavy hitters with bounded memory: every token whose
    total count strictly exceeds ``total_tokens / k``, via the classic
    two-pass Misra-Gries + recount scheme (Misra & Gries, Science of
    Computer Programming 1982).

    Pass 1 streams each partition through a k-counter Misra-Gries summary
    (Arrow batches; state bounded at k entries however large the
    partition) that ALSO carries the partition's exact token count — so
    the corpus total falls out of the same scan, no third pass. Any
    token with global count > n/k must exceed the local n_p/(k+1)
    survival bound in at least one partition, so the union of
    per-partition survivors is a guaranteed candidate SUPERSET; the
    summaries land on the driver (<= (k+1) rows per partition — the
    bounded-driver-state class of k-means centroids). Pass 2 recounts
    only candidates — the token explode feeds a broadcast semi-join
    before the aggregation, so the shuffle carries O(#candidates) groups
    instead of O(vocabulary) — and the exact ``cnt * k > total`` filter
    removes the false positives.

    A plain groupBy(token).count() is exact too, but its partial
    aggregates shuffle one row per DISTINCT token per partition — at
    100 TB of web text that is a vocabulary-sized hash aggregate per
    task and a multi-billion-group shuffle. This shape keeps both sides
    bounded: k counters per task, #candidates <= k * #partitions rows
    shuffled."""
    import pandas as pd

    if k < 2:
        raise ValueError(f"k={k}; need k >= 2")

    def _mg(batches):
        # Batch-merged Misra-Gries (Agarwal et al. 2012, "Mergeable
        # Summaries"): count each Arrow batch's tokens vectorized
        # (value_counts — C speed), then merge the batch's exact counts
        # into the running summary by keeping everything above the
        # (k+1)-th largest value and subtracting it. Merging preserves
        # the MG error bound (undercount <= n_p/(k+1)), so the survivor
        # superset guarantee below is unchanged. The per-TOKEN dict loop
        # this replaces paid O(k) Python decrements per long-tail miss —
        # measured 28x/decade superlinear at sf100 (5M docs, 143.8 s);
        # the per-BATCH merge is O(batch_vocab log k) Python per batch.
        counters: dict[str, int] = {}
        n_p = 0
        for pdf in batches:
            s = pdf[text_col].dropna()
            if not len(s):
                continue
            vc = s.str.split(" ").explode().value_counts()
            n_p += int(vc.sum())
            for tok, c in vc.items():
                counters[tok] = counters.get(tok, 0) + int(c)
            if len(counters) > k:
                off = sorted(counters.values(), reverse=True)[k]
                counters = {t: c - off for t, c in counters.items() if c > off}
        # candidates as (token, null) rows + ONE (null, n_p) count row:
        # the total rides the same scan
        yield pd.DataFrame(
            {
                "token": list(counters) + [None],
                "n": pd.array([None] * len(counters) + [n_p], dtype="Int64"),
            }
        )

    summary = df.select(text_col).mapInPandas(_mg, "token string, n long")
    rows = summary.collect()  # bounded: <= (k+1) rows per partition
    total = sum(r["n"] for r in rows if r["token"] is None)
    cand_list = sorted({r["token"] for r in rows if r["token"] is not None})
    spark = df.sparkSession
    cands = spark.createDataFrame(
        [(t,) for t in cand_list], "token string"
    )
    toks = df.select(F.explode(F.split(F.col(text_col), " ")).alias("token"))
    return (
        toks.join(F.broadcast(cands), "token", "semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * k > F.lit(int(total)))
        .select("token", "cnt")
    )


def warc_records(
    df: DataFrame,
    id_col: str = "archive_id",
    content_col: str = "content",
    strict: bool = False,
) -> DataFrame:
    """Split concatenated WARC-style crawl records (the WET/WARC shape:
    ``WARC/1.0\\r\\n<headers>\\r\\n\\r\\n<payload>`` back to back inside one
    archive blob) into one row per record with the headers lifted to
    columns — the ingestion step every crawl-derived training corpus
    starts with.

    Default path is PURE JVM: a regexp split on the CRLF record magic +
    posexplode + codegen'd header extraction — archives parse at scan
    speed with no Python in the row path, and the payload truncates to
    ``Content-Length`` INTERPRETED AS CHARACTERS (correct for ASCII and
    for char-framed archives like the fixture; the spec frames in
    bytes). Caveats (documented, not silent): a payload that itself
    contains ``WARC/1.0\\r\\n`` would be over-split, and non-ASCII
    byte-framed payloads truncate at the wrong point — real crawl
    formats are byte-length-framed precisely because of this, so
    ``strict=True`` switches to a sequential BYTE-exact Content-Length
    scanner (Arrow-batched ``mapInPandas``, one pass per archive,
    bounded state) that honors the spec framing. ``rec_no`` numbers the
    VALID records per archive in both modes (a garbage preamble chunk
    does not shift it), headers are CRLF-delimited per the spec, and a
    record missing Content-Length reads null length/payload in both
    modes instead of one mode guessing.

    Output: (id, rec_no, warc_type, uri, content_length, payload)."""
    if strict:
        import re as _re

        import pandas as pd

        _ln = _re.compile(rb"Content-Length:\s*(\d+)")
        _ty = _re.compile(rb"WARC-Type:\s*(\S+)")
        _uri = _re.compile(rb"WARC-Target-URI:\s*(\S+)")

        def _scan(batches):
            for pdf in batches:
                out = {
                    "id": [], "rec_no": [], "warc_type": [],
                    "uri": [], "content_length": [], "payload": [],
                }
                for aid, blob in zip(pdf[id_col], pdf[content_col]):
                    if blob is None:
                        continue
                    # Content-Length is a BYTE count (WARC spec): scan
                    # the encoded form so multi-byte payloads frame
                    # exactly; decode each slice back for the output
                    b = blob.encode("utf-8")
                    pos, rec_no = 0, 0
                    while True:
                        start = b.find(b"WARC/1.0", pos)
                        if start < 0:
                            break
                        hdr_end = b.find(b"\r\n\r\n", start)
                        if hdr_end < 0:
                            break
                        hdr = b[start:hdr_end]
                        ln = _ln.search(hdr)
                        ty = _ty.search(hdr)
                        uri = _uri.search(hdr)
                        # int64 bound mirrors the fast path's try_cast:
                        # a digit-overflow length is malformed framing
                        if ln and int(ln.group(1)) <= 2**63 - 1:
                            n = int(ln.group(1))
                            body = b[hdr_end + 4 : hdr_end + 4 + n].decode(
                                "utf-8", errors="replace"
                            )
                            pos = hdr_end + 4 + n
                        else:
                            # missing/overflowed framing: null length and
                            # payload (the fast path's behavior) and
                            # resume scanning right after the headers
                            n, body = None, None
                            pos = hdr_end + 4
                        out["id"].append(aid)
                        out["rec_no"].append(rec_no)
                        out["warc_type"].append(
                            ty.group(1).decode("utf-8", "replace") if ty else None
                        )
                        out["uri"].append(
                            uri.group(1).decode("utf-8", "replace") if uri else None
                        )
                        out["content_length"].append(n)
                        out["payload"].append(body)
                        rec_no += 1
                yield pd.DataFrame(
                    {
                        **out,
                        "content_length": pd.array(
                            out["content_length"], dtype="Int64"
                        ),
                    }
                )

        return df.select(
            F.col(id_col), F.col(content_col)
        ).mapInPandas(
            _scan,
            f"id {dict(df.dtypes)[id_col]}, rec_no int, warc_type string, "
            "uri string, content_length long, payload string",
        ).withColumnRenamed("id", id_col)

    from pyspark.sql.window import Window

    rec = F.posexplode(
        F.split(F.col(content_col), r"(?=WARC/1\.0\r\n)")
    )
    out = df.select(F.col(id_col), rec.alias("__pos", "__rec")).filter(
        F.col("__rec").startswith("WARC/1.0\r\n")
        # a truncated tail (magic but no header terminator) is not a
        # record in EITHER mode — filtering it here keeps rec_no aligned
        # with the strict scanner on malformed archives
        & (F.locate("\r\n\r\n", F.col("__rec")) > 0)
    )
    # number the VALID records (a garbage preamble chunk must not shift
    # rec_no or diverge from strict mode); the window partitions by
    # archive — bounded by records-per-archive, the same unit strict
    # mode scans sequentially
    out = out.withColumn(
        "rec_no",
        (
            F.row_number().over(
                Window.partitionBy(id_col).orderBy("__pos")
            )
            - 1
        ).cast("int"),
    )
    hdr_end = F.locate("\r\n\r\n", F.col("__rec"))
    hdr = F.substring(F.col("__rec"), 1, hdr_end - 1)
    # malformed headers read as nulls instead of an ANSI error killing
    # the scan: missing Content-Length -> nullif(''), digit overflow ->
    # try_cast
    n = (
        F.nullif(
            F.regexp_extract(hdr, r"Content-Length:\s*(\d+)", 1), F.lit("")
        )
        .try_cast("long")
    )
    return out.select(
        id_col,
        "rec_no",
        F.nullif(
            F.regexp_extract(hdr, r"WARC-Type:\s*(\S+)", 1), F.lit("")
        ).alias("warc_type"),
        F.nullif(
            F.regexp_extract(hdr, r"WARC-Target-URI:\s*(\S+)", 1), F.lit("")
        ).alias("uri"),
        n.alias("content_length"),
        F.col("__rec").substr(hdr_end + 4, n).alias("payload"),
    )
