"""Text-analysis library API tests (the query registry reimplements some of
these inline for oracle pairing; the library functions are the public API)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sdlt_spark import tables
from sdlt_spark.operators import text

SF = "/root/testdata/sf0.001"


def test_token_stats_columns_and_ranges(spark):
    out = text.token_stats(tables.load(spark, SF, "documents")).collect()
    for r in out[:50]:
        assert r["n_tokens"] > 0
        assert r["chars_per_token"] > 0
        assert 0.0 <= r["punct_ratio"] <= 1.0
        assert 0.0 <= r["stopword_ratio"] <= 1.0


def test_quality_score_bounded(spark):
    out = text.quality_score(tables.load(spark, SF, "documents")).collect()
    assert all(0.0 <= r["quality"] <= 1.0 for r in out)
    # the fixture docs are long clean word-soup: most should score high
    assert sum(r["quality"] >= 0.7 for r in out) > len(out) * 0.8


def test_language_scores_pick_en_when_en_stopwords_present(spark):
    docs = spark.createDataFrame(
        [(0, "the cat and the dog is in that house"),
         (1, "der hund und die katze ist nicht ein fisch")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["pred_lang"] for r in text.language_scores(docs).collect()}
    assert out[0] == "en"
    assert out[1] == "de"


def test_bpe_token_count_sane(spark):
    df = spark.createDataFrame(
        [(1, "Hello, world's 42 cats!"), (2, ""), (3, "plain words here")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: (r["n_bpe_tokens"], r["n_ws_tokens"]) for r in text.bpe_token_count(df).collect()}
    # Hello | , | <sp>world | 's | <sp>42 | <sp>cats | !  => 7 segments
    assert out[1] == (7, 4)
    assert out[2][0] == 0
    assert out[3] == (3, 3)


def test_winnow_shared_passage_shares_fingerprint(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [
            (1, "intro words " + base),
            (2, base + " totally different tail content here"),
            (3, "nothing in common with the others at all whatsoever truly"),
            (4, "short doc"),
        ],
        "doc_id long, text string",
    )
    fps = text.winnow_fingerprints(df, "doc_id", k=5, w=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    # docs 1 and 2 share a >= w+k-1 = 8-token run -> winnowing guarantees a
    # shared fingerprint
    assert by_doc[1] & by_doc[2]
    assert not (by_doc[1] & by_doc[3])
    assert 4 not in by_doc  # shorter than k+w-1 tokens -> no fingerprints


def test_winnow_density(spark):
    """Winnowing keeps roughly 2/(w+1) of shingle hashes (upper bound: all
    windows distinct -> at most n_shingles - w + 1 fingerprints)."""
    words = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame([(1, words)], "doc_id long, text string")
    n_fp = text.winnow_fingerprints(df, "doc_id", k=5, w=4).count()
    n_shingles = 100 - 5 + 1
    assert 0 < n_fp <= n_shingles
    assert n_fp < n_shingles * 0.7  # substantially compressed


def test_resample_ffill_gaps(spark):
    from sdlt_spark.operators.timeseries import resample_ffill

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 5.0, 100),
            (1, "2024-01-01 18:00:00", 7.0, 101),  # later same day wins
            (1, "2024-01-04 09:00:00", 9.0, 102),  # two silent days
            (2, "2024-02-10 00:00:00", 1.0, 103),  # single-obs key
        ],
        "user_id long, ts_s string, value double, event_id long",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "value", "event_id")
    out = resample_ffill(df, "user_id", "ts", "value", tiebreak_cols=["event_id"])
    rows = {
        (r["user_id"], r["bucket_start"].strftime("%Y-%m-%d")): r["value"]
        for r in out.collect()
    }
    assert rows[(1, "2024-01-01")] == 7.0
    assert rows[(1, "2024-01-02")] == 7.0  # forward-filled
    assert rows[(1, "2024-01-03")] == 7.0
    assert rows[(1, "2024-01-04")] == 9.0
    assert rows[(2, "2024-02-10")] == 1.0
    assert len(rows) == 5  # user 2 contributes exactly its own 1-day grid


def test_redact_pii_counts_and_placeholders(spark):
    from sdlt_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail a.b@x.org or b_c%d@y.co.uk, call 25-989-741-2988"),
            (2, "host 192.168.0.1 and 10.0.0.255; no contacts"),
            (3, "plain text without identifiers"),
        ],
        "id long, text string",
    )
    out = {r["id"]: r for r in redact_pii(df).collect()}
    assert (out[1]["n_email"], out[1]["n_phone"], out[1]["n_ipv4"]) == (2, 1, 0)
    assert out[1]["redacted"] == "mail <EMAIL> or <EMAIL>, call <PHONE>"
    assert (out[2]["n_email"], out[2]["n_ipv4"]) == (0, 2)
    assert out[2]["redacted"] == "host <IPV4> and <IPV4>; no contacts"
    assert out[3]["redacted"] == "plain text without identifiers"


def test_bpe_merge_table_exact(spark):
    """Hand-computed corpus: 'a b' occurs 5x (most frequent pair), and after
    fusing it, ('a b', 'c') is the next most frequent. Greedy non-overlap:
    'a a a' contributes only one ('a','a') pair after the first fuse scan."""
    from sdlt_spark.operators.text import bpe_merge_table

    rows = [
        ("a b c",), ("a b c",), ("a b c",),
        ("a b d",), ("a b",),
        ("x y",), ("x y",),
    ]
    df = spark.createDataFrame(rows, "text string")
    out = bpe_merge_table(df, "text", num_merges=3).collect()
    assert [(r["rank"], r["left"], r["right"], r["n"]) for r in out] == [
        (0, "a", "b", 5),
        (1, "a b", "c", 3),
        (2, "x", "y", 2),
    ]


def test_bpe_merge_greedy_non_overlapping(spark):
    from sdlt_spark.operators.text import bpe_merge_table

    # 'a a a a' = three adjacent (a,a) pairs, but greedy fuse keeps 2 units;
    # with two such docs the first merge counts 6 pairs
    df = spark.createDataFrame([("a a a a",), ("a a a a",)], "text string")
    out = bpe_merge_table(df, "text", num_merges=2).collect()
    assert (out[0]["left"], out[0]["right"], out[0]["n"]) == ("a", "a", 6)
    # second round: each doc is now ['a a', 'a a'] -> pair ('a a','a a') x2
    assert (out[1]["left"], out[1]["right"], out[1]["n"]) == ("a a", "a a", 2)

def test_bpe_merge_table_sampled_bound(spark):
    """Corpus-sample BPE induction (the 100 TB bound): a seeded
    sample_fraction induces the loop on O(sample) rows — on a corpus
    whose pair distribution is uniform-by-construction, the sampled run
    still produces the pinned merges, and reruns are deterministic."""
    from sdlt_spark.operators.text import bpe_merge_table

    rows = [("a b c",)] * 40 + [("x y",)] * 12
    df = spark.createDataFrame(rows, "text string")
    out1 = bpe_merge_table(df, "text", num_merges=2, sample_fraction=0.5)
    out2 = bpe_merge_table(df, "text", num_merges=2, sample_fraction=0.5)
    got1 = [(r["rank"], r["left"], r["right"]) for r in out1.collect()]
    got2 = [(r["rank"], r["left"], r["right"]) for r in out2.collect()]
    assert got1 == got2  # seeded: reruns induce the same vocabulary
    assert got1 == [(0, "a", "b"), (1, "a b", "c")]


def test_bpe_apply_replays_induction_and_is_lossless(spark):
    """bpe_apply with the induced merge table: (a) merged units appear in
    the encoded stream and counts shrink accordingly; (b) segmentation is
    LOSSLESS — joining bpe_tokens with single spaces reproduces the
    original text; (c) encoding the training corpus reproduces the exact
    token stream the induction ended on (same greedy fuse, same order);
    (d) null text passes through as nulls."""
    from sdlt_spark.operators.text import bpe_apply, bpe_merge_table

    docs = spark.createDataFrame(
        [
            (1, "new york is big and new york is old"),
            (2, "new york new york"),
            (3, "boston is neither new nor york"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    merges = bpe_merge_table(docs, num_merges=2)
    got = {r["doc_id"]: r for r in bpe_apply(docs, merges).collect()}
    m = [(r["left"], r["right"], r["merged"]) for r in merges.collect()]
    assert m[0][:2] == ("new", "york")  # most frequent adjacent pair
    # lossless: rejoin == original
    for did, text in [(1, "new york is big and new york is old"),
                      (2, "new york new york"),
                      (3, "boston is neither new nor york")]:
        assert " ".join(got[did]["bpe_tokens"]) == text
    assert got[2]["n_tokens"] == 4 and got[2]["n_bpe_tokens"] == 2
    assert got[2]["bpe_tokens"] == ["new york", "new york"]
    assert got[4]["bpe_tokens"] is None and got[4]["n_tokens"] is None
    # list-form merges accepted too
    got2 = {r["doc_id"]: r for r in bpe_apply(docs, m).collect()}
    assert got2[1]["bpe_tokens"] == got[1]["bpe_tokens"]


def test_bigram_logprob_hand_computed(spark):
    import math

    # corpus: "a b a b" and "a c". vocab = {a,b,c}, V=3, alpha=0.5.
    # context counts c1: a->3 (a b twice, a c once), b->1 (b a once)
    # bigram counts c2: (a,b)=2, (b,a)=1, (a,c)=1
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c"), (3, "solo"), (4, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in text.bigram_logprob(docs).collect()}
    # docs with < 2 tokens (or NULL text) have no transitions -> absent
    assert set(got) == {1, 2}
    p_ab = (2 + 0.5) / (3 + 0.5 * 4)  # vocab = {a,b,c,solo} -> V=4
    p_ba = (1 + 0.5) / (1 + 0.5 * 4)
    p_ac = (1 + 0.5) / (3 + 0.5 * 4)
    exp1 = -(math.log(p_ab) + math.log(p_ba) + math.log(p_ab)) / 3
    exp2 = -math.log(p_ac)
    assert got[1]["n_bigrams"] == 3 and got[2]["n_bigrams"] == 1
    assert abs(got[1]["avg_neg_logprob"] - round(exp1, 3)) < 1e-9
    assert abs(got[2]["avg_neg_logprob"] - round(exp2, 3)) < 1e-9


def test_html_to_text_hand_cases(spark):
    docs = spark.createDataFrame(
        [
            # script body contains a '</p>' literal: a tag-only stripper
            # would leak 'var a=' into the text
            (1, '<p>Hello</p><script>var a="</p>";</script><p>world</p>'),
            (2, '<style>p {c: 1}</style>A &amp;&lt;B&gt; &nbsp; C'),
            (3, '<a href="/x">one</a> <A HREF="/y">two</A> <p>done</p>'),
            (4, None),
        ],
        "doc_id long, html string",
    )
    out = {r["doc_id"]: (r["text"], r["n_links"])
           for r in text.html_to_text(docs).collect()}
    assert out[1] == ("Hello world", 0)
    assert out[2] == ('A &<B> C', 0)
    assert out[3] == ("one two done", 2)
    assert out[4] == (None, None)


def test_dedup_lines_first_occurrence_order(spark):
    docs = spark.createDataFrame(
        [(1, "a\nb\na\nc\nb"), (2, "x"), (3, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: (r["deduped"], r["n_lines"], r["n_unique"])
           for r in text.dedup_lines(docs).collect()}
    assert out[1] == ("a\nb\nc", 5, 3)
    assert out[2] == ("x", 1, 1)
    assert out[3] == (None, None, None)


def test_compression_ratio_separates_repetitive_text(spark):
    import zlib

    prose = ("the quick brown fox jumps over the lazy dog and then wanders "
             "through seventeen unrelated meadows describing each uniquely ")
    docs = spark.createDataFrame(
        [
            (1, "spam " * 200),               # keyword stuffing
            (2, prose * 4),                   # varied prose
            (3, ""),                          # empty -> null ratio
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in text.compression_ratio(docs).collect()}
    assert out[1]["compression_ratio"] < 0.1 < out[2]["compression_ratio"]
    # exact deflate size pins determinism (stable for fixed level)
    assert out[1]["deflate_bytes"] == len(zlib.compress(("spam " * 200).encode(), 6))
    assert out[1]["raw_bytes"] == 1000
    assert out[3]["compression_ratio"] is None and out[3]["raw_bytes"] == 0
    assert out[4]["raw_bytes"] is None and out[4]["compression_ratio"] is None


def test_heavy_hitters_exact_under_forced_decrements(spark):
    """k=2 counters with a long tail forces constant Misra-Gries
    decrements; the two-pass result must still equal the brute-force
    answer exactly (candidate superset + exact recount)."""
    rows = []
    # 'hot' = 450 of 750 tokens (60%), 'warm' = 150 (20%), tail of 150
    # distinct singletons: with k=2 only counts strictly > 375 qualify
    for i in range(150):
        rows.append((i, "hot hot hot warm " + f"tail{i}"))
    df = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(8)
    got = {
        (r["token"], r["cnt"])
        for r in text.heavy_hitters(df, "text", k=2).collect()
    }
    brute = (
        df.select(F.explode(F.split("text", " ")).alias("t"))
        .groupBy("t")
        .count()
        .collect()
    )
    total = sum(r["count"] for r in brute)
    want = {(r["t"], r["count"]) for r in brute if r["count"] * 2 > total}
    assert got == want == {("hot", 450)}


def test_heavy_hitters_matches_brute_force_on_corpus(spark):
    df = tables.load(spark, SF, "documents")
    got = {
        (r["token"], r["cnt"])
        for r in text.heavy_hitters(df, "text", k=40).collect()
    }
    brute = (
        df.select(F.explode(F.split("text", " ")).alias("t"))
        .groupBy("t")
        .count()
        .collect()
    )
    total = sum(r["count"] for r in brute)
    want = {(r["t"], r["count"]) for r in brute if r["count"] * 40 > total}
    assert got == want and got


def test_weighted_sample_deterministic_and_weight_biased(spark):
    from sdlt_spark.operators.sampling import weighted_sample

    rows = [(i, 1000.0 if i < 20 else 1.0) for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "w"])
    a = sorted(r["id"] for r in weighted_sample(df, "id", "w", 30).collect())
    b = sorted(r["id"] for r in weighted_sample(df, "id", "w", 30).collect())
    assert a == b and len(a) == 30
    # the 20 heavy rows (1000x weight) should essentially all be drawn
    assert sum(1 for i in a if i < 20) >= 18
    # a different seed reshuffles the light tail but stays deterministic
    c = sorted(
        r["id"]
        for r in weighted_sample(df, "id", "w", 30, seed="other").collect()
    )
    assert c != a
    # n >= rows returns everything
    assert len(weighted_sample(df, "id", "w", 500).collect()) == 200


def _warc(docs):
    return "".join(
        "WARC/1.0\r\nWARC-Type: response\r\n"
        f"WARC-Target-URI: http://x/{i}\r\nContent-Length: {len(t)}"
        f"\r\n\r\n{t}\r\n\r\n"
        for i, t in docs
    )


def test_warc_records_fast_and_strict_agree_on_clean_archives(spark):
    blob = _warc([(1, "hello world"), (2, "second"), (3, "")])
    df = spark.createDataFrame(
        [(0, blob), (1, _warc([(9, "solo")]))],
        "archive_id long, content string",
    )
    want = {
        (0, 0, "http://x/1", 11, "hello world"),
        (0, 1, "http://x/2", 6, "second"),
        (0, 2, "http://x/3", 0, ""),
        (1, 0, "http://x/9", 4, "solo"),
    }
    for strict in (False, True):
        got = {
            (r["archive_id"], r["rec_no"], r["uri"], r["content_length"],
             r["payload"])
            for r in text.warc_records(df, strict=strict).collect()
        }
        assert got == want, f"strict={strict}"
        types = {r["warc_type"] for r in text.warc_records(df, strict=strict).collect()}
        assert types == {"response"}


def test_warc_records_strict_honors_length_framing(spark):
    """A payload containing the record magic at a line start: the strict
    Content-Length scanner parses it intact (the documented reason
    strict exists); the fast regexp split over-splits it."""
    evil = "line one\nWARC/1.0\r\nnot a real record"
    blob = _warc([(1, evil), (2, "after")])
    df = spark.createDataFrame([(0, blob)], "archive_id long, content string")
    got = {
        (r["rec_no"], r["uri"], r["payload"])
        for r in text.warc_records(df, strict=True).collect()
    }
    assert got == {
        (0, "http://x/1", evil),
        (1, "http://x/2", "after"),
    }
    # the fast path's documented caveat: it splits INSIDE the evil payload
    fast = text.warc_records(df, strict=False).collect()
    assert len(fast) == 3


def test_warc_strict_byte_framing_non_ascii(spark):
    """Review regression: Content-Length is a BYTE count (WARC spec) —
    strict mode must frame multi-byte payloads exactly, with no record
    separator leaking in and no following record skipped."""
    p1 = "héllo wörld"  # 11 chars, 13 bytes
    p2 = "after"
    blob = (
        f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://x/1"
        f"\r\nContent-Length: {len(p1.encode('utf-8'))}\r\n\r\n{p1}\r\n\r\n"
        f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://x/2"
        f"\r\nContent-Length: {len(p2.encode('utf-8'))}\r\n\r\n{p2}\r\n\r\n"
    )
    df = spark.createDataFrame([(0, blob)], "archive_id long, content string")
    got = {
        (r["rec_no"], r["uri"], r["payload"])
        for r in text.warc_records(df, strict=True).collect()
    }
    assert got == {(0, "http://x/1", p1), (1, "http://x/2", p2)}


def test_warc_fast_mode_malformed_and_preamble(spark):
    """Review regressions: a garbage preamble must not shift rec_no (it
    must match strict mode), a >19-digit Content-Length must read null
    instead of killing the scan (ANSI), and missing headers read null in
    BOTH modes."""
    blob = (
        "GARBAGE-PREAMBLE\r\n"
        + _warc([(1, "first"), (2, "second")])
        + "WARC/1.0\r\nContent-Length: 99999999999999999999999\r\n\r\n"
    )
    df = spark.createDataFrame([(0, blob)], "archive_id long, content string")
    fast = {
        (r["rec_no"], r["uri"], r["payload"], r["content_length"])
        for r in text.warc_records(df, strict=False).collect()
    }
    assert (0, "http://x/1", "first", 5) in fast
    assert (1, "http://x/2", "second", 6) in fast
    # the overflow record survives as nulls (no job-killing ANSI cast)
    assert (2, None, None, None) in fast
    strict = {
        (r["rec_no"], r["uri"], r["payload"])
        for r in text.warc_records(df, strict=True).collect()
    }
    # rec_no aligns across modes despite the preamble
    assert {(0, "http://x/1", "first"), (1, "http://x/2", "second")} <= strict


def test_weighted_sample_excludes_nonpositive_weights(spark):
    """Review regression: weight 0 must not DIVIDE_BY_ZERO the job under
    ANSI mode, and negative weights must not outrank valid rows."""
    from sdlt_spark.operators.sampling import weighted_sample

    rows = [(1, 0.0), (2, -5.0), (3, 10.0), (4, 10.0), (5, 10.0)]
    df = spark.createDataFrame(rows, ["id", "w"])
    got = sorted(r["id"] for r in weighted_sample(df, "id", "w", 10).collect())
    assert got == [3, 4, 5]


def test_decontaminate_hot_shingle_preamble_is_linear(spark):
    """Round-13 (round-12 verdict item 6): a benchmark suite's boilerplate
    preamble shared by 100k training docs is the hot-shingle attack shape.
    decontaminate is linear BY CONSTRUCTION — the benchmark side reduces
    to ONE row per DISTINCT shingle before the join, so each corpus
    shingle occurrence matches at most one benchmark row and the join
    output is bounded by the corpus' shingle count (never d·(d-1)/2 like
    an uncapped self-join). This test plants the attack and pins both the
    answer and the bound."""
    import time

    from sdlt_spark.operators.text import decontaminate

    n_docs = 100_000
    preamble = "the following is a benchmark question answer it carefully"
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", F.lit(preamble), F.format_string("unique%d tail%d", "id", "id")
        ).alias("text"),
    )
    bench = spark.createDataFrame(
        [(preamble + " what is two plus two",)], "text string"
    )
    t0 = time.time()
    out = decontaminate(docs, bench, "doc_id", n=8).persist()
    try:
        n_tainted = out.filter("contaminated").count()
        # every doc shares the preamble's 8-gram windows: all contaminated
        assert n_tainted == n_docs
        # per-doc hits = distinct shared 8-grams: preamble has 9 tokens ->
        # 2 windows fully inside it (the later windows mix in unique tail
        # tokens and can't match the benchmark side)
        hits = out.select("n_hits").distinct().collect()
        assert {r["n_hits"] for r in hits} == {2}
    finally:
        out.unpersist()
    # linearity proxy: 100k docs x ~2 matching shingles each completes in
    # seconds; a quadratic candidate path would emit ~5e9 pairs and hang
    assert time.time() - t0 < 120
