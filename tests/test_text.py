"""Text-analysis library API tests (the query registry reimplements some of
these inline for oracle pairing; the library functions are the public API)."""

from __future__ import annotations

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
