"""Every declared query must hash-match its DuckDB oracle (driver t2 replica).

Runs at sf0.001 for speed; the driver runs the same comparison at sf0.01.
"""

from __future__ import annotations

import pytest

import sdlt_spark.queries as q
from tests.oracle_harness import compare

SF_DIR = "/root/testdata/sf0.001"

CASES = sorted((n, fn, sql) for n, (fn, sql) in q.registry().items() if sql is not None)


@pytest.mark.parametrize("name,fn,sql", CASES, ids=[c[0] for c in CASES])
def test_oracle_parity(spark, name, fn, sql):
    problems = compare(spark, SF_DIR, name, fn, sql)
    assert not problems, "\n".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"c_mktsegment", "order_year", "revenue", "n_items"}


def test_registry_consistency():
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 25 or True  # informational; grows each round


def test_registry_size_matches_decoration_count():
    """Tripwire against silent registry shadowing (the round-10
    pack_sequences collision): every @_q decoration in queries.py must
    produce exactly one registry entry. _q now raises on duplicates at
    import time; this test catches any future registration path that
    bypasses _q (or a regression of the guard itself)."""
    import inspect
    import re

    src = inspect.getsource(q)
    decorations = re.findall(r"^@_q\(", src, flags=re.MULTILINE)
    assert len(q.registry()) == len(decorations), (
        f"{len(decorations)} @_q decorations but {len(q.registry())} "
        "registry entries — a name was silently shadowed or registered "
        "outside _q"
    )


def test_duplicate_registration_raises():
    with pytest.raises(ValueError, match="duplicate registry entry"):
        q._q("count_all", None)(lambda spark, sf_dir: None)


# Registry entries legitimately WITHOUT a DuckDB oracle: each must name the
# property/accuracy test that regression-guards it instead. A new rows-only
# entry fails test_no_oracle_entries_are_allowlisted until it is added here
# WITH a guard — "has an oracle or a property test" is enforced, not
# convention.
NO_ORACLE_ALLOWLIST = {
    "ann_lsh_topk": "tests/test_similarity.py::test_ann_recall_at_10_pinned_sf001",
    "ann_ivf_topk": "tests/test_similarity.py::test_ann_recall_at_10_pinned_sf001",
    "ann_ivf_persisted": "tests/test_similarity.py::test_ivf_persisted_index_prunes_and_matches",
    "neardup_cosine_lsh": "tests/test_similarity.py::test_neardup_lsh_subset_of_exact_with_recall",
    "approx_distinct": "tests/test_properties.py (HLL ±5% vs exact)",
    "approx_percentile": "tests/test_properties.py (rank-error bound vs exact)",
    "hll_distinct_merge": "tests/test_properties.py (sketch-union ±5% vs exact)",
    "kmeans_fit": "tests/test_clustering.py (exact-assignment oracle)",
    "bpe_merges": "tests/test_text.py (pinned merge-sequence unit test)",
    "bpe_encode": "tests/test_text.py::test_bpe_apply_replays_induction_and_is_lossless",
    "multimodal_features": "tests/test_multimodal.py (plumbing/shape tests)",
    "semantic_dedup": "tests/test_dedup.py::test_semantic_dedup_planted_duplicates",
    "ann_pq_topk": "tests/test_similarity.py::test_ann_pq_recall_on_planted_neighbor_fixture",
    "ann_ivf_refresh": "tests/test_similarity.py::test_ivf_refresh_follows_corpus_mutations (refresh ≡ from-scratch rebuild; in-entry equality assert)",
    "compression_ratio": "tests/test_text.py::test_compression_ratio_separates_repetitive_text (exact deflate-size pin)",
}


def test_no_oracle_entries_are_allowlisted():
    no_oracle = {n for n, (_fn, sql) in q.registry().items() if sql is None}
    unexplained = no_oracle - set(NO_ORACLE_ALLOWLIST)
    assert not unexplained, (
        f"registry entries {sorted(unexplained)} have neither a DuckDB "
        "oracle nor an allowlisted property test — add one or the other"
    )
    stale = set(NO_ORACLE_ALLOWLIST) - no_oracle
    assert not stale, f"allowlist entries {sorted(stale)} now have oracles; prune"
