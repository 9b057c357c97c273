"""Action-level attribution profiler: wraps the DataFrame/Writer action
methods with timers that record (caller file:line, seconds), runs the
minhash_lsh_dedup_incremental lifecycle twice (cold + warm), and prints the
warm run's per-action costs sorted descending. Attribution shows WHERE the
wall time goes (which count()/merge()/checkpoint inside the operators), the
thing job-level logs can't show with the UI disabled.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/profile_actions.py [lifecycle|refresh]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

# Spark 4: concrete methods live on the classic subclass, not the abstract
# pyspark.sql.DataFrame — wrap the class the session actually instantiates
from pyspark.sql.classic.dataframe import DataFrame  # noqa: E402
from pyspark.sql.readwriter import DataFrameWriter  # noqa: E402

from sdlt_spark import tables  # noqa: E402
from sdlt_spark.operators import minhash_index as _mi  # noqa: E402
from sdlt_spark.session import get_spark  # noqa: E402
from sdlt_spark.store import VintageTable  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

RECORDS: list[tuple[str, float]] = []


def _caller() -> str:
    # innermost repo frame that is not this file
    for f in reversed(traceback.extract_stack()):
        if "/root/repo" in f.filename and "profile_actions" not in f.filename:
            return f"{os.path.relpath(f.filename, '/root/repo')}:{f.lineno}"
    return "<external>"


def _wrap(cls, name):
    orig = getattr(cls, name)

    def timed(self, *a, **k):
        t0 = time.time()
        out = orig(self, *a, **k)
        RECORDS.append((f"{name} @ {_caller()}", time.time() - t0))
        return out

    setattr(cls, name, timed)


for m in ("count", "collect", "head", "localCheckpoint"):
    _wrap(DataFrame, m)
for m in ("save", "parquet"):
    _wrap(DataFrameWriter, m)


def run_lifecycle(spark, docs):
    root = tempfile.mkdtemp(prefix="sdlt_mh_prof_")
    corpus = VintageTable(spark, root + "/corpus", change_feed=True)
    corpus.write(docs.filter(F.col("doc_id") % 5 < 3))
    idx = root + "/index"
    pairs0, _ = _mi.minhash_index_build(corpus, idx, "doc_id", "text", threshold=0.9)
    corpus.merge(docs.filter(F.col("doc_id") % 5 == 3), ["doc_id"])
    p1, _s1, _r1 = _mi.minhash_refresh(corpus, idx)
    corpus.merge(docs.filter(F.col("doc_id") % 5 == 4), ["doc_id"])
    p2, _s2, _r2 = _mi.minhash_refresh(corpus, idx)
    out = pairs0.unionByName(p1).unionByName(p2).localCheckpoint(eager=True)
    out.write.mode("overwrite").format("noop").save()


def run_query(spark, name):
    """Run a registry entry exactly like bench.py does (noop sink, caches
    cleared for the lifecycle composites)."""
    import sdlt_spark.queries as Q

    if name == "minhash_lsh_dedup_incremental":
        Q._MINHASH_INCREMENTAL.clear()
    if name == "ann_ivf_refresh":
        Q._IVF_REFRESH.clear()
        Q.ANN_REFRESH_VERIFY = False
    fn, _ = Q.registry()[name]
    fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
    Q.ANN_REFRESH_VERIFY = True


def main() -> None:
    spark = get_spark("sdlt_profile_actions")
    docs = tables.load(spark, SF_DIR, "documents").select("doc_id", "text")
    docs.limit(1).collect()
    target = sys.argv[1] if len(sys.argv) > 1 else "lifecycle"
    run = (
        (lambda: run_lifecycle(spark, docs))
        if target == "lifecycle"
        else (lambda: run_query(spark, target))
    )

    t0 = time.time()
    run()  # cold: codegen + python worker spin-up
    cold = time.time() - t0
    spark.catalog.clearCache()
    RECORDS.clear()
    t0 = time.time()
    run()  # warm: the steady-state bench shape
    warm = time.time() - t0

    by_site: dict[str, list[float]] = {}
    for site, sec in RECORDS:
        by_site.setdefault(site, []).append(sec)
    rows = sorted(
        ((sum(v), len(v), site) for site, v in by_site.items()), reverse=True
    )
    print(json.dumps({"cold_total": round(cold, 2), "warm_total": round(warm, 2)}))
    print(f"{'total_s':>8} {'n':>3}  site")
    accounted = 0.0
    for tot, n, site in rows:
        accounted += tot
        print(f"{tot:8.3f} {n:3d}  {site}")
    print(f"accounted: {accounted:.2f}s of {warm:.2f}s warm wall")


if __name__ == "__main__":
    main()
