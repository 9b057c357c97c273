"""Targeted scale probes for the heavy LLM-pipeline stages — the tool the
SCALE.md decade tables are recorded with when a full bench.py suite at a
replica scale would time out or drown the signal.

Measures, per requested op, wall seconds for ONE materialization (noop
count) at ``$SPARK_GRAFT_SF_DIR``, bracketing with the same host canary
bench.py records, and prints one JSON line. Ops:

- ``sig``      : the MinHash signature stage alone (token_hashes ->
                 _toks_and_sigs(k=32)) — the sf100 third-decade subject
                 (collect_set measured 541 s / ~45x superlinear there;
                 the round-11 sort+Arrow kernel replaced it).
- ``hh``       : operators/text.heavy_hitters (two-pass Misra-Gries) —
                 the other measured sf100 wall (143.8 s per-token loop,
                 now per-batch vectorized).
- ``minhash``  : the full minhash_lsh_dedup registry entry.
- ``pack``     : pack_sequences (two-level prefix sum).
- ``mixture``  : mixture_sample at the registry operating point.

Usage:
    SPARK_GRAFT_SF_DIR=/tmp/sdlt_sf100 SDLT_DRIVER_MEM=64g \
        python scripts/scale_probe.py sig hh

``SDLT_INITIAL_PARTITIONS`` (session.py) applies — the round-12 AQE
headroom adjudication ran this probe at 128 vs 512.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sdlt_spark import tables  # noqa: E402
from sdlt_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def run(op: str, spark) -> float:
    docs = tables.load(spark, SF_DIR, "documents")
    t0 = time.time()
    if op == "sig":
        from sdlt_spark.operators.dedup import _toks_and_sigs, token_hashes

        th = token_hashes(docs, "doc_id", "text")
        _noop(_toks_and_sigs(th, "doc_id", 32))
    elif op == "hh":
        from sdlt_spark.operators.text import heavy_hitters

        _noop(heavy_hitters(docs, "text", k=50))
    elif op == "minhash":
        import sdlt_spark.queries as Q

        _noop(Q.registry()["minhash_lsh_dedup"][0](spark, SF_DIR))
    elif op == "pack":
        from sdlt_spark.operators.packing import pack_sequences

        _noop(pack_sequences(docs, "doc_id", "text", budget=512))
    elif op == "mixture":
        import sdlt_spark.queries as Q

        _noop(Q.registry()["mixture_sample"][0](spark, SF_DIR))
    else:
        raise SystemExit(f"unknown op {op!r}")
    return round(time.time() - t0, 3)


def main() -> None:
    ops = sys.argv[1:] or ["sig", "hh"]
    spark = get_spark("sdlt_scale_probe")
    tables.load(spark, SF_DIR, "documents").limit(1).collect()  # warm footers
    canary = min(
        _timed(lambda: spark.range(200_000_000, numPartitions=32)
               .agg(F.sum("id")).collect())
        for _ in range(3)
    )
    out = {"sf_dir": SF_DIR, "canary_sec": canary,
           "initial_partitions": os.environ.get(
               "SDLT_INITIAL_PARTITIONS", "default(=shuffle.partitions)"
           ),
           "ops": {}}
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))
    for p in range(passes):
        for op in ops:
            t = run(op, spark)
            out["ops"][op] = min(out["ops"].get(op, t), t)
            spark.catalog.clearCache()
            # incremental emit: a heavy later op (or a kill) must not lose
            # the ops already measured — consumers take the LAST line
            print(json.dumps(out), flush=True)


def _timed(fn) -> float:
    t0 = time.time()
    fn()
    return round(time.time() - t0, 3)


if __name__ == "__main__":
    main()
