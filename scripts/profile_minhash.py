"""Cold-JVM per-stage profiling of minhash_dedup at sf0.1.

Replicates operators/dedup.py:minhash_dedup stage-by-stage with wall
timings printed between materialization points, so the one-time Janino
whole-stage-codegen cost of each region is visible. Run in a FRESH
process each time (the codegen class cache hides the cost otherwise).

Usage: python scripts/profile_minhash.py [variant]
  variant: base | nocodegen | arrayest | pandasest
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sdlt_spark.session import get_spark
from sdlt_spark.operators import dedup as D

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
VARIANT = sys.argv[1] if len(sys.argv) > 1 else "base"

t0 = time.time()


def mark(label):
    print(f"[{time.time() - t0:7.2f}s] {label}", flush=True)


spark = get_spark("profile_minhash")
mark("session up")

_cs = []
for _ in range(3):
    _c0 = time.time()
    spark.range(200_000_000, numPartitions=32).agg(F.sum("id")).collect()
    _cs.append(time.time() - _c0)
print(f"canary: {min(_cs):.3f}s {[round(c, 2) for c in _cs]}", flush=True)

df = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
df.count()
mark("scan warm")

id_col, text_col, threshold, num_hashes = "doc_id", "text", 0.9, 32
bands = D.tune_bands(num_hashes, threshold)
rows_per_band = num_hashes // bands
min_eq = D.estimate_min_eq(num_hashes, threshold)
mark(f"bands={bands} r={rows_per_band} min_eq={min_eq}")

if D._scan_underparallel(df):
    df = df.repartition(spark.sparkContext.defaultParallelism)

if VARIANT == "fused":
    th = D.token_hashes(df, id_col, text_col)
    aggs = [
        F.min((F.lit(a) * F.col("__h") + F.lit(b)) % D.MINHASH_PRIME).alias(f"h{i}")
        for i, (a, b) in enumerate(D.minhash_coeffs(num_hashes))
    ] + [F.collect_set("__h").alias("__toks")]
    combined = th.groupBy(id_col).agg(*aggs).persist()
    n_sig = combined.count()
    mark(f"combined sig+toks materialized ({n_sig} docs)")
    sig = combined.drop("__toks")
    cand = D.lsh_candidate_pairs(sig, id_col, bands, rows_per_band)
    # distinct moved AFTER the estimate filter (fewer rows to shuffle)
    from pyspark.sql import functions as _F

    def _bh(b):
        acc = _F.col(f"h{b * rows_per_band}")
        for r in range(1, rows_per_band):
            acc = (acc * D._BAND_K + _F.col(f"h{b * rows_per_band + r}")) % D.MINHASH_PRIME
        return acc

    band_hashes = _F.array(*[_bh(b) for b in range(bands)])
    banded = sig.select(_F.col(id_col), _F.posexplode(band_hashes).alias("band", "bh"))
    a_side, b_side = banded.alias("a"), banded.alias("b")
    cand_raw = a_side.join(
        b_side,
        (_F.col("a.band") == _F.col("b.band"))
        & (_F.col("a.bh") == _F.col("b.bh"))
        & (_F.col(f"a.{id_col}") < _F.col(f"b.{id_col}")),
    ).select(_F.col(f"a.{id_col}").alias("id_a"), _F.col(f"b.{id_col}").alias("id_b"))
    sa = sig.select(
        F.col(id_col).alias("id_a"),
        *[F.col(f"h{i}").alias(f"__ha{i}") for i in range(num_hashes)],
    )
    sb = sig.select(
        F.col(id_col).alias("id_b"),
        *[F.col(f"h{i}").alias(f"__hb{i}") for i in range(num_hashes)],
    )
    n_eq = sum(
        [(F.col(f"__ha{i}") == F.col(f"__hb{i}")).cast("int") for i in range(num_hashes)],
        F.lit(0),
    )
    est = (
        cand_raw.join(sa, "id_a").join(sb, "id_b").filter(n_eq >= min_eq)
        .select("id_a", "id_b")
        .distinct()
    )
    ta = combined.select(F.col(id_col).alias("id_a"), F.col("__toks").alias("__toks_a"))
    tb = combined.select(F.col(id_col).alias("id_b"), F.col("__toks").alias("__toks_b"))
    inter = F.size(F.array_intersect("__toks_a", "__toks_b"))
    union = F.size("__toks_a") + F.size("__toks_b") - inter
    out = (
        est.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn("jaccard", F.round(inter.cast("double") / union, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    out.write.mode("overwrite").format("noop").save()
    mark("verify + noop write done (COLD TOTAL)")
    t1 = time.time()
    out.write.mode("overwrite").format("noop").save()
    print(f"warm rerun full pipeline (cached combined): {time.time() - t1:.2f}s", flush=True)
    n = out.count()
    print(f"output pairs: {n}", flush=True)
    spark.stop()
    raise SystemExit(0)

if VARIANT == "noest":
    th = D.token_hashes(df, id_col, text_col).persist()
    sig = D._signatures_from_hashes(th, id_col, num_hashes).persist()
    n_sig = sig.count()
    mark(f"signatures materialized ({n_sig} docs)")
    toks_arr = th.groupBy(id_col).agg(F.collect_set("__h").alias("__toks")).persist()
    toks_arr.count()
    mark("token arrays materialized")
    cand = D.lsh_candidate_pairs(sig, id_col, bands, rows_per_band)
    ta = toks_arr.select(F.col(id_col).alias("id_a"), F.col("__toks").alias("__toks_a"))
    tb = toks_arr.select(F.col(id_col).alias("id_b"), F.col("__toks").alias("__toks_b"))
    inter = F.size(F.array_intersect("__toks_a", "__toks_b"))
    union = F.size("__toks_a") + F.size("__toks_b") - inter
    out = (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn("jaccard", F.round(inter.cast("double") / union, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    out.write.mode("overwrite").format("noop").save()
    mark("verify + noop write done (COLD TOTAL)")
    t1 = time.time()
    out.write.mode("overwrite").format("noop").save()
    print(f"warm rerun of final stage: {time.time() - t1:.2f}s", flush=True)
    print(f"output pairs: {out.count()}", flush=True)
    spark.stop()
    raise SystemExit(0)

if VARIANT == "slim":
    th = D.token_hashes(df, id_col, text_col)
    toks_arr = (
        th.groupBy(id_col).agg(F.sort_array(F.collect_set("__h")).alias("__toks")).persist()
    )
    n_docs = toks_arr.count()
    mark(f"token arrays materialized ({n_docs} docs)")
    p = D.MINHASH_PRIME
    sig_cols = [
        F.array_min(
            F.transform("__toks", lambda h: (F.lit(a) * h + F.lit(b)) % p)
        ).alias(f"h{i}")
        for i, (a, b) in enumerate(D.minhash_coeffs(num_hashes))
    ]
    sig = toks_arr.select(F.col(id_col), *sig_cols).persist()
    sig.count()
    mark("signatures derived from arrays")
    cand = D.lsh_candidate_pairs(sig, id_col, bands, rows_per_band)
    ta = toks_arr.select(F.col(id_col).alias("id_a"), F.col("__toks").alias("__toks_a"))
    tb = toks_arr.select(F.col(id_col).alias("id_b"), F.col("__toks").alias("__toks_b"))
    inter = F.size(F.array_intersect("__toks_a", "__toks_b"))
    union = F.size("__toks_a") + F.size("__toks_b") - inter
    out = (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn("jaccard", F.round(inter.cast("double") / union, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    out.write.mode("overwrite").format("noop").save()
    mark("verify + noop write done (COLD TOTAL)")
    t1 = time.time()
    out.write.mode("overwrite").format("noop").save()
    print(f"warm rerun of final stage: {time.time() - t1:.2f}s", flush=True)
    print(f"output pairs: {out.count()}", flush=True)
    spark.stop()
    raise SystemExit(0)

th = D.token_hashes(df, id_col, text_col).persist()
sig = D._signatures_from_hashes(th, id_col, num_hashes).persist()
n_sig = sig.count()
mark(f"signatures materialized ({n_sig} docs)")

cand = D.lsh_candidate_pairs(sig, id_col, bands, rows_per_band)

if VARIANT == "nocodegen":
    spark.conf.set("spark.sql.codegen.wholeStage", "false")

if VARIANT in ("base", "nocodegen"):
    sa = sig.select(
        F.col(id_col).alias("id_a"),
        *[F.col(f"h{i}").alias(f"__ha{i}") for i in range(num_hashes)],
    )
    sb = sig.select(
        F.col(id_col).alias("id_b"),
        *[F.col(f"h{i}").alias(f"__hb{i}") for i in range(num_hashes)],
    )
    n_eq = sum(
        [(F.col(f"__ha{i}") == F.col(f"__hb{i}")).cast("int") for i in range(num_hashes)],
        F.lit(0),
    )
    est = (
        cand.join(sa, "id_a").join(sb, "id_b").filter(n_eq >= min_eq)
        .select("id_a", "id_b")
        .persist()
    )
elif VARIANT == "arrayest":
    sig_arr = sig.select(
        F.col(id_col), F.array(*[f"h{i}" for i in range(num_hashes)]).alias("__sig")
    )
    sa = sig_arr.select(F.col(id_col).alias("id_a"), F.col("__sig").alias("__sig_a"))
    sb = sig_arr.select(F.col(id_col).alias("id_b"), F.col("__sig").alias("__sig_b"))
    n_eq = F.aggregate(
        F.zip_with("__sig_a", "__sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    est = (
        cand.join(sa, "id_a").join(sb, "id_b").filter(n_eq >= min_eq)
        .select("id_a", "id_b")
        .persist()
    )
elif VARIANT == "pandasest":
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def _neq(a: pd.Series, b: pd.Series) -> pd.Series:
        if not len(a):
            return pd.Series([], dtype="int32")
        aa = np.stack([np.asarray(v, dtype=np.int64) for v in a])
        bb = np.stack([np.asarray(v, dtype=np.int64) for v in b])
        return pd.Series((aa == bb).sum(axis=1).astype("int32"))

    sig_arr = sig.select(
        F.col(id_col), F.array(*[f"h{i}" for i in range(num_hashes)]).alias("__sig")
    )
    sa = sig_arr.select(F.col(id_col).alias("id_a"), F.col("__sig").alias("__sig_a"))
    sb = sig_arr.select(F.col(id_col).alias("id_b"), F.col("__sig").alias("__sig_b"))
    est = (
        cand.join(sa, "id_a").join(sb, "id_b")
        .filter(_neq("__sig_a", "__sig_b") >= min_eq)
        .select("id_a", "id_b")
        .persist()
    )
else:
    raise SystemExit(f"unknown variant {VARIANT}")

n_est = est.count()
if VARIANT == "nocodegen":
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
mark(f"estimate survivors materialized ({n_est} pairs)")

toks_arr = th.groupBy(id_col).agg(F.collect_set("__h").alias("__toks")).persist()
toks_arr.count()
mark("token arrays materialized")

ta = toks_arr.select(F.col(id_col).alias("id_a"), F.col("__toks").alias("__toks_a"))
tb = toks_arr.select(F.col(id_col).alias("id_b"), F.col("__toks").alias("__toks_b"))
inter = F.size(F.array_intersect("__toks_a", "__toks_b"))
union = F.size("__toks_a") + F.size("__toks_b") - inter
out = (
    est.join(ta, "id_a")
    .join(tb, "id_b")
    .withColumn("jaccard", F.round(inter.cast("double") / union, 4))
    .filter(F.col("jaccard") >= threshold)
    .select("id_a", "id_b", "jaccard")
)
out.write.mode("overwrite").format("noop").save()
mark("verify + noop write done (COLD TOTAL)")

t1 = time.time()
out.write.mode("overwrite").format("noop").save()
print(f"warm rerun of final stage: {time.time() - t1:.2f}s", flush=True)
spark.stop()
