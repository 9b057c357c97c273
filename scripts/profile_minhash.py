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

_c0 = time.time()
spark.range(200_000_000, numPartitions=32).agg(F.sum("id")).collect()
print(f"canary: {time.time() - _c0:.3f}s", flush=True)

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
