"""Measure the dhash-at-ingest amortization (round-9 verdict item 4):
build the (media_id, dhash_hi, dhash_lo) index ONCE per corpus (the
decode pass — the heaviest per-byte CPU in the media family), then time
the near-dup SWEEP alone over the stored hashes at sf0.1 and the sf1
replica. The claim under test: the sweep scales like the relational core
(~1.6x for 10x data), because it never touches a payload byte — banding
shuffle on 16-byte keys + codegen'd popcount only.

Usage: python scripts/dhash_index_scale.py [sf01_dir] [sf1_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main(sf01: str, sf1: str) -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        # 32 concurrent Arrow-batched BMP encode/decode tasks need real
        # heap at sf1 (the plain 1g default OOMs in the index build)
        .config("spark.driver.memory", os.environ.get("SDLT_SIM_DRIVER_MEM", "8g"))
        .appName("dhash-index-scale")
        .getOrCreate()
    )
    from sdlt_spark.operators import multimodal as mm
    from sdlt_spark.queries import _dhash_fixture_media

    out: dict[str, dict] = {}
    for tag, sf_dir in (("sf0.1", sf01), ("sf1", sf1)):
        idx = f"/tmp/sdlt_dhash_idx_{tag}"
        t0 = time.time()
        media = _dhash_fixture_media(spark, sf_dir)
        (
            mm.image_dhash(media)
            .filter(F.col("decode_error").isNull())
            .select("media_id", "dhash_hi", "dhash_lo")
            .write.mode("overwrite")
            .parquet(idx)
        )
        build = round(time.time() - t0, 2)
        # the sweeps alone, over the STORED index (warm pass of 2):
        # 8 byte-wide bands (hamming <= 7; 256 buckets/band — the dense
        # setting that goes ~n^2/32) vs 4 x 16-bit bands (hamming <= 3;
        # 65,536 buckets/band — the 100 TB setting)
        res = {"docs": spark.read.parquet(idx).count(), "index_build_s": build}
        for key, kw in (
            ("sweep8_s", dict(max_hamming=7, num_bands=8)),
            ("sweep4_s", dict(max_hamming=3, num_bands=4)),
        ):
            best = None
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.time()
                mm.dhash_neardup_indexed(
                    spark.read.parquet(idx), **kw
                ).write.mode("overwrite").format("noop").save()
                el = round(time.time() - t0, 2)
                best = el if best is None else min(best, el)
            res[key] = best
        out[tag] = res
        print(tag, json.dumps(res), flush=True)
    for key in ("sweep8_s", "sweep4_s"):
        out[f"{key}_ratio_10x"] = round(
            out["sf1"][key] / max(out["sf0.1"][key], 1e-9), 2
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1",
        sys.argv[2] if len(sys.argv) > 2 else "/tmp/sdlt_sf1",
    )
