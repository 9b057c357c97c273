"""Row-level Delta mutations with full modern-table semantics — the way a
team that owns a production Delta table would run this engine against it:

    python examples/delta_mutations_pipeline.py [sf_dir]

1. create a Delta table with Change Data Feed + Row Tracking + a CHECK
   constraint + a generated column, straight from parquet
2. DELETE (copy-on-write) / UPDATE / MERGE it — commits are
   spec-conforming: only touched files rewrite, removes name the
   canceled (path, dvId), stable row ids materialize through rewrites,
   generated columns recompute, constraints abort bad writes
3. read the Change Data Feed: the UPDATE surfaces as
   update_preimage/update_postimage pairs (real cdc actions, not the
   delete+insert a derivation-based feed degrades to)
4. read row ids: stable across every mutation
5. OPTIMIZE the small files away (dataChange=false, ids preserved)

Everything below is declarative scans + metadata-plane commits; see
SCALE.md ("Round 7: Delta mutations", "Round 7 (cont. 2/3)").
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sdlt_spark import tables  # noqa: E402
from sdlt_spark.session import get_spark  # noqa: E402
from sdlt_spark.store.delta_mutate import (  # noqa: E402
    delete_delta_export,
    merge_delta_export,
    update_delta_export,
)
from sdlt_spark.store.delta_read import DeltaTableReader  # noqa: E402
from sdlt_spark.store.delta_write import (  # noqa: E402
    DeltaLogWriter,
    allocate_base_row_ids,
    optimize_delta_export,
    row_tracking_configuration,
    row_tracking_protocol,
)


def main(sf_dir: str) -> None:
    spark = get_spark("delta-mutations-example")
    root = tempfile.mkdtemp(prefix="sdlt_example_mut_") + "/orders"

    # -- 1. a modern Delta table: CDF + row tracking + constraint + gen col
    proj = tables.load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        (F.round("o_totalprice", 2) * 2).alias("o_double"),
    )
    schema = json.loads(proj.schema.json())
    for f in schema["fields"]:
        if f["name"] == "o_double":
            f["metadata"]["delta.generationExpression"] = "o_totalprice * 2"
    abs_dir = os.path.join(root, "c0")
    proj.coalesce(2).write.parquet(abs_dir)
    adds = [
        (f"c0/{f}", {})
        for f in sorted(os.listdir(abs_dir))
        if f.endswith(".parquet")
    ]
    base, hwm = allocate_base_row_ids(root, [r for r, _ in adds], prior_hwm=-1)
    DeltaLogWriter(root).commit(
        adds=adds,
        schema_json=json.dumps(schema),
        protocol=row_tracking_protocol(),
        configuration={
            **row_tracking_configuration(),
            "delta.enableChangeDataFeed": "true",
            "delta.constraints.positive_price": "o_totalprice > 0",
        },
        base_row_ids=base,
        row_id_high_water_mark=hwm,
    )
    reader = DeltaTableReader(spark, root)
    print(f"v0: {reader.read().count()} rows, row-id HWM {hwm}")

    # -- 2. mutate: DELETE + UPDATE + MERGE
    v1 = delete_delta_export(root, spark, "o_orderstatus = 'F'", mode="cow")
    v2 = update_delta_export(
        root, spark, "o_orderkey % 10 = 0", {"o_totalprice": "o_totalprice + 1"}
    )
    src = (
        reader.read()
        .filter(F.col("o_orderkey") % 100 == 1)
        .withColumn("o_orderstatus", F.lit("X"))
        .limit(50)
    )
    v3 = merge_delta_export(root, spark, src, on=["o_orderkey"])
    print(f"mutations committed as v{v1}, v{v2}, v{v3}")

    # -- 3. the change feed shows the UPDATE as pre/post images
    changes = reader.table_changes(v2, v2)
    kinds = {
        r["_change_type"]: r["n"]
        for r in changes.groupBy("_change_type").agg(F.count("*").alias("n")).collect()
    }
    print(f"CDF at v{v2}: {kinds}")
    assert set(kinds) == {"update_preimage", "update_postimage"}, kinds

    # -- 4. row ids are stable across all three mutations
    ids = reader.read_with_row_ids()
    n_ids = ids.select("row_id").distinct().count()
    n_rows = ids.count()
    print(f"row ids: {n_rows} rows, {n_ids} distinct stable ids")
    assert n_ids == n_rows

    # -- 5. compact; ids still stable, content unchanged
    before = ids.agg(F.sum("row_id")).first()[0]
    produced = optimize_delta_export(root, spark, target_file_bytes=1 << 30)
    after = reader.read_with_row_ids().agg(F.sum("row_id")).first()[0]
    print(f"OPTIMIZE rewrote {len(produced)} file(s); id-sum stable: {before == after}")
    assert before == after
    print("delta mutations pipeline complete:", root)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
