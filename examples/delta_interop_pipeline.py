"""Delta Lake interop, both directions and both modes — the way a team
bridging an existing Delta deployment onto this engine would use it:

    python examples/delta_interop_pipeline.py [sf_dir]

inbound (their Delta table -> this engine)
  -> DeltaTableReader: snapshot + versionAsOf over a real _delta_log
  -> deletion-vector table: roaring sidecars applied, rows never
     resurrect (the default table shape from modern Delta writers)
  -> table_changes: batch Change Data Feed (cdc actions / add-remove /
     DV-diff derivation)
  -> readStream.format("delta_cdc"): the same log as a micro-batch stream

outbound (this engine -> their Delta readers)
  -> export_vintage_to_delta: hard-linked snapshot publish, DVs folded
     WITHOUT touching the source
  -> incremental sync: mutate the vintage table, re-export — one new
     Delta version carrying only the diff
  -> vacuum_delta_export: retention-windowed cleanup of tombstones

Everything is metadata-plane driver work + declarative scans; see
SCALE.md ("Delta interop at scale").
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from sdlt_spark import tables  # noqa: E402
from sdlt_spark.session import get_spark  # noqa: E402
from sdlt_spark.store.delta_dv import write_dv_file  # noqa: E402
from sdlt_spark.store.delta_read import DeltaTableReader  # noqa: E402
from sdlt_spark.store.delta_write import (  # noqa: E402
    DeltaLogWriter,
    export_vintage_to_delta,
    vacuum_delta_export,
)
from sdlt_spark.store.vintage import VintageTable  # noqa: E402
from sdlt_spark.streaming.delta_source import DeltaChangeDataSource  # noqa: E402


def main(sf_dir: str) -> None:
    spark = get_spark("delta-interop-example")
    work = tempfile.mkdtemp(prefix="delta_interop_")

    # ---- inbound: a "foreign" Delta table with deletion vectors --------
    their_table = os.path.join(work, "their_orders")
    proj = (
        tables.load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("o_totalprice"))
        .coalesce(1)
    )
    data_dir = os.path.join(their_table, "full")
    proj.write.parquet(data_dir)
    rels = [f"full/{f}" for f in sorted(os.listdir(data_dir)) if f.endswith(".parquet")]
    w = DeltaLogWriter(their_table)
    w.commit(adds=[(r, {}) for r in rels], schema_json=proj.schema.json())
    # simulate their DELETE: a roaring DV hiding the F-status rows
    dvs = {}
    for i, rel in enumerate(rels):
        status = pq.read_table(
            os.path.join(their_table, rel), columns=["o_orderstatus"]
        ).column("o_orderstatus").to_pylist()
        pos = [p for p, s in enumerate(status) if s == "F"]
        if pos:
            dvs[rel] = write_dv_file(
                their_table, pos, f"00000000-0000-4000-8000-{i:012d}"
            )
    w.commit(adds=[(r, {}) for r in rels if r in dvs], dvs=dvs, operation="DELETE")

    r = DeltaTableReader(spark, their_table)
    now, v0 = r.read().count(), r.read(version=0).count()
    print(f"[inbound] snapshot={now} rows, versionAsOf(0)={v0} rows (DV applied)")

    cdf = r.table_changes(1)
    print("[inbound] CDF of the DELETE commit:")
    cdf.groupBy("_change_type").count().show()

    spark.dataSource.register(DeltaChangeDataSource)
    q = (
        spark.readStream.format("delta_cdc")
        .option("path", their_table)
        .option("startingVersion", 0)
        .load()
        .writeStream.format("memory")
        .queryName("their_changes")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    print("[inbound] streamed change rows:", spark.table("their_changes").count())

    # ---- outbound: vintage table -> Delta export + incremental sync ----
    mine = VintageTable(spark, os.path.join(work, "mine"))
    mine.write(proj, num_files=4)
    mine.delete("o_orderstatus = 'F'", mode="dv")  # merge-on-read delete
    export = os.path.join(work, "export")
    v = export_vintage_to_delta(mine, export)
    print(f"[outbound] exported v{v}; source still has its DVs "
          f"(never materialized): {mine.latest_version()=}")

    mine.write(
        proj.filter(F.col("o_orderstatus") == "P").withColumn(
            "o_totalprice", F.lit(0.0)
        ),
        mode="overwrite",
        replace_where="o_orderstatus = 'P'",
    )
    v = export_vintage_to_delta(mine, export)
    er = DeltaTableReader(spark, export)
    print(f"[outbound] sync -> export v{v}; reader sees "
          f"{er.read().count()} rows; history={[h['version'] for h in er.history()]}")
    swept = vacuum_delta_export(export, retention_hours=0.0)
    print(f"[outbound] vacuum swept {len(swept)} tombstoned file(s)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
