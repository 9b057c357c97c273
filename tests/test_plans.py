"""Physical-plan regression tests (SURVEY.md §4): the scale properties —
pushdown, pruning, broadcast, top-k — must be visible in the plan, not
assumed. These guard against regressions that stay correct but stop scaling.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import sdlt_spark.queries as q

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    fn, _ = q.registry()[name]
    return fn(spark, SF)._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    plan = plan_of(spark, "filter_eq")
    assert "PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)" in plan


def test_column_pruning(spark):
    plan = plan_of(spark, "projection")
    # scan must read only the 3 projected columns
    assert "ReadSchema: struct<c_custkey:bigint,c_name:string,c_mktsegment:string>" in plan


def test_join_inner_broadcasts_dim(spark):
    plan = plan_of(spark, "join_inner")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_top_k_uses_take_ordered(spark):
    plan = plan_of(spark, "top_k")
    assert "TakeOrderedAndProject" in plan


def test_groupby_agg_partial_aggregation(spark):
    """HashAggregate must appear twice (partial + final) around the exchange:
    map-side combine is what keeps the shuffle linear in groups, not rows."""
    plan = plan_of(spark, "groupby_agg")
    assert plan.count("HashAggregate") >= 2


def test_whole_stage_codegen_on_hot_path(spark):
    # AQE only finalizes codegen stages at execution; materialize first
    fn, _ = q.registry()["groupby_agg"]
    df = fn(spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # codegen stages appear as "*(n) Operator" in the simple plan string
    assert "*(1) HashAggregate" in plan or "*(2) HashAggregate" in plan


def test_asof_join_single_shuffle(spark):
    """The as-of join must cost exactly one hash exchange of the unioned
    stream (plus the tiny dedup window), never a nested-loop range join."""
    plan = plan_of(spark, "asof_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_entry_flagship_broadcasts(spark):
    import __spark_entry__ as e

    plan = e.entry(spark)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # lineitem filter pushed to scan
    assert "PushedFilters" in plan


def test_tpch_q5_broadcasts_all_dims(spark):
    """Star join: every dim must broadcast; only lineitem⋈orders and the
    final group-by may shuffle."""
    plan = plan_of(spark, "tpch_q5_shape")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan


def test_merge_upsert_no_cartesian(spark):
    plan = plan_of(spark, "merge_upsert")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dedup_exact_shuffles_fingerprint_only(spark):
    """The exchange key must be the md5 fingerprint, not the document text:
    text is pruned before the shuffle by partial aggregation."""
    plan = plan_of(spark, "dedup_exact")
    assert "hashpartitioning(fp" in plan


def test_scan_parallelism_matches_split_size(spark):
    """maxPartitionBytes=4MB must split the 10MB lineitem file into >1 scan
    task (the 128MB default would read it as one)."""
    from sdlt_spark import tables

    df = tables.load(spark, "/root/testdata/sf0.1", "lineitem")
    assert df.rdd.getNumPartitions() >= 2


def test_tpch_q1_partial_agg_and_pushdown(spark):
    """Q1 shape: date filter reaches the scan; aggregation is partial+final
    (map-side combine makes the shuffle carry groups, not rows)."""
    plan = plan_of(spark, "tpch_q1_shape")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    assert plan.count("HashAggregate") >= 2


def test_tpch_q6_all_predicates_pushed(spark):
    plan = plan_of(spark, "tpch_q6_shape")
    pushed = plan.split("PushedFilters: [")[1].split("]")[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, pushed


def test_range_join_broadcasts_bands(spark):
    """Non-equi band join must be BroadcastNestedLoopJoin (bands in memory,
    fact side streamed) — never a cartesian shuffle."""
    plan = plan_of(spark, "range_join")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_scalar_subquery_broadcasts_cutoff(spark):
    plan = plan_of(spark, "scalar_subquery")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_minhash_dedup_broadcasts_side_tables(spark):
    """The per-doc side tables (signatures, token arrays) are persisted AND
    materialized before planning, so Catalyst sees their true cached size
    and picks broadcast-hash joins for the candidate-pair enrichment — with
    NO explicit broadcast hint (at real scale the same stats make it fall
    back to a shuffle join instead of OOMing an executor). The banding
    self-join must shuffle only compact (id, band, bh) rows.

    materialize=False keeps the lazy plan inspectable (the registry's
    default eagerly checkpoints and releases the caches, which collapses
    the executed plan to a checkpoint scan)."""
    from sdlt_spark import tables
    from sdlt_spark.operators import dedup as _dd

    docs = tables.load(spark, SF, "documents")
    plan = (
        _dd.minhash_dedup(
            docs, "doc_id", threshold=0.9, estimate_prefilter=False,
            materialize=False,
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    try:
        assert "SortMergeJoin" not in plan, plan
        # the final (verify) stage joins the persisted estimate survivors
        # against the two token-array sides; the estimate stage's own
        # signature joins ran during construction (its survivors appear
        # here as an InMemoryTableScan)
        assert plan.count("BroadcastHashJoin") >= 2, plan
        assert "InMemoryTableScan" in plan, plan
        # no manual broadcast hints anywhere in the operator
        import inspect

        from sdlt_spark.operators import dedup as _d

        assert "F.broadcast(" not in inspect.getsource(_d.minhash_dedup)
    finally:
        spark.catalog.clearCache()


def test_embed_ops_are_map_only(spark):
    """Normalization and quantization must plan as pure scans + projections:
    any Exchange here would mean a pointless full-corpus shuffle at 100 TB."""
    for name in ("embed_normalize", "embed_quantize"):
        assert "Exchange" not in plan_of(spark, name), name


def test_corpus_prep_partial_aggregation(spark):
    """Both aggregations in the pipeline (fp-dedup and the final stats) must
    partial-aggregate before their exchanges."""
    plan = plan_of(spark, "corpus_prep")
    assert plan.count("HashAggregate") >= 4


def test_salted_groupby_two_phase(spark):
    """The salted rewrite must show both aggregation phases; the salt must
    not survive into the output schema."""
    fn, _ = q.registry()["salted_groupby"]
    df = fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 4  # (key,salt) partial+final, then key partial+final
    assert "__salt" not in df.columns


def test_q18_back_joins_broadcast(spark):
    """After the HAVING filter the big-orders set is tiny; AQE must turn
    both back-joins into broadcasts — re-shuffling the fact output into a
    SortMergeJoin is the plan that stops scaling."""
    fn, _ = q.registry()["tpch_q18_shape"]
    df = fn(spark, SF)
    df.collect()  # AQE finalizes join strategies at execution
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_runtime_bloom_filter_injects(spark):
    """At 100 TB the selective side of a shuffle join should runtime-filter
    the big side's scan (Spark's runtime bloom filter, SPARK-32268) so most
    fact rows die before the exchange. Local fixture sizes are below the
    injection thresholds, so lower them to zero and force the shuffle join
    path; the point is asserting the rewrite fires when sizes warrant it."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "1GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        import sdlt_spark.tables as tables

        o = tables.load(spark, SF, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = tables.load(spark, SF, "lineitem")
        j = li.join(o, li.l_orderkey == o.o_orderkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_q19_pushes_derived_single_side_predicates(spark):
    """The disjunctive Q19 predicate spans both join sides; Catalyst must
    still derive and push the single-side implications (brand IN (...) on
    the part scan) instead of scanning everything into the join."""
    plan = plan_of(spark, "tpch_q19_shape")
    # brand/size disjunction lands in the part scan's PushedFilters …
    assert "Or(Or(And(EqualTo(p_brand" in plan, plan
    # … and the derived quantity disjunction in the lineitem scan's
    assert "GreaterThanOrEqual(l_quantity,1.0)" in plan, plan


def test_q4_exists_becomes_semi_join_with_pushdown(spark):
    plan = plan_of(spark, "tpch_q4_shape")
    assert "LeftSemi" in plan
    # both scans keep their pushed filters
    assert "EqualTo(l_returnflag,R)" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_q22_anti_join_prunes_order_columns(spark):
    """NOT EXISTS side must be column-pruned to the join key before its
    shuffle — at 100 TB shipping whole order rows to an anti join is the
    difference between a key exchange and a table exchange."""
    plan = plan_of(spark, "tpch_q22_shape")
    assert "ReadSchema: struct<o_custkey:bigint>" in plan, plan


def test_pack_sequences_sharded_single_shuffle(spark):
    """Sharded packing must shuffle once on the shard key; the running sum
    and the final per-sequence aggregate reuse that partitioning (the
    aggregate keys are a superset of the window keys)."""
    plan = plan_of(spark, "pack_sequences_sharded")
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_url_blocklist_broadcasts_blocklist(spark):
    """The blocklist probe must be a broadcast hash join: a shuffle of the
    URL table to check membership in a small dim is the classic scale bug."""
    plan = plan_of(spark, "url_blocklist")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pii_redact_is_map_only(spark):
    """Redaction is pure projection work — any Exchange means something
    snuck a shuffle into a scan-riding operator."""
    plan = plan_of(spark, "pii_redact")
    assert "Exchange" not in plan


def test_boilerplate_dedup_shuffles_fingerprints_not_segments(spark):
    """The corpus-frequency agg must key on the md5 fingerprint (fp), never
    raw segment text: hashpartitioning on fp is the 16-byte-key shuffle."""
    plan = plan_of(spark, "boilerplate_dedup")
    assert "hashpartitioning(fp" in plan


def test_passage_overlap_prefilters_hot_fingerprints(spark):
    """The stop-fingerprint cut must happen BEFORE the self-join: the plan
    joins two filtered sides, so no > 50-doc fingerprint ever reaches the
    pair-generating join."""
    df, fps = q._passage_overlap_lazy(spark, SF)
    try:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        # the ndocs <= 50 aggregate-filter feeds the join (appears as a
        # frequency aggregate upstream of the final pair count)
        assert plan.count("Aggregate") >= 3  # freq cut + pair count (+partials)
    finally:
        fps.unpersist()


def test_partitioned_write_scan_prunes_directories(spark):
    """The status filter must prune at the directory level: every file the
    scan reads lives under the o_orderstatus=F partition directory, and the
    plan carries it as a PartitionFilter (no data IO for other statuses)."""
    fn, _ = q.registry()["partitioned_write_scan"]
    df = fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the status predicate must appear as a PartitionFilter on the scan
    # (directory-level pruning), not (only) a post-scan Filter. NB
    # df.inputFiles() deliberately lists the unpruned file index, so the
    # plan string is the right oracle here.
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan, plan
    assert "(o_orderstatus" in plan.split("PartitionFilters")[1][:80], plan


def test_skew_join_salts_big_side(spark):
    """The salted join must fan the big side by a deterministic salt
    (pmod(xxhash64(event_id))) and replicate the small side — visible as
    the salt expression in the optimized plan."""
    fn, _ = q.registry()["skew_join"]
    plan = fn(spark, SF)._jdf.queryExecution().optimizedPlan().toString()
    assert "pmod" in plan and "xxhash64" in plan, plan


def test_inverted_index_partial_aggregates(spark):
    """Posting-list assembly must partial-aggregate map-side and shuffle on
    the term key only — never document bodies."""
    plan = plan_of(spark, "inverted_index")
    assert "hashpartitioning(term" in plan, plan
    # collect_set runs as ObjectHashAggregate with a partial phase
    assert plan.count("ObjectHashAggregate") >= 2 or plan.count("SortAggregate") >= 2, plan


def test_entity_resolution_blocks_not_cross_join(spark):
    """Candidate generation must be an equi join on the blocking key —
    a CartesianProduct/BroadcastNestedLoopJoin here means all-pairs ER."""
    plan = plan_of(spark, "entity_resolution")
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan, plan


def test_bm25_topk_plan(spark):
    """BM25 must end in TakeOrderedAndProject (per-partition top-k, no full
    sort) with the idf/stats sides broadcast onto the tf table."""
    plan = plan_of(spark, "bm25_topk")
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.count("BroadcastHashJoin") >= 1, plan
    assert "CartesianProduct" not in plan, plan


def test_dpp_join_prunes_partitions_at_runtime(spark):
    """The fact scan must carry a dynamicpruning PartitionFilter fed by the
    dim's filtered keys — only matching partition directories are read."""
    fn, _ = q.registry()["dpp_join"]
    plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan


def test_delta_dv_read_plan_splits_covered_files(spark, tmp_path):
    """A DV-bearing Delta snapshot read must scan DV-free files WITHOUT
    any join and route only the covered files through the anti-join (at
    100 TB the difference is shuffling GBs vs the whole table); the
    partition-value map must attach via broadcast, never a shuffle."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from sdlt_spark.store.delta_dv import write_dv_file
    from sdlt_spark.store.delta_read import DeltaTableReader
    from sdlt_spark.store.delta_write import DeltaLogWriter

    root = str(tmp_path / "dt")
    os.makedirs(root)
    schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "k", "type": "long", "nullable": True, "metadata": {}},
                {"name": "r", "type": "integer", "nullable": True, "metadata": {}},
            ],
        }
    )
    adds = []
    for r in range(4):
        rel = f"r={r}/p.parquet"
        os.makedirs(os.path.join(root, f"r={r}"), exist_ok=True)
        pq.write_table(
            pa.table({"k": pa.array(range(r * 10, r * 10 + 10), pa.int64())}),
            os.path.join(root, rel),
        )
        adds.append((rel, {"r": str(r)}))
    w = DeltaLogWriter(root)
    w.commit(adds=adds, schema_json=schema, partition_columns=["r"])
    dv = write_dv_file(root, [0, 1], "00000000-0000-4000-8000-0000000000bb")
    w.commit(adds=[("r=0/p.parquet", {"r": "0"})], dvs={"r=0/p.parquet": dv})
    df = DeltaTableReader(spark, root).read()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # exactly two scans: the DV-free bulk and the covered subset
    assert plan.count("Scan parquet") == 2, plan
    # one anti-join (covered subset only)
    assert plan.count("LeftAnti") == 1, plan
    # partition map joins are broadcast (2 of them, one per branch)
    assert "BroadcastHashJoin" in plan, plan
    assert sorted(x["k"] for x in df.collect()) == sorted(
        set(range(40)) - {0, 1}
    )


def test_delta_plain_read_is_bare_pruned_scan(spark, tmp_path):
    """A DV-free unpartitioned Delta read must compile to a BARE parquet
    scan: filters pushed, unused columns pruned, and no _metadata struct
    construction (the identity keys only attach when DVs or partition
    maps actually need them)."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from sdlt_spark.store.delta_read import DeltaTableReader
    from sdlt_spark.store.delta_write import DeltaLogWriter

    root = str(tmp_path / "dt")
    os.makedirs(root)
    pq.write_table(
        pa.table(
            {
                "k": pa.array(range(100), pa.int64()),
                "v": pa.array([f"v{i}" for i in range(100)], pa.string()),
                "w": pa.array([float(i) for i in range(100)], pa.float64()),
            }
        ),
        f"{root}/a.parquet",
    )
    schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "k", "type": "long", "nullable": True, "metadata": {}},
                {"name": "v", "type": "string", "nullable": True, "metadata": {}},
                {"name": "w", "type": "double", "nullable": True, "metadata": {}},
            ],
        }
    )
    w = DeltaLogWriter(root)
    w.commit(adds=[("a.parquet", {})], schema_json=schema)
    df = (
        DeltaTableReader(spark, root)
        .read()
        .filter(F.col("k") > 90)
        .select("k", "v")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(k), GreaterThan(k,90)]" in plan, plan
    assert "ReadSchema: struct<k:bigint,v:string>" in plan, plan  # w pruned
    assert "_metadata" not in plan, plan  # no identity-key residue
    assert [x["k"] for x in df.collect()] == list(range(91, 100))


def test_partitioned_import_read_is_single_scan_broadcast_join(spark, tmp_path):
    """A zero-copy partitioned Delta import's vintage read must be ONE
    parquet scan over all files plus ONE broadcast map join attaching the
    constant columns — no per-partition union fan-out, however many
    partitions the source had (the same plan shape the Delta reader's own
    partitioned read asserts)."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from sdlt_spark.store.delta_read import import_delta_to_vintage
    from sdlt_spark.store.delta_write import DeltaLogWriter

    root = str(tmp_path / "dt")
    adds = []
    for r in range(8):
        rel = f"r={r}/a.parquet"
        os.makedirs(os.path.join(root, f"r={r}"))
        pq.write_table(
            pa.table({"k": pa.array([r * 10, r * 10 + 1], pa.int64())}),
            os.path.join(root, rel),
        )
        adds.append((rel, {"r": str(r)}))
    schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "k", "type": "long", "nullable": True, "metadata": {}},
                {"name": "r", "type": "integer", "nullable": True, "metadata": {}},
            ],
        }
    )
    w = DeltaLogWriter(root)
    w.commit(adds=adds, schema_json=schema, partition_columns=["r"])
    t = import_delta_to_vintage(spark, root, str(tmp_path / "vt"))
    df = t.read()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan   # ONE scan, 8 partitions
    assert "BroadcastHashJoin" in plan, plan       # map join, not a shuffle
    assert "SortMergeJoin" not in plan, plan
    assert "Union" not in plan, plan               # no per-partition fan-out
    assert df.count() == 16


def test_bigram_logprob_broadcasts_vocab_scalar(spark):
    """Bigram extraction must be map-only (zip_with over slices — no
    posexplode + lead() window over tokens for adjacency; the ONLY window
    allowed is the round-13 context-count sum OVER the aggregated
    histogram, O(distinct bigrams)) and the vocab size a 1-row broadcast;
    the histogram join may broadcast or shuffle (AQE), but never a
    cartesian product. Round 13: the context count is derived from the
    pair histogram, so the plan holds exactly THREE corpus scans (bigram
    rows, pair histogram, vocabulary) — a fourth means the separate
    c(w1) corpus pass regressed back in."""
    plan = plan_of(spark, "bigram_logprob")
    assert "zip_with" in plan  # adjacency came from zip_with...
    assert "lead(" not in plan  # ...never a per-token window
    assert plan.count("Location: InMemoryFileIndex") == 3
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row vocab crossJoin
    assert "CartesianProduct" not in plan


def test_dhash_neardup_bands_not_all_pairs(spark):
    """Candidate pairs come from the (chunk, probe-key) equi-join — the
    plan must contain a hash join on those keys and no cartesian
    product. materialize=False keeps the lazy plan inspectable (the
    registry entry eagerly checkpoints so the decode UDF runs once —
    round-12 ADVICE fix — which replaces the plan with a LogicalRDD
    scan)."""
    from sdlt_spark.operators import multimodal as mm
    from sdlt_spark.queries import _dhash_fixture_media

    out = mm.dhash_neardup(
        _dhash_fixture_media(spark, SF), max_hamming=7, materialize=False
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # materialize=False: caller owns the persist via the exposed handle —
    # targeted release, never a session-wide clearCache (ADVICE round 12)
    out.cached_decode_frame.unpersist()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "chunk" in plan and ("SortMergeJoin" in plan or "HashJoin" in plan)


def test_row_tracking_read_is_scan_plus_broadcast_map(spark, tmp_path):
    """read_with_row_ids = ONE parquet scan + ONE broadcast (file -> base)
    map join; no shuffle, no second scan, at any file count."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os

    from sdlt_spark.store.delta_read import DeltaTableReader
    from sdlt_spark.store.delta_write import (
        DeltaLogWriter,
        allocate_base_row_ids,
        row_tracking_configuration,
        row_tracking_protocol,
    )

    root = str(tmp_path / "rtp")
    import json as _json

    schema = _json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "k", "type": "long", "nullable": True, "metadata": {}}
            ],
        }
    )
    adds = []
    for i in range(4):
        rel = f"data/f{i}.parquet"
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        pq.write_table(
            pa.table({"k": pa.array(range(i * 10, i * 10 + 5), pa.int64())}),
            os.path.join(root, rel),
        )
        adds.append((rel, {}))
    base, hwm = allocate_base_row_ids(root, [r for r, _ in adds], prior_hwm=-1)
    DeltaLogWriter(root).commit(
        adds=adds,
        schema_json=schema,
        protocol=row_tracking_protocol(),
        configuration=row_tracking_configuration(),
        base_row_ids=base,
        row_id_high_water_mark=hwm,
    )
    df = DeltaTableReader(spark, root).read_with_row_ids()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan  # no shuffle anywhere


def test_heavy_hitters_recount_broadcasts_candidates(spark):
    """Pass 2 must semi-join the BROADCAST candidate set before the
    aggregation (the whole point: shuffle O(candidates) groups, not the
    vocabulary); the corpus total rides the MG pass as a literal, so no
    scalar join of any kind appears."""
    plan = plan_of(spark, "heavy_hitters")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_weighted_sample_is_take_ordered(spark):
    """The Efraimidis-Spirakis draw must compile to TakeOrderedAndProject
    (per-partition top-n heaps) — no global Sort materialization, no
    shuffle of the corpus."""
    plan = plan_of(spark, "weighted_sample")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan
