"""Physical-plan shape assertions: the scale contract, checked mechanically.

These tests pin the properties that make the engine viable at 100 TB —
filters reach the parquet scan, projections prune columns, small dims
broadcast, top-k never full-sorts, salting avoids nested-loop fallbacks —
so a regression in plan shape fails CI even while results stay correct.
"""

from __future__ import annotations

import pytest

from restaurant_etl_spark.operators.registry import load_all

SPECS = load_all()


def _plan(spark, sf_dir, name: str) -> str:
    df = SPECS[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushed_to_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # partial aggregation before the exchange (map-side combine)
    assert "HashAggregate" in plan and "Exchange" in plan


def test_q6_column_pruning_and_codegen(spark, sf_dir):
    df = SPECS["q6_forecast_revenue"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # scan must read only the 4 referenced columns, not the 11-column table
    scan_line = next(l for l in plan.split("\n") if "FileScan parquet" in l)
    proj = scan_line.split("[", 1)[1].split("]", 1)[0]
    assert "l_extendedprice" in proj and "l_returnflag" not in proj
    # codegen spans appear once AQE finalizes — execute, then re-read
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    # "*(N)" prefixes mark whole-stage-codegen spans in the final plan
    assert "isFinalPlan=true" in final and "*(1)" in final


def test_q5_broadcasts_bounded_dims(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q5_region_revenue")
    assert plan.count("BroadcastHashJoin") >= 2  # nation + region at least
    assert "CartesianProduct" not in plan


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "sort_topk_orders")
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no global sort for a limit-20


def test_semi_anti_join_plans(spark, sf_dir):
    assert "LeftSemi" in _plan(spark, sf_dir, "join_semi")
    assert "LeftAnti" in _plan(spark, sf_dir, "join_anti")


def test_salted_join_is_hash_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_salted_skew")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_range_band_join_broadcasts_tiny_side(spark, sf_dir):
    # non-equi join against the 3-row band table must broadcast, not shuffle
    plan = _plan(spark, sf_dir, "join_range_bands")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_topk_cosine_broadcasts_queries(spark, sf_dir):
    plan = _plan(spark, sf_dir, "similarity_topk_cosine")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_menu_parser_single_window_shuffle(spark, sf_dir):
    """The rule parser must stay narrow + one window partitioning on doc_id
    (plus the small description-agg exchange) — no joins that explode."""
    plan = _plan(spark, sf_dir, "menu_parse_items")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_tfidf_vocabulary_join_unhinted(spark, sf_dir):
    """The tf⋈df join must NOT carry a broadcast hint: at 100 TB the
    vocabulary can exceed the broadcast threshold and a forced hint OOMs
    the driver. AQE is free to pick broadcast at runtime when df turns out
    small — the logical plan just can't force it. The only legitimate hint
    is the single-row n_docs count."""
    df = SPECS["text_tfidf_top_terms"].fn(spark, sf_dir)
    logical = df._jdf.queryExecution().analyzed().toString()
    # exactly one hint (n_docs), not two (n_docs + vocabulary)
    assert logical.count("UnresolvedHint") + logical.count("ResolvedHint") == 1
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the 1-row n_docs cross join is a hint-broadcast BNLJ (fine); an
    # unbroadcast CartesianProduct anywhere would be the scale bug
    assert "CartesianProduct" not in plan
    # and AQE still executes it correctly end-to-end
    assert df.count() > 0


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Hive-style partitioned parquet: a filter on the partition column must
    prune at planning time (PartitionFilters), reading only matching
    directories — the layout that makes 100 TB scans selective."""
    from pyspark.sql import functions as F

    from restaurant_etl_spark.sources.tables import load_table

    out = str(tmp_path / "events_by_type")
    load_table(spark, sf_dir, "events").write.partitionBy("event_type").mode(
        "overwrite"
    ).parquet(out)

    df = spark.read.parquet(out).filter(F.col("event_type") == "purchase")
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan_line = next(l for l in plan.split("\n") if "FileScan parquet" in l)
    assert "PartitionFilters: [" in scan_line
    assert "event_type" in scan_line.split("PartitionFilters:")[1].split("]")[0]
    # and the counts stay right
    expected = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).count()
    assert df.count() == expected


def test_stream_static_enrich_broadcasts_dimension(spark, sf_dir):
    """The enrichment dimension must broadcast: the (unbounded) stream side
    never shuffles, which is what makes the pattern deployable on a real
    stream."""
    plan = _plan(spark, sf_dir, "stream_static_enrich_batch")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_interval_join_is_hash_join_on_user(spark, sf_dir):
    """The stream-stream interval join must hash-partition on user_id with
    the time bound as a residual predicate — never a nested-loop/cartesian
    fallback."""
    plan = _plan(spark, sf_dir, "stream_stream_interval_join_batch")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_embedding_normalize_is_pure_map(spark, sf_dir):
    """L2 normalization is a narrow projection: any Exchange here would be
    a 100 TB shuffle for a per-row computation."""
    plan = _plan(spark, sf_dir, "embedding_l2_normalize")
    assert "Exchange" not in plan


def test_dataset_split_is_pure_map(spark, sf_dir):
    """Train/val/test assignment is one scan + projection — no shuffle, no
    aggregation."""
    plan = _plan(spark, sf_dir, "split_train_val_test")
    assert "Exchange" not in plan


def test_embedding_keep_has_no_all_pairs_join(spark, sf_dir):
    """dedup_embedding_keep is the bucketed production path: candidates come
    from an equi-join on (band_idx, band) and the keep-list from a key join
    on vec_id — an all-pairs (cartesian / nested-loop) stage would mean the
    LSH bucketing silently degenerated (VERDICT r3 #4 'done' criterion)."""
    plan = _plan(spark, sf_dir, "dedup_embedding_keep")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # q21 single-aggregation rewrite: no Expand (no multi-countDistinct blowup)
    plan21 = _plan(spark, sf_dir, "q21_waiting_suppliers")
    assert "Expand" not in plan21


def test_shingle_arrays_keeps_heavy_map_off_scan_stage(spark, sf_dir):
    """The short-doc gate on shingle_arrays must push down as the cheap
    token-count predicate, NEVER as a predicate over the derived shingle
    array: the array form gets inlined into the single-task scan stage
    DataFilters with four tokenizer references, serializing the dedup
    family's dominant map onto one core (caught as a 15x regression at
    sf0.1)."""
    from restaurant_etl_spark.operators.dedup import _docs, shingle_arrays

    plan = (
        shingle_arrays(_docs(spark, sf_dir))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    scan = next(l for l in plan.split("\n") if "FileScan parquet" in l)
    assert "concat_ws" not in scan, "shingle derivation leaked into the scan stage"
    # the shingle transform must appear exactly once in the whole plan
    # (post-exchange projection), not re-derived per consumer reference
    assert plan.count("concat_ws") == 1


def test_pagerank_materializes_loop_invariant_once(spark, sf_dir):
    """The PageRank loop invariant (the sz>=2 items table in the r9
    order-incidence formulation) must be scanned from the localCheckpoint,
    not re-derived per iteration: no parquet scan may appear inside the
    executed iteration plan."""
    from restaurant_etl_spark.operators.graph import graph_pagerank_parts

    plan = (
        graph_pagerank_parts(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan ExistingRDD") >= 1 or "LocalTableScan" in plan
    # the lineitem self-join inputs would show as repeated parquet scans
    assert plan.count("FileScan parquet") == 0


def test_merge_upsert_single_join_on_merge_key(spark, sf_dir):
    """MERGE compiles to ONE join of base vs change-set (full outer on the
    merge key) — not one join per change type."""
    from restaurant_etl_spark.operators.warehouse import merge_upsert_orders

    plan = (
        merge_upsert_orders(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") + plan.count(
        "BroadcastHashJoin"
    ) == 1
    assert "FullOuter" in plan


def test_scd2_windows_share_one_sort(spark, sf_dir):
    """The lag/running-sum windows and the island aggregation all key on
    user_id: the plan must shuffle the events table exactly once."""
    from restaurant_etl_spark.operators.warehouse import scd2_event_type_history

    plan = (
        scd2_event_type_history(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re as _re

    shuffles = _re.findall(r"Exchange hashpartitioning\(([^,]+)", plan)
    assert all(s.startswith("user_id") for s in shuffles), shuffles
    assert len(shuffles) == 1, plan


def test_aqe_skew_join_split_fires(spark):
    """AQE's OptimizeSkewedJoin must actually ENGAGE on a hot join key
    (VERDICT r6 #3): one key owning most of the fact side makes one
    shuffle partition several times the median; with the skew thresholds
    scaled to sandbox data volume (production keeps the 256 MB default),
    the finalized adaptive plan must mark the sort-merge join
    isSkewJoin=true — proof the config in session.py is live, not
    decorative. The skewed-corpus scale points (make_sfN.py --skew) put
    the same hot-key shape through the full query suite."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16384",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16384",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        # fact: 200k rows, 60% on ONE key; dim: every key once
        fact = spark.range(200_000).select(
            F.when(F.col("id") % 5 < 3, F.lit(7)).otherwise(F.col("id") % 1000).alias("k"),
            (F.col("id") * 2).alias("payload"),
        )
        dim = spark.range(1000).select(F.col("id").alias("k"), F.lit("x").alias("tag"))
        joined = fact.join(dim, "k").groupBy("tag").count()
        joined.collect()  # AQE finalizes at runtime
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # Spark 4 prints "SortMergeJoin(skew=true)"; older versions
        # "isSkewJoin=true" — accept either marker
        assert "skew=true" in plan or "isSkewJoin=true" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_ivf_assignment_pass_partial_aggregates_before_exchange(spark, sf_dir):
    """VERDICT r10 #5: pin the IVF build's argmax shape. The pre-r10
    row_number() window forced the FULL n×√n assignment product through
    an Exchange (hashpartitioning on vec_id of 89.4M rows at sf10, most
    of the 260 s one-time build) before any reduction. The r10 rewrite
    aggregates max(struct(cos, -cell, payload)) — Spark plans it as a
    partial SORTAggregate (struct-typed buffers are not hash-mutable, so
    HashAggregateExec refuses; the sort is per-partition, pre-shuffle),
    and the structural property that matters is that the PARTIAL
    aggregate collapses each map partition to ≤n rows BEFORE the
    exchange. A regression back to the window form would show up as a
    Window node and an exchange with no partial agg beneath it."""
    from pyspark.sql import functions as F

    from restaurant_etl_spark.operators import similarity as sim

    e = sim._emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").alias("v")
    )
    ev = e.select("vec_id", "v", sim._norm(sim._dvec("v")).alias("nv"))
    cent = (
        e.limit(5)
        .select(F.col("vec_id").alias("c_cell"), sim._dvec("v").alias("cv"))
        .localCheckpoint()
        .select("c_cell", "cv", sim._norm("cv").alias("ncv"))
    )
    a_r = ev.crossJoin(F.broadcast(cent)).select(
        "vec_id", "v", "c_cell",
        F.round(
            sim._dot(sim._dvec("v"), F.col("cv"))
            / (F.col("nv") * F.col("ncv")), 4
        ).alias("cos"),
    )
    plan = (
        sim._argmax_cell(a_r)._jdf.queryExecution().executedPlan().toString()
    )
    # no window; a partial aggregate exists and sits BELOW (deeper than,
    # printed after) the vec_id exchange, so only <=n pre-aggregated rows
    # cross the shuffle — never the n×√n product
    assert "Window" not in plan, plan
    assert "partial_max(struct(cos" in plan, plan
    assert "Exchange hashpartitioning(vec_id" in plan, plan
    assert plan.index("partial_max") > plan.index(
        "Exchange hashpartitioning(vec_id"
    ), plan
    # and the product never range-shuffles (no global sort)
    assert "rangepartitioning" not in plan, plan
