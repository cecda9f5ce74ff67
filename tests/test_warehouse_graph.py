"""Invariant tests for the warehouse (MERGE / SCD2) and graph (PageRank)
operators — semantic properties the oracle hash-match can't express
(conservation laws, interval partitioning, probability mass)."""

from __future__ import annotations

from pyspark.sql import functions as F

from restaurant_etl_spark.operators.corpus_prep import (
    bpe_pair_counts,
    corpus_length_histogram,
)
from restaurant_etl_spark.operators.graph import (
    TOP_K,
    graph_pagerank_parts,
)
from restaurant_etl_spark.operators.warehouse import (
    DELETE_MOD,
    INSERT_MOD,
    UPDATE_MOD,
    merge_upsert_orders,
    scd2_event_type_history,
)
from restaurant_etl_spark.sources.tables import load_table


def test_merge_conserves_row_count(spark, sf_dir):
    """rows(merged) = rows(base) - deletes + inserts, computed
    independently from the base table."""
    base = load_table(spark, sf_dir, "orders")
    n_base = base.count()
    k = F.col("o_orderkey")
    n_del = base.filter((k % DELETE_MOD == 0) & (k % UPDATE_MOD != 0)).count()
    n_ins = base.filter(k % INSERT_MOD == 0).count()
    out = merge_upsert_orders(spark, sf_dir)
    total = out.agg(F.sum("n_orders")).collect()[0][0]
    assert total == n_base - n_del + n_ins


def test_merge_insert_status_present(spark, sf_dir):
    rows = {r["o_orderstatus"]: r for r in merge_upsert_orders(spark, sf_dir).collect()}
    base = load_table(spark, sf_dir, "orders")
    n_ins = base.filter(F.col("o_orderkey") % INSERT_MOD == 0).count()
    assert rows["N"]["n_orders"] == n_ins
    n_upd = base.filter(F.col("o_orderkey") % UPDATE_MOD == 0).count()
    assert rows["U"]["n_orders"] == n_upd


def test_scd2_intervals_partition_the_stream(spark, sf_dir):
    """Every event lands in exactly one interval; each user has exactly
    one open (valid_to IS NULL) row; closed intervals are well-ordered."""
    hist = scd2_event_type_history(spark, sf_dir)
    events = load_table(spark, sf_dir, "events")
    assert (
        hist.agg(F.sum("n_events")).collect()[0][0] == events.count()
    )
    open_per_user = (
        hist.filter(F.col("valid_to").isNull()).groupBy("user_id").count()
    )
    assert open_per_user.filter(F.col("count") != 1).count() == 0
    assert (
        hist.filter(
            F.col("valid_to").isNotNull()
            & (F.col("valid_to") <= F.col("valid_from"))
        ).count()
        == 0
    )


def test_scd2_no_adjacent_same_type(spark, sf_dir):
    """Islands are maximal: consecutive intervals of a user never carry
    the same event_type."""
    from pyspark.sql.window import Window

    hist = scd2_event_type_history(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("valid_from")
    adj = hist.withColumn("prev_type", F.lag("event_type").over(w)).filter(
        F.col("prev_type") == F.col("event_type")
    )
    assert adj.count() == 0


def test_pagerank_topk_shape_and_positivity(spark, sf_dir):
    rows = graph_pagerank_parts(spark, sf_dir).collect()
    assert len(rows) == TOP_K
    scores = [r["rank_scaled"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    # top-k of a centrality measure must beat the global average (=1.0)
    assert scores[0] >= 1.0


def test_pagerank_margins_clear_fp_slack(spark, sf_dir):
    """The rank-20/21 cutoff gap and every top rank's distance from the
    nearest 4-dp rounding half-boundary must clear MARGIN_SLACK_GRID
    (VERDICT r6 #5): if either margin ever collapses at some scale
    factor, the oracle hash-match would be at the mercy of the engines'
    FP summation order — this test fails FIRST, naming the cliff. The
    scale-sweep replica runs the same guard at sf0.01/sf0.1/sf1
    (scripts/check_oracle.py --pagerank-margins)."""
    from restaurant_etl_spark.operators.graph import pagerank_rank_margins

    m = pagerank_rank_margins(spark, sf_dir)
    assert m["cutoff_gap_grid"] > m["slack_grid"], m
    assert m["min_half_dist_grid"] > m["slack_grid"], m


def test_pagerank_mass_conserved(spark, sf_dir):
    """Total rank mass is conserved by the power iteration: with a
    symmetric graph (no dangling nodes) the ranks sum to 1, so scaled
    ranks average 1.0 over the node set."""
    import restaurant_etl_spark.operators.graph as G

    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    a, b = items.alias("a"), items.alias("b")
    e = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") != F.col("b.pk")))
        .groupBy(F.col("a.pk").alias("src"), F.col("b.pk").alias("dst"))
        .agg(F.count("*").cast("double").alias("w"))
    )
    deg = e.groupBy("src").agg(F.sum("w").alias("outw"))
    en = e.join(deg, "src").select(
        "src", "dst", (F.col("w") / F.col("outw")).alias("p")
    )
    n = deg.count()
    ranks = deg.select(F.col("src").alias("pk")).withColumn("r", F.lit(1.0 / n))
    for _ in range(G.N_ITER):
        contribs = (
            en.join(ranks, en.src == ranks.pk)
            .groupBy("dst")
            .agg(F.sum(F.col("r") * F.col("p")).alias("contrib"))
        )
        ranks = contribs.select(
            F.col("dst").alias("pk"),
            (F.lit(G.TELEPORT / n) + F.lit(G.DAMPING) * F.col("contrib")).alias("r"),
        )
    total = ranks.agg(F.sum("r")).collect()[0][0]
    assert abs(total - 1.0) < 1e-9


def test_bpe_pairs_are_letter_bigrams(spark, sf_dir):
    rows = bpe_pair_counts(spark, sf_dir).collect()
    assert 0 < len(rows) <= 30
    for r in rows:
        assert len(r["pair"]) == 2 and r["pair"].isalpha() and r["pair"].islower()
    counts = [r["n"] for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_length_histogram_accounts_for_every_doc(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    hist = corpus_length_histogram(spark, sf_dir)
    assert hist.agg(F.sum("n_docs")).collect()[0][0] == docs.count()
    bad = hist.filter(
        (F.col("min_tokens") > F.col("max_tokens"))
        | (F.col("len_bucket") < 0)
    )
    assert bad.count() == 0


def test_cdc_extract_apply_roundtrip(spark, sf_dir):
    """extract_changes is the exact inverse of _relational_merge:
    applying the extracted change stream to v1 reproduces v2 row-for-row
    (the property that makes snapshot-diff CDC sound)."""
    from pyspark.sql import functions as F

    from restaurant_etl_spark.operators.warehouse import (
        DELETE_MOD,
        INSERT_MOD,
        UPDATE_MOD,
        _relational_merge,
        extract_changes,
    )

    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    k = F.col("o_orderkey")
    v2 = (
        base.filter((k % DELETE_MOD != 0) | (k % UPDATE_MOD == 0))
        .select(
            "o_orderkey",
            F.when(k % UPDATE_MOD == 0, F.lit("U")).otherwise(F.col("o_orderstatus")).alias("o_orderstatus"),
            F.when(k % UPDATE_MOD == 0, F.round(F.col("o_totalprice") + 10.0, 2))
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
        )
        .unionByName(
            base.filter(k % INSERT_MOD == 0).select(
                (-k).alias("o_orderkey"), F.lit("N").alias("o_orderstatus"), F.col("o_totalprice")
            )
        )
    )
    changes = extract_changes(base, v2).withColumnRenamed("o_orderkey", "m_key")
    rebuilt = _relational_merge(base, changes)
    diff = rebuilt.exceptAll(v2).unionAll(v2.exceptAll(rebuilt))
    assert diff.count() == 0
