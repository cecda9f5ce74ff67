"""Semantic bounds for the two rows-only sketch queries (VERDICT r5 #4).

The driver's oracle gate can only count rows for engine-specific
sketches, so these tests pin what the sketches actually PROMISE:

  * HyperLogLog++ (``approx_count_distinct`` at rsd=0.02): the estimate
    is within a small relative error of the exact count. We assert
    |approx - exact| / exact <= 0.06 (3x the configured rsd — standard
    3-sigma slack; HLL++ error is approximately Gaussian in rsd).
  * ``freqItems`` at support=0.1: the classic one-pass heavy-hitters
    guarantee is a SUPERSET — every value whose true frequency exceeds
    the support threshold must appear in the sketch output (false
    positives allowed, false negatives not).

Failing either bound fails pytest; QUERIES.md footnotes both bounds.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from restaurant_etl_spark.operators.tpch_more import agg_freq_items_sketch
from restaurant_etl_spark.operators.windows_aggs import agg_approx_distinct
from restaurant_etl_spark.sources.tables import load_table

HLL_RSD = 0.02
HLL_BOUND = 3 * HLL_RSD  # 3-sigma
FREQ_SUPPORT = 0.1


def test_approx_distinct_within_relative_error(spark, sf_dir):
    rows = agg_approx_distinct(spark, sf_dir).collect()
    assert rows, "query returned no groups"
    for r in rows:
        assert r.exact_parts > 0
        rel_err = abs(r.approx_parts - r.exact_parts) / r.exact_parts
        assert rel_err <= HLL_BOUND, (
            f"group {r.l_returnflag}: approx={r.approx_parts} "
            f"exact={r.exact_parts} rel_err={rel_err:.4f} > {HLL_BOUND}"
        )


def test_freq_items_superset_of_true_heavy_hitters(spark, sf_dir):
    out = agg_freq_items_sketch(spark, sf_dir).collect()[0]
    sketched = {
        "o_orderpriority": set(out.priority_freq_csv.split(",")),
        "o_orderstatus": set(out.status_freq_csv.split(",")),
    }
    o = load_table(spark, sf_dir, "orders")
    n = o.count()
    for col, got in sketched.items():
        heavy = {
            r[col]
            for r in o.groupBy(col).agg(F.count("*").alias("c")).collect()
            if r.c / n > FREQ_SUPPORT
        }
        assert heavy, f"{col}: fixture has no heavy hitters at support={FREQ_SUPPORT}"
        missing = heavy - got
        assert not missing, (
            f"{col}: true heavy hitters {missing} absent from sketch output {got}"
        )
