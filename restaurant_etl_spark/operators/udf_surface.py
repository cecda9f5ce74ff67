"""UDF / UDAF surface (SURVEY.md §2B): every Python-extension mechanism the
engine supports, each demonstrated on real tables and oracle-checked —
the UDF computes something SQL-expressible so DuckDB can state the answer.

Performance doctrine (SURVEY §4): UDFs are the slow path. Everything that
CAN be a native Column expression elsewhere in this repo IS one; this
module exists to prove the extension mechanisms work and to measure their
Arrow-batched shape:

  * scalar ``pandas_udf``      — vectorized, Arrow in/out;
  * grouped-agg ``pandas_udf`` — per-group pandas Series → scalar;
  * ``applyInPandas``          — whole-group pandas DataFrame transform;
  * ``mapInPandas``            — partition-stream pandas transform;
  * row-at-a-time ``udf``      — the anti-pattern, kept for parity on a
    bounded table only (25 nations).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, StringType

from restaurant_etl_spark.functions.money import sum_money_grid
from restaurant_etl_spark.operators.registry import register
from restaurant_etl_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# scalar pandas UDF (vectorized)
# --------------------------------------------------------------------------

@pandas_udf(StringType())
def _price_tier(total: pd.Series) -> pd.Series:
    tier = pd.Series("jumbo", index=total.index)
    tier[total < 300000] = "large"
    tier[total < 150000] = "medium"
    tier[total < 50000] = "small"
    return tier


@register(
    "udf_pandas_scalar_tier",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000  THEN 'small'
                WHEN o_totalprice < 150000 THEN 'medium'
                WHEN o_totalprice < 300000 THEN 'large'
                ELSE 'jumbo' END AS tier,
           count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY 1
    """,
    category="udf",
)
def udf_pandas_scalar_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar pandas UDF bucketing order totals, checked
    against the equivalent CASE expression. (In production this exact logic
    would BE the CASE expression — see case_when_bands.)"""
    o = _t(spark, sf_dir, "orders")
    return (
        o.withColumn("tier", _price_tier("o_totalprice"))
        .groupBy("tier")
        .agg(F.count("*").alias("n"), sum_money_grid("o_totalprice", "total"))
    )


# --------------------------------------------------------------------------
# grouped-aggregate pandas UDF
# --------------------------------------------------------------------------

@pandas_udf(DoubleType())
def _weighted_avg_price(price: pd.Series, qty: pd.Series) -> float:
    return float((price * qty).sum() / qty.sum())


@register(
    "udf_grouped_agg_weighted_avg",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 2) AS w_avg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    category="udf",
)
def udf_grouped_agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF: quantity-weighted mean price per
    return flag (a UDAF), vs the closed-form SQL ratio. Deliberately NOT
    on the DECIMAL grid (r13 sweep): the pandas-side float64 reduction IS
    the surface under test, and the weighted mean self-normalizes
    (sum error / sum qty ≈ 1e-10 at sf100 magnitude, far under the 2-dp
    rounding step)."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(_weighted_avg_price("l_extendedprice", "l_quantity"), 2).alias("w_avg_price")
    )


# --------------------------------------------------------------------------
# applyInPandas (full-group transform)
# --------------------------------------------------------------------------

@register(
    "udf_apply_in_pandas_minmax",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           round((o_totalprice - min(o_totalprice) OVER w)
                 / (max(o_totalprice) OVER w - min(o_totalprice) OVER w), 4) AS scaled
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus)
    """,
    category="udf",
)
def udf_apply_in_pandas_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas: per-status min-max scaling of order totals — a
    whole-group pandas transform (the custom-stateful-operator escape
    hatch), vs the window-function formulation."""

    def scale(pdf: pd.DataFrame) -> pd.DataFrame:
        lo, hi = pdf["o_totalprice"].min(), pdf["o_totalprice"].max()
        return pd.DataFrame(
            {
                "o_orderkey": pdf["o_orderkey"],
                "o_orderstatus": pdf["o_orderstatus"],
                "scaled": ((pdf["o_totalprice"] - lo) / (hi - lo)).round(4),
            }
        )

    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").applyInPandas(
        scale, "o_orderkey bigint, o_orderstatus string, scaled double"
    )


# --------------------------------------------------------------------------
# mapInPandas (partition-stream transform)
# --------------------------------------------------------------------------

@register(
    "udf_map_in_pandas_filter",
    oracle="""
    SELECT event_id, user_id, round(value * 2, 2) AS doubled
    FROM events
    WHERE event_type = 'purchase' AND value > 50
    """,
    category="udf",
)
def udf_map_in_pandas_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas: streaming per-partition pandas filter+project (the
    batched-external-call shape of the LLM parser, U1) vs plain SQL.
    The event_type filter stays a native pushed predicate; only the
    residual runs in Python."""

    def xform(batches):
        for pdf in batches:
            keep = pdf[pdf["value"] > 50]
            yield pd.DataFrame(
                {
                    "event_id": keep["event_id"],
                    "user_id": keep["user_id"],
                    "doubled": (keep["value"] * 2).round(2),
                }
            )

    e = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return e.select("event_id", "user_id", "value").mapInPandas(
        xform, "event_id bigint, user_id bigint, doubled double"
    )


# --------------------------------------------------------------------------
# row-at-a-time UDF (the documented anti-pattern, bounded input only)
# --------------------------------------------------------------------------

@register(
    "udf_row_at_a_time",
    oracle="""
    SELECT n_name, CAST(length(n_name) AS INTEGER) AS name_len,
           CASE WHEN length(n_name) % 2 = 0 THEN 'even' ELSE 'odd' END AS parity
    FROM nation
    """,
    category="udf",
)
def udf_row_at_a_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic row-at-a-time Python UDF — 10-100x slower than pandas UDFs
    (per-row pickling); registered only on the 25-row nation table to
    document the mechanism and its cost profile."""
    parity = F.udf(lambda s: "even" if len(s) % 2 == 0 else "odd", "string")
    n = _t(spark, sf_dir, "nation")
    return n.select("n_name", F.length("n_name").alias("name_len"), parity("n_name").alias("parity"))


@register(
    "udtf_chunk_split",
    oracle="""
    WITH d AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
        FROM documents
    )
    SELECT doc_id,
           CAST(i AS INTEGER) AS chunk_idx,
           array_to_string(toks[i * 50 + 1 : i * 50 + 50], ' ') AS chunk,
           CAST(least(50, len(toks) - i * 50) AS INTEGER) AS n_toks
    FROM d, range(0, 1000) t(i)
    WHERE i * 50 < len(toks)
    """,
    category="udf",
)
def udtf_chunk_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 table function): one input row fans out to N
    output rows — 50-token chunks per document, applied via LATERAL over
    the documents table. Completes the extension surface beyond scalar /
    agg / map / grouped-map UDFs with the table-valued form. Arrow-batched
    like every Python boundary; the chunking itself mirrors the reference's
    2000-char splitter (restaurant_etl/utils/chunking concept) in
    token-window form."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk string, n_toks int")
    class ChunkUdtf:
        def eval(self, text: str):
            toks = [t for t in (text or "").split() if t]
            for i in range(0, len(toks), 50):
                c = toks[i : i + 50]
                yield i // 50, " ".join(c), len(c)

    spark.udtf.register("chunk_udtf", ChunkUdtf)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, f.chunk_idx, f.chunk, f.n_toks
        FROM udtf_docs d, LATERAL chunk_udtf(d.text) f
        """
    )


@register(
    "lateral_topn_per_nation",
    oracle="""
    SELECT n.n_name, c.c_name, round(c.c_acctbal, 2) AS acctbal
    FROM nation n, LATERAL (
        SELECT c_name, c_acctbal FROM customer
        WHERE c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
    """,
    category="relational",
)
def lateral_topn_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery (top-2 customers per nation): Catalyst
    decorrelates this into a join + per-key limit rather than re-executing
    the subquery per outer row — same plan family as the window top-k, but
    exercised through the SQL LATERAL surface both engines share."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("lat_nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("lat_customer")
    return spark.sql(
        """
        SELECT n.n_name, c.c_name, round(c.c_acctbal, 2) AS acctbal
        FROM lat_nation n, LATERAL (
            SELECT c_name, c_acctbal FROM lat_customer
            WHERE c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
        """
    )
