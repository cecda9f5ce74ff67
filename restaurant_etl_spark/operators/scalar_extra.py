"""Remaining scalar / frame coverage (SURVEY.md §2B): array functions,
map/JSON functions over events.props, RANGE window frames, and the second
date-function battery. All native expressions."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from restaurant_etl_spark.operators.registry import register
from restaurant_etl_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "scalar_array_battery",
    oracle="""
    WITH a AS (
        SELECT l_orderkey, list(l_linenumber ORDER BY l_linenumber) AS lines,
               list(DISTINCT l_returnflag) AS flags
        FROM lineitem
        GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           CAST(len(lines) AS INTEGER)              AS n_lines,
           lines[1]                                 AS first_line,
           lines[-1]                                AS last_line,
           list_contains(lines, 3)                  AS has_line3,
           array_to_string(lines, ',')              AS lines_csv,
           CAST(len(list_sort(flags)) AS INTEGER)   AS n_flags,
           array_to_string(list_sort(flags), ',')   AS flags_sorted,
           list_reverse_sort(lines)[1]              AS max_line
    FROM a
    WHERE l_orderkey % 50 = 0
    """,
    category="relational",
)
def scalar_array_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function battery over per-order line collections: size /
    element_at / contains / join / sort / distinct / reverse — the nested
    type surface (reference's only nested type is dietary_tags,
    menu_models.py:58-62, generalized here)."""
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    a = l.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list("l_linenumber")).alias("lines"),
        F.array_distinct(F.collect_list("l_returnflag")).alias("flags"),
    )
    return a.select(
        "l_orderkey",
        F.size("lines").alias("n_lines"),
        F.element_at("lines", 1).alias("first_line"),
        F.element_at("lines", -1).alias("last_line"),
        F.array_contains("lines", 3).alias("has_line3"),
        F.array_join("lines", ",").alias("lines_csv"),
        F.size("flags").alias("n_flags"),
        # Serialized (not array-typed): the external driver's pandas
        # canonicalizer hashes row values and cannot hash Python lists, so
        # every registered query must emit scalar-typed output columns only.
        F.array_join(F.array_sort("flags"), ",").alias("flags_sorted"),
        F.element_at(F.reverse(F.array_sort("lines")), 1).alias("max_line"),
    )


@register(
    "scalar_map_json_battery",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')                      AS k_str,
           CAST(json_extract_string(props, '$.k') AS INTEGER)    AS k_int,
           'k'                                                   AS only_key,
           CAST(json_extract_string(props, '$.k') AS INTEGER) * 2 AS k_doubled,
           CAST(json_extract_string(props, '$.missing') IS NULL AS BOOLEAN) AS missing_is_null
    FROM events
    WHERE event_id % 10 = 0
    """,
    category="relational",
)
def scalar_map_json_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map + JSON functions: parse events.props into map<string,int>
    (from_json — the reference's schema-enforced parse, llm_parser.py:165-166),
    then map_keys / element access / null-safe missing-key semantics."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") % 10 == 0)
    m = e.withColumn("pm", F.from_json("props", "map<string,int>"))
    return m.select(
        "event_id",
        F.element_at("pm", "k").cast("string").alias("k_str"),
        F.element_at("pm", "k").alias("k_int"),
        F.element_at(F.map_keys("pm"), 1).alias("only_key"),
        (F.element_at("pm", "k") * 2).alias("k_doubled"),
        F.element_at("pm", "missing").isNull().alias("missing_is_null"),
    )


@register(
    "window_range_frame_30d",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(count(*) OVER w AS BIGINT)        AS n_orders_30d,
           round(sum(o_totalprice) OVER w, 2)     AS spend_30d
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate) // 1000000
                 RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
    """,
    category="relational",
)
def window_range_frame_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame on event time: per customer, rolling count/sum over the
    trailing 30 days (value-based frame, not row-based). Epoch-seconds
    ordering keys the frame identically in both engines."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_seconds(F.col("o_orderdate").cast("timestamp")))
        .rangeBetween(-2_592_000, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.count("*").over(w).alias("n_orders_30d"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("spend_30d"),
    )


@register(
    "scalar_date_battery2",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE)            AS plus_3m,
           CAST(last_day(o_orderdate) AS DATE)                     AS month_end,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER)             AS dow,
           CAST(weekofyear(o_orderdate) AS INTEGER)                AS iso_week,
           CAST(dayofyear(o_orderdate) AS INTEGER)                 AS doy,
           CAST(o_orderdate + INTERVAL 45 DAY AS DATE)             AS plus_45d,
           CAST(date_trunc('quarter', o_orderdate) AS DATE)        AS quarter_start
    FROM orders
    WHERE o_orderkey % 20 = 0
    """,
    category="relational",
)
def scalar_date_battery2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second date battery: add_months (month-end clamped), last_day,
    day-of-week (normalized: Spark is 1=Sunday, DuckDB 0=Sunday),
    ISO week, day-of-year, date_add, quarter truncation."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 0)
    return o.select(
        "o_orderkey",
        F.add_months("o_orderdate", 3).alias("plus_3m"),
        F.last_day("o_orderdate").alias("month_end"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.weekofyear("o_orderdate").alias("iso_week"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.date_add("o_orderdate", 45).alias("plus_45d"),
        F.date_trunc("quarter", "o_orderdate").cast("date").alias("quarter_start"),
    )


_VARIANT_TMPL = (
    '{"order": {"key": %d, "status": "%s"}, '
    '"amount_cents": %d, "tags": ["pri-%s"]}'
)


@register(
    "variant_json_shred",
    oracle=f"""
    WITH payload AS (
        SELECT printf('{_VARIANT_TMPL}',
                      o_orderkey, o_orderstatus,
                      CAST(round(o_totalprice * 100) AS BIGINT),
                      o_orderpriority) AS js
        FROM orders
    ),
    shredded AS (
        SELECT CAST(json_extract(js, '$.order.key') AS BIGINT) AS okey,
               json_extract_string(js, '$.order.status') AS status,
               CAST(json_extract(js, '$.amount_cents') AS BIGINT) AS cents,
               json_extract_string(js, '$.tags[0]') AS tag
        FROM payload
    )
    SELECT status, tag,
           count(*) AS n_orders,
           CAST(min(okey) AS BIGINT) AS min_key,
           round(sum(cents) / 100.0, 2) AS total
    FROM shredded
    WHERE cents > 1000000
    GROUP BY status, tag
    """,
    category="relational",
)
def variant_json_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured ingestion via Spark 4's VARIANT type — the log-
    shredding pattern a 100 TB pipeline runs on JSON event feeds: raw
    JSON text → ``parse_json`` (binary variant, parsed ONCE) → typed
    ``variant_get`` path extractions (incl. an array index) → predicate
    on an extracted field → aggregate. The JSON payloads are synthesized
    deterministically from orders with printf-style formatting (%d/%s
    only — no float rendering, so both engines build byte-identical
    text); the DuckDB oracle shreds the same payloads with its JSON
    functions, proving the variant path semantics end-to-end.

    Scale shape: pure per-row codegen (parse + typed extract), one
    bounded aggregation; at scale the win over from_json-with-schema is
    that VARIANT defers schema to read time — each consumer extracts
    only its paths, no full-struct materialization."""
    o = load_table(spark, sf_dir, "orders")
    payload = o.select(
        F.format_string(
            _VARIANT_TMPL,
            F.col("o_orderkey"),
            F.col("o_orderstatus"),
            F.round(F.col("o_totalprice") * 100).cast("bigint"),
            F.col("o_orderpriority"),
        ).alias("js")
    )
    v = payload.select(F.parse_json(F.col("js")).alias("v"))
    shredded = v.select(
        F.variant_get(F.col("v"), "$.order.key", "bigint").alias("okey"),
        F.variant_get(F.col("v"), "$.order.status", "string").alias("status"),
        F.variant_get(F.col("v"), "$.amount_cents", "bigint").alias("cents"),
        F.variant_get(F.col("v"), "$.tags[0]", "string").alias("tag"),
    )
    return (
        shredded.filter(F.col("cents") > 1_000_000)
        .groupBy("status", "tag")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("okey").alias("min_key"),
            F.round(F.sum("cents") / 100.0, 2).alias("total"),
        )
    )
