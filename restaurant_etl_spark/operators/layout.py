"""Storage-layout and runtime-pruning operators: bloom-filter semi-join
pruning and Z-order (Morton curve) clustering keys — the two techniques a
100 TB deployment leans on to make scans cheap BEFORE any join runs.

Both produce exactly the answer a plain plan produces (the bloom filter
only ever over-approximates its build side; z-values are a deterministic
bijection), so the DuckDB oracles state the un-pruned/plain result and
the engine must match it bit for bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from restaurant_etl_spark.functions.money import sum_money_grid
from restaurant_etl_spark.operators.registry import register
from restaurant_etl_spark.sources.tables import load_table

#: bloom sizing for the pruning filter: with 2^17 bits and 2 hash
#: functions, FPP = (1 - e^(-2n/m))² ≈ 2% at n = 10k build keys and < 1%
#: below n ≈ 6k (the filtered order set at sf0.1 is well inside that); at
#: larger scale the constants grow with the build side, the plan shape
#: does not
BLOOM_BITS = 1 << 17
BLOOM_HASHES = 2

#: bits interleaved per dimension in the Morton key (TPC-H part/supp keys
#: fit in 16 bits up to sf ≈ 30; production uses 32/dim)
Z_BITS = 16
#: Morton-range bucket width: keys are grouped into 2^12-wide ranges
Z_BUCKET_SHIFT = 12


@register(
    "bloom_prune_semi_join",
    oracle="""
    SELECT c.c_mktsegment,
           count(*) AS n_customers,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderpriority = '1-URGENT' AND o.o_totalprice > 150000
    )
    GROUP BY c.c_mktsegment
    """,
    category="layout",
)
def bloom_prune_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter pruning ahead of an exact semi join — the
    mechanism behind row-level runtime filtering at 100 TB: build a bloom
    filter over the small filtered build side (urgent high-value orders'
    custkeys), broadcast it, and drop probe rows whose key cannot match
    BEFORE the shuffle; the surviving superset (bloom FPP admits false
    positives, never false negatives) then goes through the exact semi
    join, so the final answer is bit-identical to the plain plan — which
    is exactly what the oracle states.

    The filter itself is built with pure DataFrame ops (the SQL-level
    ``bloom_filter_agg`` expression is internal to Spark's own
    InjectRuntimeFilter rule and not on the function search path):

      * per build key, BLOOM_HASHES bit positions via seeded xxhash64;
      * positions → (word index, one-hot mask) and a ``bit_or`` hash
        aggregation into ≤ BLOOM_BITS/64 bitmap words — partial+final,
        the same two-phase shape as any sum;
      * the word table collapses to ONE map<word,bits> row, broadcast;
      * probes test their BLOOM_HASHES positions with O(1) map lookups
        and bitwise AND — all codegen'd, no Python, no driver collect."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    build = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 150000)
    ).select("o_custkey")

    def pos_sql(key: str, j: int) -> str:
        # the seed literal is part of the hashed tuple: identical SQL text
        # on build and probe guarantees identical positions. The key is
        # CAST to BIGINT because xxhash64 hashes int32 and int64 to
        # DIFFERENT values — without the cast, a parquet schema drift
        # between the two tables (one int, one bigint) would silently
        # desynchronize build/probe bit positions and drop true matches.
        return f"pmod(xxhash64({j}, CAST({key} AS BIGINT)), {BLOOM_BITS})"

    pos = build.select(
        F.explode(
            F.array(*[F.expr(pos_sql("o_custkey", j)) for j in range(BLOOM_HASHES)])
        ).alias("pos")
    )
    words = (
        pos.select(
            F.expr("CAST(pos DIV 64 AS LONG) AS word"),
            F.expr("shiftleft(CAST(1 AS LONG), CAST(pos % 64 AS INT)) AS mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    bf = words.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("bf")
    )

    probe = cust.join(F.broadcast(bf))
    hit_terms = []
    for j in range(BLOOM_HASHES):
        p = pos_sql("c_custkey", j)
        w = f"element_at(bf, CAST(({p}) DIV 64 AS LONG))"
        hit_terms.append(
            f"({w} IS NOT NULL AND ({w} & shiftleft(CAST(1 AS LONG), "
            f"CAST(({p}) % 64 AS INT))) <> 0)"
        )
    pruned = probe.filter(F.expr(" AND ".join(hit_terms))).drop("bf")

    # exact semi join on the pruned (≈true-match-sized) probe side
    hits = pruned.join(build, pruned.c_custkey == build.o_custkey, "left_semi")
    return hits.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        sum_money_grid("c_acctbal", "sum_acctbal"),
    )


def _interleave_sql(a: str, b: str, bits: int = Z_BITS) -> str:
    """SQL expression interleaving the low ``bits`` bits of a (even
    positions) and b (odd positions) into a Morton key — the same text is
    valid Spark SQL and DuckDB SQL, so both engines evaluate the identical
    arithmetic."""
    terms = []
    for i in range(bits):
        terms.append(f"(((({a}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({b}) >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@register(
    "layout_zorder_buckets",
    oracle=f"""
    WITH z AS (
        SELECT l_orderkey, l_linenumber,
               {_interleave_sql('l_partkey % 65536', 'l_suppkey % 65536')} AS zval
        FROM lineitem
    )
    SELECT CAST(zval >> {Z_BUCKET_SHIFT} AS BIGINT) AS z_bucket,
           count(*) AS n_rows,
           min(zval) AS z_min,
           max(zval) AS z_max
    FROM z GROUP BY z_bucket
    ORDER BY n_rows DESC, z_bucket
    LIMIT 50
    """,
    category="layout",
)
def layout_zorder_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton curve) clustering keys over (part, supplier) — the
    data-layout technique that makes BOTH ``WHERE l_partkey BETWEEN …``
    and ``WHERE l_suppkey BETWEEN …`` prune well after a rewrite by
    z-range: interleave the two keys' bits so nearby (part, supp) pairs
    land in nearby file ranges, then report the occupancy of each
    2^{Z_BUCKET_SHIFT}-wide z-range (what a table-maintenance job uses to
    size clustered output files). The z-value is 32 narrow bit ops per
    row — pure codegen'd arithmetic, identical text in both engines; the
    only shuffle is the bounded-cardinality bucket aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    z = li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            _interleave_sql("l_partkey % 65536", "l_suppkey % 65536")
        ).alias("zval"),
    )
    return (
        z.groupBy(F.shiftright("zval", Z_BUCKET_SHIFT).cast("bigint").alias("z_bucket"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min("zval").alias("z_min"),
            F.max("zval").alias("z_max"),
        )
        .orderBy(F.desc("n_rows"), "z_bucket")
        .limit(50)
    )


#: synthetic file size for the zone-map simulation: rows land in "files"
#: of 4096 consecutive order keys (matching how an ingest job writes
#: roughly time-ordered row groups)
ZONEMAP_FILE_KEYS = 4096

#: the probe predicate whose skipping effectiveness the report measures
ZONEMAP_LO = "1997-01-01"
ZONEMAP_HI = "1997-03-31"


@register(
    "layout_zonemap_report",
    oracle=f"""
    WITH f AS (
        SELECT l_orderkey // {ZONEMAP_FILE_KEYS} AS file_id,
               count(*) AS n_rows,
               min(l_shipdate) AS min_ship,
               max(l_shipdate) AS max_ship
        FROM lineitem GROUP BY file_id
    ),
    m AS (
        SELECT file_id, n_rows,
               (max_ship < TIMESTAMP '{ZONEMAP_LO} 00:00:00'
                OR min_ship > TIMESTAMP '{ZONEMAP_HI} 23:59:59') AS prunable
        FROM f
    )
    SELECT count(*) AS n_files,
           CAST(sum(CASE WHEN prunable THEN 1 ELSE 0 END) AS BIGINT)
               AS n_files_pruned,
           CAST(sum(n_rows) AS BIGINT) AS total_rows,
           CAST(sum(CASE WHEN prunable THEN n_rows ELSE 0 END) AS BIGINT)
               AS rows_skipped,
           round(sum(CASE WHEN prunable THEN n_rows ELSE 0 END)
                 * 1.0 / sum(n_rows), 4) AS skip_fraction
    FROM m
    """,
    category="layout",
)
def layout_zonemap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (file min/max statistics) skipping-effectiveness report:
    rows are binned into synthetic ingest files (4096 consecutive order
    keys ≈ one row group), each file's [min, max] l_shipdate zone is
    computed, and the report states how many files — and what fraction of
    rows — a Q1-'97 date predicate could skip WITHOUT reading them. This
    is the artifact a table-maintenance job emits to decide whether data
    needs re-clustering (compare: after a z-order/sort rewrite the skip
    fraction approaches 1 - selectivity). One aggregation to build the
    zone map (bounded by file count, not row count) + one tiny rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    f = li.groupBy(
        F.expr(f"l_orderkey DIV {ZONEMAP_FILE_KEYS}").alias("file_id")
    ).agg(
        F.count("*").alias("n_rows"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )
    m = f.select(
        "n_rows",
        (
            (F.col("max_ship") < F.lit(f"{ZONEMAP_LO} 00:00:00").cast("timestamp"))
            | (F.col("min_ship") > F.lit(f"{ZONEMAP_HI} 23:59:59").cast("timestamp"))
        ).alias("prunable"),
    )
    pruned_rows = F.sum(F.when(F.col("prunable"), F.col("n_rows")).otherwise(0))
    return m.agg(
        F.count("*").alias("n_files"),
        F.sum(F.when(F.col("prunable"), 1).otherwise(0)).alias("n_files_pruned"),
        F.sum("n_rows").alias("total_rows"),
        pruned_rows.alias("rows_skipped"),
        F.round(pruned_rows / F.sum("n_rows"), 4).alias("skip_fraction"),
    )


#: layout_zorder_skipping file-granularity constants: natural ingest files
#: hold 512 consecutive order keys; linear-clustered files hold 64
#: consecutive part keys; z-clustered files are 2^Z_BUCKET_SHIFT-wide
#: Morton ranges. Sized so every scale factor (sf0.001 up) produces a
#: multi-file zone map in all three layouts.
ZSKIP_NATURAL_KEYS = 512
ZSKIP_LINEAR_KEYS = 64

_ZSKIP_Z_SQL = _interleave_sql("l_partkey % 65536", "l_suppkey % 65536")


def _zskip_oracle() -> str:
    layouts = (
        ("natural", f"l_orderkey // {ZSKIP_NATURAL_KEYS}"),
        ("linear_part", f"l_partkey // {ZSKIP_LINEAR_KEYS}"),
        ("zorder", f"({_ZSKIP_Z_SQL}) // {1 << Z_BUCKET_SHIFT}"),
    )
    ctes = ",\n    ".join(
        f"""zm_{name} AS (
        SELECT CAST(({fe}) AS BIGINT) AS file_id, count(*) AS n_rows,
               min(l_partkey) AS min_pk, min(l_suppkey) AS min_sk
        FROM lineitem GROUP BY 1
    )"""
        for name, fe in layouts
    )
    selects = []
    for name, _ in layouts:
        for pred, mincol, hicol in (
            ("partkey_low8", "min_pk", "pk_hi"),
            ("suppkey_low8", "min_sk", "sk_hi"),
        ):
            selects.append(
                f"""SELECT '{name}' AS layout, '{pred}' AS predicate,
               count(*) AS n_files,
               CAST(sum(CASE WHEN {mincol} > b.{hicol} THEN 1 ELSE 0 END) AS BIGINT) AS n_files_pruned,
               CAST(sum(n_rows) AS BIGINT) AS total_rows,
               CAST(sum(CASE WHEN {mincol} > b.{hicol} THEN n_rows ELSE 0 END) AS BIGINT) AS rows_skipped,
               round(sum(CASE WHEN {mincol} > b.{hicol} THEN n_rows ELSE 0 END) * 1.0 / sum(n_rows), 4) AS skip_fraction
        FROM zm_{name}, bounds b"""
            )
    union = "\n        UNION ALL\n        ".join(selects)
    return f"""
    WITH bounds AS (
        SELECT CAST(max(l_partkey) // 8 AS BIGINT) AS pk_hi,
               CAST(max(l_suppkey) // 8 AS BIGINT) AS sk_hi
        FROM lineitem
    ),
    {ctes}
    {union}
    """


@register("layout_zorder_skipping", oracle=_zskip_oracle(), category="layout")
def layout_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Before/after zone-map skipping report for three physical layouts of
    the SAME lineitem rows (VERDICT r5 #5 — closes the z-order loop):

      * ``natural``     — ingest order, files of ZSKIP_NATURAL_KEYS
        consecutive order keys (what a streaming writer produces);
      * ``linear_part`` — clustered linearly by part key (single-column
        sort rewrite);
      * ``zorder``      — clustered by the Morton key of
        (part, supplier), files = 2^Z_BUCKET_SHIFT-wide z-ranges.

    Each layout's per-file zone map (min part key, min supplier key) is
    probed with two range predicates — the lowest eighth of the part-key
    domain and of the supplier-key domain (domain-relative via a scalar
    subquery, so the report is meaningful at every scale factor) — and
    the report states files pruned + fraction of rows skipped per
    (layout, predicate). The expected shape IS the z-order sales pitch:
    natural skips ~nothing on either dim, linear skips ~7/8 on part key
    but ~nothing on supplier key, z-order skips a large fraction on BOTH.
    The physical-write twin of this simulation (parquet row-group
    statistics of actually-rewritten files) is tests/test_layout.py.

    Scale shape: three lineitem scans (one per layout), each a bounded
    zone-map aggregation (state = file count, not row count), a broadcast
    1-row bounds join, and 6 one-row rollups — no shuffle carries rows."""
    li = load_table(spark, sf_dir, "lineitem")
    bounds = li.agg(
        F.expr("CAST(max(l_partkey) DIV 8 AS BIGINT)").alias("pk_hi"),
        F.expr("CAST(max(l_suppkey) DIV 8 AS BIGINT)").alias("sk_hi"),
    )
    layouts = (
        ("natural", f"l_orderkey DIV {ZSKIP_NATURAL_KEYS}"),
        ("linear_part", f"l_partkey DIV {ZSKIP_LINEAR_KEYS}"),
        ("zorder", f"({_ZSKIP_Z_SQL}) DIV {1 << Z_BUCKET_SHIFT}"),
    )
    reports = []
    for name, fe in layouts:
        zm = (
            li.groupBy(F.expr(fe).cast("bigint").alias("file_id"))
            .agg(
                F.count("*").alias("n_rows"),
                F.min("l_partkey").alias("min_pk"),
                F.min("l_suppkey").alias("min_sk"),
            )
            .crossJoin(F.broadcast(bounds))
        )
        agg = zm.agg(
            F.count("*").alias("n_files"),
            F.sum("n_rows").alias("total_rows"),
            F.sum(F.when(F.col("min_pk") > F.col("pk_hi"), 1).otherwise(0)).alias("pk_fp"),
            F.sum(F.when(F.col("min_pk") > F.col("pk_hi"), F.col("n_rows")).otherwise(0)).alias("pk_rs"),
            F.sum(F.when(F.col("min_sk") > F.col("sk_hi"), 1).otherwise(0)).alias("sk_fp"),
            F.sum(F.when(F.col("min_sk") > F.col("sk_hi"), F.col("n_rows")).otherwise(0)).alias("sk_rs"),
        )
        reports.append(
            agg.select(
                F.lit(name).alias("layout"),
                "n_files",
                "total_rows",
                F.expr(
                    "stack(2, 'partkey_low8', pk_fp, pk_rs, "
                    "'suppkey_low8', sk_fp, sk_rs) AS (predicate, n_files_pruned, rows_skipped)"
                ),
            ).select(
                "layout",
                "predicate",
                "n_files",
                "n_files_pruned",
                "total_rows",
                "rows_skipped",
                F.round(F.col("rows_skipped") / F.col("total_rows"), 4).alias("skip_fraction"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionAll(r)
    return out.orderBy("layout", "predicate")
