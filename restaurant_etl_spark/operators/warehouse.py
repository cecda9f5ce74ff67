"""Warehouse maintenance operators: MERGE-style CDC apply and SCD Type 2
history building — the mutation layer a lakehouse deployment of this
engine needs around the read-side queries (the reference is read-only;
these are §2B extension surface, like the incremental manifest layer in
operators/incremental.py).

Scale shapes:
  * merge:  ONE full-outer shuffle join on the merge key — the canonical
            CDC-apply plan. At 100 TB both sides are bucketed/partitioned
            on the key so the join is co-located; nothing here collects
            or widens beyond the change-set columns.
  * scd2:   gaps-and-islands over per-key event streams — two window
            passes that SHARE one (user_id, ts) sort/partitioning, then
            one key-partitioned aggregation. No global window anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from restaurant_etl_spark.functions.money import PRICE_DEC, sum_money, sum_money_grid
from restaurant_etl_spark.operators.registry import register
from restaurant_etl_spark.sources.tables import load_table

#: deterministic change-set moduli (disjoint by construction: delete keys
#: exclude update keys; insert keys are the NEGATED source keys — disjoint
#: from the strictly-positive base key space at ANY scale factor, unlike a
#: fixed additive offset which TPC-H orderkeys overtake around sf 170)
UPDATE_MOD = 97
DELETE_MOD = 89
INSERT_MOD = 83


@register(
    "merge_upsert_orders",
    oracle=f"""
    WITH updates AS (
        SELECT o_orderkey, 'U' AS new_status,
               round(o_totalprice + 10.0, 2) AS new_price
        FROM orders WHERE o_orderkey % {UPDATE_MOD} = 0
    ),
    deletes AS (
        SELECT o_orderkey FROM orders
        WHERE o_orderkey % {DELETE_MOD} = 0 AND o_orderkey % {UPDATE_MOD} <> 0
    ),
    inserts AS (
        SELECT -o_orderkey AS o_orderkey,
               'N' AS o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % {INSERT_MOD} = 0
    ),
    merged AS (
        SELECT b.o_orderkey,
               coalesce(u.new_status, b.o_orderstatus) AS o_orderstatus,
               coalesce(u.new_price, b.o_totalprice) AS o_totalprice
        FROM orders b
        LEFT JOIN updates u USING (o_orderkey)
        WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM deletes)
        UNION ALL
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM inserts
    )
    SELECT o_orderstatus,
           count(*) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_price
    FROM merged GROUP BY o_orderstatus
    """,
    category="warehouse",
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (the CDC-apply operator) as ONE full-outer
    join: a deterministic change-set — updates (key % 97 = 0: status 'U',
    price +10.00), deletes (key % 89 = 0, minus update keys), inserts (key
    % 83 = 0, re-keyed by negation out of the base key space) — is
    applied to the orders
    base in a single pass:

        WHEN MATCHED AND op = 'delete' THEN DELETE
        WHEN MATCHED AND op = 'update' THEN UPDATE SET status, price
        WHEN NOT MATCHED            THEN INSERT

    The plan is one shuffle of each side on the merge key (at 100 TB:
    bucket both and the exchange disappears), then per-status counts to
    make the upserted state verifiable. The oracle expresses the same
    merge relationally (anti-delete + left-join-update + union-insert)."""
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    k = F.col("o_orderkey")
    updates = base.filter(k % UPDATE_MOD == 0).select(
        k.alias("m_key"),
        F.lit("update").alias("op"),
        F.lit("U").alias("new_status"),
        # flat +10.00 surcharge, NOT x1.10: a 2-dec price times 1.1 has a
        # third decimal, putting per-row rounds and the final sum on .xx5
        # half-boundaries where the engines disagree (sf0.1 replica, r6);
        # +10.00 keeps every value and sum on the cent grid
        F.round(F.col("o_totalprice") + 10.0, 2).alias("new_price"),
    )
    deletes = base.filter((k % DELETE_MOD == 0) & (k % UPDATE_MOD != 0)).select(
        k.alias("m_key"),
        F.lit("delete").alias("op"),
        F.lit(None).cast("string").alias("new_status"),
        F.lit(None).cast("double").alias("new_price"),
    )
    inserts = base.filter(k % INSERT_MOD == 0).select(
        (-k).alias("m_key"),
        F.lit("insert").alias("op"),
        F.lit("N").alias("new_status"),
        F.col("o_totalprice").alias("new_price"),
    )
    changes = updates.unionByName(deletes).unionByName(inserts)

    merged = (
        base.join(changes, base.o_orderkey == changes.m_key, "full_outer")
        # WHEN MATCHED AND delete → drop the row
        .filter((F.col("op").isNull()) | (F.col("op") != "delete"))
        .select(
            F.coalesce("o_orderkey", "m_key").alias("o_orderkey"),
            F.coalesce("new_status", "o_orderstatus").alias("o_orderstatus"),
            F.coalesce("new_price", "o_totalprice").alias("o_totalprice"),
        )
    )
    # sum on the exact DECIMAL grid, not DOUBLE (functions/money.py class:
    # at sf10 the per-status totals reach ~1.2e12 and the DOUBLE fold
    # drifted 5 cents off the oracle — every merged price is an exact
    # 2-dec value, so the decimal sum is exact in both engines)
    return merged.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        sum_money(F.col("o_totalprice").cast(PRICE_DEC), "sum_price"),
    )


@register(
    "scd2_event_type_history",
    oracle="""
    WITH o AS (
        SELECT user_id, event_type, ts, event_id,
               CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                    THEN 1 ELSE 0 END AS chg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    i AS (
        SELECT user_id, event_type, ts,
               sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS island
        FROM o
    ),
    g AS (
        SELECT user_id, island,
               min(event_type) AS event_type,
               min(ts) AS valid_from,
               count(*) AS n_events
        FROM i GROUP BY user_id, island
    )
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY island)
               AS valid_to,
           n_events
    FROM g
    """,
    category="warehouse",
)
def scd2_event_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 history build as gaps-and-islands: each user's event
    stream (ordered by ts with event_id as the unique tiebreak) is
    collapsed into maximal runs of the same event_type, emitted as
    [valid_from, valid_to) validity intervals — valid_to is the next
    island's start, NULL for the current (open) row, exactly how a
    slowly-changing dimension closes out superseded versions.

    Plan shape: lag → change flag → running-sum island id are two window
    functions over the SAME (user_id / ts, event_id) partitioning, so
    Catalyst plans one sort + one exchange; the island aggregation and the
    closing lead() reuse the user_id partitioning. Per-user streams are
    independent — the whole history build scales with the number of keys,
    never a global ordering."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = e.select(
        "user_id",
        "event_type",
        "ts",
        F.when(
            ~F.col("event_type").eqNullSafe(F.lag("event_type").over(w)), 1
        )
        .otherwise(0)
        .alias("chg"),
        "event_id",
    )
    i = o.withColumn(
        "island",
        F.sum("chg").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    g = i.groupBy("user_id", "island").agg(
        F.min("event_type").alias("event_type"),
        F.min("ts").alias("valid_from"),
        F.count("*").alias("n_events"),
    )
    wi = Window.partitionBy("user_id").orderBy("island")
    return g.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(wi).alias("valid_to"),
        "n_events",
    )


#: cdc_apply_sequential batch-2 moduli (applied to abs(key) so batch-1
#: inserts' negated keys participate): disjoint by the stated precedence
INC2_MOD = 7
DEL2_MOD = 13
UPD2_MOD = 11


def _relational_merge(base: DataFrame, changes: DataFrame) -> DataFrame:
    """One full-outer-join MERGE step (the same op set as the streaming
    CDC sink in streaming/cdc.py:merge_apply — update / delete / insert /
    increment), reusable so multi-batch applies compose by chaining.
    ``changes`` columns: m_key, op, new_status, new_price."""
    op = F.col("op")
    return (
        base.join(changes, base.o_orderkey == changes.m_key, "full_outer")
        .filter(op.isNull() | (op != "delete"))
        .select(
            F.coalesce("o_orderkey", "m_key").alias("o_orderkey"),
            F.when(op.isin("update", "insert"), F.col("new_status"))
            .otherwise(F.col("o_orderstatus"))
            .alias("o_orderstatus"),
            F.when(op == "increment", F.coalesce("o_totalprice", F.lit(0.0)) + F.col("new_price"))
            .when(op.isin("update", "insert"), F.col("new_price"))
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
        )
    )


@register(
    "cdc_apply_sequential",
    oracle=f"""
    WITH base AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    ),
    c1u AS (
        SELECT o_orderkey, 'U1' AS new_status,
               round(o_totalprice + 50.0, 2) AS new_price
        FROM base WHERE o_orderkey % {UPDATE_MOD} = 0
    ),
    s1 AS (
        SELECT b.o_orderkey,
               coalesce(u.new_status, b.o_orderstatus) AS o_orderstatus,
               coalesce(u.new_price, b.o_totalprice) AS o_totalprice
        FROM base b LEFT JOIN c1u u USING (o_orderkey)
        WHERE b.o_orderkey % {DELETE_MOD} <> 0 OR b.o_orderkey % {UPDATE_MOD} = 0
        UNION ALL
        SELECT -o_orderkey, 'N', o_totalprice
        FROM base WHERE o_orderkey % {INSERT_MOD} = 0
    ),
    s2 AS (
        SELECT o_orderkey,
               CASE WHEN abs(o_orderkey) % {INC2_MOD} <> 0
                         AND abs(o_orderkey) % {DEL2_MOD} <> 0
                         AND abs(o_orderkey) % {UPD2_MOD} = 0
                    THEN 'U2' ELSE o_orderstatus END AS o_orderstatus,
               CASE WHEN abs(o_orderkey) % {INC2_MOD} = 0
                    THEN o_totalprice + 100.0
                    WHEN abs(o_orderkey) % {DEL2_MOD} <> 0
                         AND abs(o_orderkey) % {UPD2_MOD} = 0
                    THEN 500.0
                    ELSE o_totalprice END AS o_totalprice
        FROM s1
        WHERE NOT (abs(o_orderkey) % {DEL2_MOD} = 0
                   AND abs(o_orderkey) % {INC2_MOD} <> 0)
    )
    SELECT o_orderstatus,
           count(*) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_price
    FROM s2 GROUP BY o_orderstatus
    """,
    category="warehouse",
)
def cdc_apply_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO CDC batches applied in sequence through the SAME one-join MERGE
    step the streaming sink runs per micro-batch (streaming/cdc.py) —
    proves the apply COMPOSES: batch 2's increments land on top of batch
    1's updates, and batch 2's deletes remove rows batch 1 inserted.

    Batch 1 = the merge_upsert_orders change set (update %97 → 'U1'
    +50.00, delete %89, insert negated %83). Batch 2 is derived from the
    post-batch-1 state by abs-key moduli (so batch-1's negative-key
    inserts participate): increment %7 (price += 100, NON-idempotent —
    the op whose exactly-once the streaming ledger tests pin), delete
    %13 (minus %7), update %11 (minus both) → status 'U2' price 500.

    Scale shape: two chained full-outer joins on the merge key — at
    100 TB both sides bucket on the key, and the chain stays one
    exchange per batch, which is exactly the micro-batch cost of the
    streaming deployment. The oracle states the composed result in
    plain CASE form, so any mis-sequencing (increment before update,
    delete leaking through) hash-mismatches."""
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    k = F.col("o_orderkey")
    c1 = (
        base.filter(k % UPDATE_MOD == 0)
        .select(
            k.alias("m_key"),
            F.lit("update").alias("op"),
            F.lit("U1").alias("new_status"),
            F.round(F.col("o_totalprice") + 50.0, 2).alias("new_price"),
        )
        .unionByName(
            base.filter((k % DELETE_MOD == 0) & (k % UPDATE_MOD != 0)).select(
                k.alias("m_key"),
                F.lit("delete").alias("op"),
                F.lit(None).cast("string").alias("new_status"),
                F.lit(None).cast("double").alias("new_price"),
            )
        )
        .unionByName(
            base.filter(k % INSERT_MOD == 0).select(
                (-k).alias("m_key"),
                F.lit("insert").alias("op"),
                F.lit("N").alias("new_status"),
                F.col("o_totalprice").alias("new_price"),
            )
        )
    )
    s1 = _relational_merge(base, c1)

    # Batch 2's change rows depend ONLY on the post-batch-1 KEY SET and
    # literals (the three ops carry constants, never an s1 column), and
    # s1's key multiset is a closed form over base: keep k where
    # k % DELETE_MOD != 0 or k % UPDATE_MOD == 0, plus -k where
    # k % INSERT_MOD == 0. Deriving c2 from base keys directly is
    # therefore value-identical to filtering s1 — and it stops the plan
    # from re-executing the whole batch-1 merge subtree three more times
    # (r15 optimization: the old three s1-filter branches made the plan
    # carry FOUR copies of the batch-1 full-outer join — 5 SortMergeJoins
    # total, re-verified identical hashes at sf0.001/0.01/0.1 after the
    # rewrite; guide §2.4 "remove shuffles outright").
    kept = base.select(k.alias("m_key")).filter(
        (k % DELETE_MOD != 0) | (k % UPDATE_MOD == 0)
    )
    ins = base.filter(k % INSERT_MOD == 0).select((-k).alias("m_key"))
    ak = F.abs(F.col("m_key"))
    is_inc = ak % INC2_MOD == 0
    is_del = (ak % DEL2_MOD == 0) & ~is_inc
    is_upd = (ak % UPD2_MOD == 0) & ~is_inc & ~is_del
    c2 = (
        kept.unionByName(ins)
        .filter(is_inc | is_del | is_upd)
        .select(
            "m_key",
            F.when(is_inc, F.lit("increment"))
            .when(is_del, F.lit("delete"))
            .otherwise(F.lit("update"))
            .alias("op"),
            F.when(is_upd, F.lit("U2")).cast("string").alias("new_status"),
            F.when(is_inc, F.lit(100.0))
            .when(is_upd, F.lit(500.0))
            .cast("double")
            .alias("new_price"),
        )
    )
    # key 0 is both updated (0 % 97 = 0) and inserted (-0 = 0), so s1
    # legitimately carries TWO key-0 rows; deriving c2 from the same key
    # multiset then emits two IDENTICAL change rows for that key, which
    # would fan out in the merge join. Distinct-ing the change set (full
    # rows — the op branches are disjoint per key, so same-key rows are
    # always identical) keeps one change per key, matching the oracle's
    # row-wise CASE semantics.
    s2 = _relational_merge(s1, c2.dropDuplicates())
    return s2.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        sum_money(F.col("o_totalprice").cast(PRICE_DEC), "sum_price"),
    )


@register(
    "cdc_extract_changes",
    oracle=f"""
    WITH v1 AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    ),
    v2 AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % {UPDATE_MOD} = 0 THEN 'U'
                    ELSE o_orderstatus END AS o_orderstatus,
               CASE WHEN o_orderkey % {UPDATE_MOD} = 0
                    THEN round(o_totalprice + 10.0, 2)
                    ELSE o_totalprice END AS o_totalprice
        FROM orders
        WHERE o_orderkey % {DELETE_MOD} <> 0 OR o_orderkey % {UPDATE_MOD} = 0
        UNION ALL
        SELECT -o_orderkey, 'N', o_totalprice
        FROM orders WHERE o_orderkey % {INSERT_MOD} = 0
    ),
    diff AS (
        SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
               CASE WHEN b.o_orderkey IS NULL THEN 'delete'
                    WHEN a.o_orderkey IS NULL THEN 'insert'
                    ELSE 'update' END AS op,
               b.o_orderstatus AS new_status,
               b.o_totalprice AS new_price
        FROM v1 a FULL OUTER JOIN v2 b ON a.o_orderkey = b.o_orderkey
        WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
           OR a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
           OR a.o_totalprice IS DISTINCT FROM b.o_totalprice
    )
    SELECT op, CAST(count(*) AS BIGINT) AS n_changes,
           CAST(sum(CAST(coalesce(new_price, 0) AS DECIMAL(12,2))) AS DOUBLE)
               AS sum_new_price,
           CAST(min(o_orderkey) AS BIGINT) AS min_key,
           CAST(max(o_orderkey) AS BIGINT) AS max_key
    FROM diff GROUP BY op
    """,
    category="warehouse",
)
def cdc_extract_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC EXTRACT — the inverse of the apply operators: diff two table
    snapshots (v1 = orders; v2 = orders after the merge_upsert_orders
    change set) into a minimal change stream of insert/update/delete ops.
    Snapshot diffing is how CDC is bootstrapped when the source has no
    change log (and how a lakehouse validates one): one full-outer join
    on the key, null-safe column comparison (IS DISTINCT FROM) so
    NULL-valued columns diff correctly, unchanged rows dropped.

    Round-trip property: applying the extracted changes to v1 through
    _relational_merge reproduces v2 exactly — pinned by
    tests/test_warehouse_graph.py. Reported as per-op counts + checksums
    (the change stream itself is row-per-change; the rollup keeps the
    oracle comparison compact).

    Scale shape: one key-partitioned full-outer join (bucketable, same
    exchange as the apply side) + a 3-group rollup. At 100 TB the diff
    prunes to touched partitions via partition-level metadata first;
    the row-level plan here is the per-partition step."""
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
                (-k).alias("o_orderkey"),
                F.lit("N").alias("o_orderstatus"),
                F.col("o_totalprice"),
            )
        )
    )
    changes = extract_changes(base, v2)
    return changes.groupBy("op").agg(
        F.count("*").alias("n_changes"),
        sum_money_grid(F.coalesce("new_price", F.lit(0.0)), "sum_new_price"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


def extract_changes(v1: DataFrame, v2: DataFrame) -> DataFrame:
    """Snapshot diff → change stream (o_orderkey, op, new_status,
    new_price): the reusable EXTRACT half of the CDC pair. Inverse of
    _relational_merge: merge(v1, extract_changes(v1, v2)) == v2."""
    a = v1.alias("a")
    b = v2.alias("b")
    joined = a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer")
    changed = joined.filter(
        F.col("a.o_orderkey").isNull()
        | F.col("b.o_orderkey").isNull()
        | ~F.col("a.o_orderstatus").eqNullSafe(F.col("b.o_orderstatus"))
        | ~F.col("a.o_totalprice").eqNullSafe(F.col("b.o_totalprice"))
    )
    return changed.select(
        F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey")).alias("o_orderkey"),
        F.when(F.col("b.o_orderkey").isNull(), F.lit("delete"))
        .when(F.col("a.o_orderkey").isNull(), F.lit("insert"))
        .otherwise(F.lit("update"))
        .alias("op"),
        F.col("b.o_orderstatus").alias("new_status"),
        F.col("b.o_totalprice").alias("new_price"),
    )
