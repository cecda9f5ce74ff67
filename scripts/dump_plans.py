"""Dump formatted physical plans of the most expensive headline queries to
PLANS.md — the committed artifact of the `.explain("formatted")` audit
loop (scan pushdown, broadcast choices, exchange counts are reviewable in
the repo, not just in a transcript).

Usage: python scripts/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from restaurant_etl_spark.operators.registry import load_all  # noqa: E402
from restaurant_etl_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: the queries whose plans carry the scale argument (most expensive at
#: sf0.1 plus one representative per optimization story)
AUDITED = [
    "q21_waiting_suppliers",
    "similarity_topk_cosine",
    "dedup_embedding_keep",
    "similarity_ivf_sqrtn_topk",
    "q5_region_revenue",
    "menu_parse_items",
    "asof_purchase_last_view",
    "dedup_minhash_lsh",
    "graph_pagerank_parts",
    "merge_upsert_orders",
    "bloom_prune_semi_join",
    # round-6 additions
    "dedup_containment",
    "dedup_incremental_batch",
    "bpe_apply_merges",
    "cdc_apply_sequential",
    "layout_zorder_skipping",
    # round-7 additions: the skew-proof (user, horizon-bucket) interval
    # join key and the exact-decimal money aggregation (UnscaledValue
    # long-backed sums inside the same partial+final hash agg)
    "stream_stream_interval_join_batch",
    "q1_pricing_summary",
    # round-8 addition: the hoisted per-row norms (computed once before
    # the pair/scan product in topk/exact-cosine) and q1's integer-only
    # grid averages show up in the projections of plans above; the exact
    # baseline's plan is audited to show the norm hoist + the guard
    "dedup_embedding_cosine",
]


#: measured artifact preserved across regenerations (r6): the physical
#: z-order rewrite's row-group skipping gain
_ZORDER_NOTE = """## layout_zorder_skipping — measured physical skip gain (r6)

The registered query simulates three layouts' zone maps in one pass each;
the PHYSICAL twin (`tests/test_layout.py::
test_physical_zorder_rewrite_improves_rowgroup_skipping`) really rewrites
lineitem with `repartitionByRange(64, zval).sortWithinPartitions(zval)`
(zval = Morton key of min-max-normalized 16-bit part/supp keys) and reads
back the parquet row-group statistics pyarrow exposes. Measured at sf0.1,
predicate = lowest eighth of each key's domain:

| layout | partkey skip | suppkey skip |
|---|---|---|
| natural (order-key ranges, 8 files) | 0.0000 | 0.0000 |
| z-clustered (64 files) | 0.7423 | 0.8367 |

i.e. the clustered rewrite converts a full scan into a ~75-84% row-group
skip on BOTH interleaved dimensions while the natural layout skips
nothing on either. The rewrite itself is one range-partitioned shuffle +
local sort — the table-maintenance plan at 100 TB.
"""


def _ivf_build_section(spark, sf_dir: str, mode) -> str:
    """The IVF BUILD's assignment pass (r10 rewrite, VERDICT r10 #5):
    not a registered query — the build runs once per corpus and its
    plan is what the cold ledger measures — so it is audited here
    explicitly. The pre-r10 shape pushed the full n×√n product through
    a vec_id Exchange under a row_number Window; the r10 shape
    partial-aggregates max(struct(cos, −cell, payload)) BEFORE the
    exchange (physically a partial SortAggregate — struct buffers are
    not hash-mutable — but the sort is per-partition and pre-shuffle).
    Pinned by tests/test_plans.py::
    test_ivf_assignment_pass_partial_aggregates_before_exchange."""
    from pyspark.sql import functions as F

    from restaurant_etl_spark.operators import similarity as sim

    e = sim._emb(spark, sf_dir).select("vec_id", F.col("embedding").alias("v"))
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
        sim._argmax_cell(a_r)._jdf.queryExecution().explainString(mode)
    )
    return "\n".join([
        "## ivf build assignment pass (not a registered query)",
        "",
        "One Lloyd/inverted-file assignment pass of the IVF index build —",
        "the dominant one-time cost in the cold ledger. r10 replaced the",
        "row_number Window (which shuffled the full n×√n scored product on",
        "vec_id) with an argmax aggregate: the PARTIAL aggregate collapses",
        "each map partition to ≤n rows before the exchange. The physical",
        "node is a partial SortAggregate, not HashAggregate — max(struct)",
        "buffers are not hash-mutable in Spark — and its sort is",
        "per-partition, pre-shuffle; there is no Window and no",
        "rangepartitioning exchange anywhere in the pass.",
        "",
        "```",
        plan.rstrip(),
        "```",
        "",
    ])


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("plan-dump", cpus=8, shuffle_partitions=8)
    specs = load_all()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    out = [
        "# PLANS.md — physical plans of the audited headline queries",
        "",
        f"Generated by `scripts/dump_plans.py` at `{sf_dir}` (Spark {spark.version}).",
        "What to look for: `PushedFilters`/`ReadSchema` on every scan (pushdown +",
        "pruning), `BroadcastHashJoin` on bounded sides, no `CartesianProduct` /",
        "unbounded `BroadcastNestedLoopJoin` on hot paths (the cross-BNLJ that DO",
        "appear build a broadcast side of one row or the tiny query set — the",
        "designed scan-x-broadcast shape), partial `HashAggregate` before each",
        "`Exchange`. The one `SortMergeJoin` (dedup_embedding_keep's corpus ⟕",
        "verified-duplicates) is deliberate: that side is unbounded at scale and",
        "the join's key partitioning is reused by the following groupBy.",
        "",
    ]
    for name in AUDITED:
        df = specs[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        out += [f"## {name}", "", "```", plan.rstrip(), "```", ""]

    out += [_ivf_build_section(spark, sf_dir, mode), _ZORDER_NOTE]
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote {os.path.join(REPO, 'PLANS.md')}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
