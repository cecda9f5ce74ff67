"""Query registry: the single source of truth for the driver contract.

Each entry pairs a Spark implementation ``fn(spark, sf_dir) -> DataFrame``
with an equivalent DuckDB oracle SQL string (or ``None`` for ops whose
semantics aren't SQL-expressible — the driver then records a rows-only
check).

Conventions enforced here so Spark results hash-match DuckDB results:
  * every computed column is aliased identically on both sides;
  * float aggregates are rounded (2 dp for money, more for similarities)
    on BOTH sides so summation-order noise can't flip the value hash;
  * any LIMIT/top-k query carries a unique-key tiebreaker so the selected
    row set is deterministic;
  * sums over integer columns are CAST(... AS BIGINT) in the oracle
    (DuckDB widens integer SUM to HUGEINT, Spark to LONG).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    category: str
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, category: str) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, category, (fn.__doc__ or "").strip())
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every module that registers queries, then return the registry."""
    # imports are side-effectful (decorators populate REGISTRY)
    from restaurant_etl_spark.operators import (  # noqa: F401
        corpus_prep,
        dedup,
        embedding_prep,
        event_analytics,
        graph,
        incremental,
        io_formats,
        layout,
        menu,
        multimodal_queries,
        profiling,
        relational,
        reshape_extra,
        sampling,
        scalar_extra,
        similarity,
        streaming_batch,
        text_analysis,
        tpch_full,
        tpch_more,
        udf_surface,
        warehouse,
        windows_aggs,
    )

    return REGISTRY
