"""Operator/query library.

Every public query is registered in :mod:`restaurant_etl_spark.operators.registry`
with an optional DuckDB oracle SQL string; ``__spark_entry__`` exposes the
registry to the driver's correctness harness.
"""

from restaurant_etl_spark.operators.registry import REGISTRY, register

__all__ = ["REGISTRY", "register"]
