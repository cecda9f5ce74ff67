"""As-of join — a native-Spark implementation of the operator DuckDB spells
``ASOF JOIN`` (for each left row, the latest right row with
``right.ts <= left.ts`` within the same key group).

Strategy (scale-first): tag both sides, UNION them, and run one
``last(..., ignorenulls=True)`` window over ``(key, ts)``. Cost = one shuffle
on the key columns + one sort within partitions — same as a sort-merge join,
no per-key quadratic blowup, no driver-side logic. This is the plan that
survives 100 TB: skew on a hot key is handled by AQE, and the window state is
O(1) per row (running "last seen right value").

Alternative rejected: ``left.join(right, key & ts-cond).groupBy(max)`` — the
non-equi condition degenerates to a per-key cross product, quadratic on hot
keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_SIDE = "__asof_side"
_TS = "__asof_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    inclusive: bool = True,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``value_cols`` taken from the
    latest ``right`` row with ``right_ts <= left_ts`` (or ``<`` when
    ``inclusive=False``) and equal ``on`` keys; nulls when no such row.

    ``value_cols`` must not collide with ``left`` column names.
    """
    left_cols = left.columns
    overlap = set(value_cols) & set(left_cols)
    if overlap:
        raise ValueError(f"value_cols collide with left columns: {sorted(overlap)}")

    l_tagged = left.select(
        *[F.col(c) for c in left_cols],
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in value_cols],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) if c not in on else F.col(c) for c in left_cols],
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        *[F.col(c) for c in value_cols],
    )

    # at equal ts: right row sorts first when inclusive, so the window sees it
    side_order: Column = F.col(_SIDE).asc() if inclusive else F.col(_SIDE).desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(_TS).asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    unioned = l_tagged.unionByName(r_tagged)
    filled = unioned.select(
        *left_cols,
        F.col(_SIDE),
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
    )
    return filled.filter(F.col(_SIDE) == 1).drop(_SIDE)
