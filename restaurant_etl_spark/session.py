"""SparkSession factory.

One place to encode the scale posture: AQE on (runtime re-planning, skew-join
splitting, partition coalescing), explicit shuffle-partition sizing, Arrow for
every pandas-UDF boundary, and UTC session time so results compare bit-for-bit
against the DuckDB oracle (parquet timestamps are tz-naive).

On a real cluster only ``master`` and the partition counts change; every query
in :mod:`restaurant_etl_spark.operators` is written against this config so the
same logical plans hold at 100 TB (broadcast hints for dims, partial aggs,
pushed filters).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _env_shuffle() -> int:
    """SPARK_GRAFT_SHUFFLE parsed defensively (ADVICE r12): anything
    that isn't a positive integer — unset, garbage, zero, negative —
    falls back to 0 (meaning "use the cpus default") with a warning
    instead of raising or sneaking a negative into
    spark.sql.shuffle.partitions."""
    raw = os.environ.get("SPARK_GRAFT_SHUFFLE", "").strip()
    if not raw:
        return 0
    try:
        v = int(raw)
    except ValueError:
        v = -1
    if v <= 0:
        import warnings

        warnings.warn(
            f"SPARK_GRAFT_SHUFFLE={raw!r} is not a positive integer; "
            "using the cpus default",
            stacklevel=2,
        )
        return 0
    return v


def get_spark(
    app_name: str = "restaurant-etl-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``shuffle_partitions`` defaults to the core count locally; on a cluster
    set it to ~2-3x total executor cores (AQE coalesces the excess).
    """
    cpus = cpus or DEFAULT_CPUS
    # SPARK_GRAFT_SHUFFLE (r12): at big scale points (n=100M vectors) the
    # core-count default leaves ~3M rows per shuffle partition and the
    # per-task execution-memory slice (driver_mem * 0.6 / cpus) can't hold
    # a join's build side — raise partitions without touching callers.
    # AQE coalesces the excess on small queries, so over-provisioning is
    # safe.
    shuffle = shuffle_partitions or _env_shuffle() or cpus
    # mount the vendored protobuf bridge (no-op when a real protobuf is
    # installed) BEFORE the JVM starts: transformWithStateInPandas's state
    # protocol needs google.protobuf inside the forked Python WORKERS,
    # which inherit $PYTHONPATH from the JVM environment at launch
    from restaurant_etl_spark._vendor.protobuf_shim import ensure_protobuf

    ensure_protobuf()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # -- oracle parity -------------------------------------------------
        .config("spark.sql.session.timeZone", "UTC")
        # -- adaptive execution: runtime partition coalescing, skew-join
        #    splitting, join-strategy switching -----------------------------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # -- shuffle & scan sizing ----------------------------------------
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.files.maxPartitionBytes", "134217728")  # 128 MiB
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # -- python/arrow boundary ----------------------------------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # managed-table storage (bucketed tables) out of the repo tree
        .config("spark.sql.warehouse.dir", os.path.join(tempfile.gettempdir(), "spark-warehouse"))
        # quieter local runs
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def fan_out(df, *keys: str):
    """Hash-repartition to the session's full parallelism before a
    CPU-heavy per-row derivation (regex menu parse, per-shingle digests,
    per-token simhash).

    Why unconditional: the two ways a plan arrives narrow are (a) a small
    single-row-group parquet file = one scan task, and (b) AQE's
    advisory-size coalescing, which measures BYTES and happily merges a
    2 MB / 2000-doc partition that carries minutes of per-row CPU. An
    explicit numPartitions is exempt from AQE coalescing, so this pins the
    expensive map at full width in both cases. The trade is one shuffle of
    the RAW rows against running the dominant map stage on every core —
    worth it whenever the per-row work is ≥ a few µs, which is the only
    situation this helper is used in. Hash keys keep placement
    deterministic; downstream aggregates are key-partitioned so results
    never depend on this layout."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    return df.repartition(target, *[df[k] for k in keys]) if keys else df.repartition(target)


#: per-key cache of the ONE DataFrame each call site keeps persisted
_SCOPED: dict[str, object] = {}


def persist_scoped(df, key: str):
    """Persist ``df``, releasing whatever was previously persisted under
    ``key``.

    Registered queries return unmaterialized plans, so a query that feeds
    one expensive intermediate (a shingle table, an extraction pass) to
    several consumers can't unpersist at the right moment itself. Scoping
    the cache to "latest invocation per call site" bounds cached blocks to
    one table per site instead of leaking one per invocation across a
    long-lived session (driver runs + bench loops)."""
    old = _SCOPED.pop(key, None)
    if old is not None:
        old.unpersist(blocking=False)
    df.persist()
    _SCOPED[key] = df
    return df
