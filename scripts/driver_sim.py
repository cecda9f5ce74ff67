"""Drive the __spark_entry__ contract exactly as the external driver does:
a VANILLA SparkSession (none of our tuned configs), entry() smoke at
sf0.001, then every queries() entry vs its oracle_sql() on DuckDB.

Usage: python scripts/driver_sim.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    # the driver's session, not ours: plain local[*], default configs
    spark = (
        SparkSession.builder.appName("driver-sim").master("local[*]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    import __spark_entry__ as em

    # -- t1 smoke ---------------------------------------------------------
    df = em.entry(spark)
    rows = df.collect()
    print(f"entry(): {len(rows)} rows, schema={df.schema.simpleString()}")
    assert len(rows) > 0, "entry() returned no rows"

    # -- contract sanity --------------------------------------------------
    qs = em.queries()
    oracles = em.oracle_sql()
    extra = set(oracles) - set(qs)
    assert not extra, f"oracle_sql keys missing from queries(): {extra}"
    print(f"queries: {len(qs)}  with-oracle: {len(oracles)}  rows-only: {len(set(qs) - set(oracles))}")

    # -- t2 correctness (delegated to the same compare as check_oracle) ---
    from scripts.check_oracle import canonicalize

    import duckdb

    con = duckdb.connect()
    from restaurant_etl_spark.sources.tables import TABLES

    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    from pyspark.sql.types import ArrayType, MapType, StructType

    only = set(sys.argv[2:])
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        # per-query fault isolation: an AnalysisException in one query must
        # not abort the sweep — report it and keep going (VERDICT r3 #10)
        try:
            _run_one(name, fn, spark, sf_dir, oracles, con, canonicalize, failures)
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            msg = (str(exc).splitlines() or [""])[0][:200]
            print(f"ERR   {name}: {type(exc).__name__}: {msg}")

    print(f"\nDRIVER-SIM: {len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


def _run_one(name, fn, spark, sf_dir, oracles, con, canonicalize, failures) -> None:
    from pyspark.sql.types import ArrayType, MapType, StructType

    sdf = fn(spark, sf_dir)
    # The real driver canonicalizes with pandas sort_values, which dies
    # on list/dict cell values — flag complex output types as failures.
    complex_cols = [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    if complex_cols:
        failures.append(name)
        print(f"FAIL  {name}: complex-typed output columns {complex_cols}")
        return
    srows = [tuple(r) for r in sdf.collect()]
    if name not in oracles:
        print(f"rows-only  {name}: {len(srows)} rows")
        return
    res = con.execute(oracles[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    s = canonicalize(sdf.columns, srows)
    d = canonicalize(dcols, drows)
    status = "ok " if s == d else "FAIL"
    if s != d:
        failures.append(name)
    print(f"{status}  {name}: spark={s[2]} duck={d[2]} hash {'match' if s[1]==d[1] else 'MISMATCH'}")


if __name__ == "__main__":
    sys.exit(main())
