"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet tables, then compares row count, sorted column names,
and an order-insensitive value hash (columns sorted by name, rows stringified
and sorted). Exit code 1 if anything mismatches.

Usage:  python scripts/check_oracle.py [sf_dir] [query ...]
        python scripts/check_oracle.py [sf_dir] --pagerank-margins [query ...]

``--pagerank-margins`` additionally runs the PageRank FP-margin guard
(graph.pagerank_rank_margins) at the given sf_dir and fails the run if
the rank-20/21 gap or any top rank's distance from a 4-dp rounding
half-boundary falls inside FP slack — the scale-sweep arm of
tests/test_warehouse_graph.py::test_pagerank_margins_clear_fp_slack.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# per-line results must survive a crash when stdout is a redirected file
# (block buffering otherwise holds hours of progress in memory)
sys.stdout.reconfigure(line_buffering=True)

import duckdb

import __spark_entry__ as entrymod
from restaurant_etl_spark.session import get_spark
from restaurant_etl_spark.sources.tables import TABLES


def _canon_value(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if v != v:  # NaN
            return "<NaN>"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))  # 3.0 vs 3 normalization
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    return str(v)


def canonicalize(cols: list[str], rows: list[tuple]) -> tuple[list[str], str, int]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    canon_rows = sorted("|".join(_canon_value(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(canon_rows).encode()).hexdigest()[:16]
    return sorted_cols, h, len(rows)


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--pagerank-margins"]
    check_margins = "--pagerank-margins" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    con = duckdb.connect()
    # An in-memory DuckDB defaults to memory_limit = 80% of RAM with NO
    # temp directory — it cannot spill, so a heavy pair oracle grows until
    # the kernel OOM-kills the whole run (observed at sf1: 110 GB RSS on
    # dedup_containment with a 24 GB Spark JVM alongside). Cap the budget
    # below RAM-minus-JVM and give it a spill dir so big hash joins
    # gracefully go out-of-core instead.
    con.execute(f"SET memory_limit='{os.environ.get('DUCKDB_MEM', '60GB')}'")
    spill = "/tmp/duckdb_oracle_spill"
    os.makedirs(spill, exist_ok=True)
    con.execute(f"SET temp_directory='{spill}'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    spark = get_spark("oracle-check")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    failures, passed, rows_only = [], 0, 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            continue
        if name not in oracles:
            rows_only += 1
            print(f"rows-only  {name}: {len(srows)} rows  ({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            continue

        s_cols, s_hash, s_n = canonicalize(scols, [tuple(r) for r in srows])
        d_cols, d_hash, d_n = canonicalize(dcols, drows)
        problems = []
        if s_cols != d_cols:
            problems.append(f"cols {s_cols} != {d_cols}")
        if s_n != d_n:
            problems.append(f"rows {s_n} != {d_n}")
        if s_hash != d_hash:
            problems.append("value hash mismatch")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL  {name}: {'; '.join(problems)}  ({time.time()-t0:.1f}s)")
            if s_cols == d_cols and s_n == d_n:
                # show first differing canonical rows to debug
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                s_set = sorted("|".join(_canon_value(tuple(r)[i]) for i in order) for r in srows)
                dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
                d_set = sorted("|".join(_canon_value(r[i]) for i in dorder) for r in drows)
                for a, b in zip(s_set, d_set):
                    if a != b:
                        print(f"      spark : {a[:220]}")
                        print(f"      duckdb: {b[:220]}")
                        break
        else:
            passed += 1
            print(f"ok    {name}: {s_n} rows hash={s_hash}  ({time.time()-t0:.1f}s)")

    if check_margins:
        from restaurant_etl_spark.operators.graph import pagerank_rank_margins

        m = pagerank_rank_margins(spark, sf_dir)
        status = "ok   " if m["ok"] else "FAIL "
        print(
            f"{status} pagerank_margins: cutoff_gap={m['cutoff_gap_grid']:.6f} "
            f"min_half_dist={m['min_half_dist_grid']:.6f} "
            f"(slack {m['slack_grid']}) grid units"
        )
        if not m["ok"]:
            failures.append(("pagerank_margins", str(m)))

    print(f"\n{passed} passed, {len(failures)} failed, {rows_only} rows-only")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
