"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet tables, then compares row count, sorted column names,
and an order-insensitive value hash (columns sorted by name, rows stringified
and sorted). Exit code 1 if anything mismatches.

Usage:  python scripts/check_oracle.py [sf_dir] [query ...]
        python scripts/check_oracle.py [sf_dir] --pagerank-margins [query ...]
        python scripts/check_oracle.py [sf_dir] --fingerprint=q1,q2[:dp] [query ...]

Unknown ``--flags`` are an error (ADVICE r9): a typo'd fingerprint flag
must not silently fall back to the full driver-collect path.

``--pagerank-margins`` additionally runs the PageRank FP-margin guard
(graph.pagerank_rank_margins) at the given sf_dir and fails the run if
the rank-20/21 gap or any top rank's distance from a 4-dp rounding
half-boundary falls inside FP slack — the scale-sweep arm of
tests/test_warehouse_graph.py::test_pagerank_margins_clear_fp_slack.

``--fingerprint`` (VERDICT r8 #2) lists queries whose result sets are too
large to collect through the driver (e.g. dedup_simhash's ~105M pair rows
at sf10): for those, each ENGINE computes an aggregate fingerprint over
its own result — COUNT(*) plus two independent order-insensitive 60-bit
hash sums (md5 of the '|'-joined canonical row, chars 1-15 and 17-31,
summed exactly in >=128-bit integer arithmetic) — and only the three
scalars cross the driver. Same discriminating power class as the full
hash compare (order-insensitive content equality), restricted to
integer/string/boolean output columns where both engines' CAST-to-string
is bit-identical; a query with float/decimal/list columns is refused
loudly rather than fingerprinted wrong — UNLESS a dp grid is declared
(``--fingerprint=name:dp``, VERDICT r9 #3), in which case float/double/
decimal columns are quantized floor(x·10^dp + 0.5) → BIGINT with the
same IEEE-double ops in both engines, plus a reproducibility margin
guard (see _FP_GRID_SLACK). List columns remain refused.
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


#: Spark types whose CAST(col AS STRING) is bit-identical to DuckDB's
#: CAST(col AS VARCHAR) — the precondition for in-engine fingerprinting.
#: Floats/decimals/lists render differently per engine; without a declared
#: dp grid they are refused.
_FP_SAFE_TYPES = {"tinyint", "smallint", "int", "bigint", "string", "boolean"}

#: Spark simpleString prefixes treated as grid-quantizable when a dp grid
#: is declared (``--fingerprint=name:dp``).
_FP_GRID_TYPES = ("float", "double", "decimal")

#: Grid-boundary slack in GRID UNITS (VERDICT r9 #3). The quantizer is
#: floor(x·10^dp + 0.5) → BIGINT in both engines — identical IEEE-double
#: ops, so a hash MATCH is sound by construction (any row quantizing
#: differently mismatches the sums). The margin guards REPRODUCIBILITY:
#: Spark's cross-partition sum order is nondeterministic, so a value
#: within FP noise of a floor boundary could quantize differently on a
#: different run. We fail when the nearest-boundary distance is inside
#: slack AND the two engines disagree on that distance (their doubles
#: differ near a boundary). Bit-EQUAL tiny margins pass with an annotation
#: ONLY when every near-boundary value is verifiably ON the dp lattice —
#: scaled value integral to within _FP_LATTICE_ULPS ulps (e.g. jaccard
#: i/2^k landing exactly on the grid: the arithmetic is exact in both
#: engines, so floor is deterministic). A bit-equal tiny margin that is
#: OFF the lattice is a coincidence this run — a nondeterministic
#: partition-sum order could flip the floor on a re-run — so it refuses
#: like the disagreeing case (ADVICE r10).
_FP_GRID_SLACK = 1e-9

#: ulp tolerance for the on-lattice proof: the scaled form y = x·10^dp
#: + 0.5 carries one multiply + one add of rounding, so an exactly-
#: representable lattice value lands within ~2 ulps of the integer.
_FP_LATTICE_ULPS = 2


def _fp_grid_cols(schema_fields) -> list[str]:
    """Column names needing grid quantization (float/double/decimal)."""
    return [
        f.name
        for f in schema_fields
        if f.dataType.simpleString().startswith(_FP_GRID_TYPES)
    ]


def _fp_time_cols(schema_fields) -> dict[str, str]:
    """timestamp/date columns → canonicalized as exact integers (r13:
    scd2_event_type_history's 80M-row sf100 output exceeds the driver
    collect path and its history columns are timestamps). Both engines
    map a timestamp to epoch MICROSECONDS as BIGINT (Spark unix_micros /
    DuckDB epoch_us, both UTC) and a date to days-since-epoch — integer
    arithmetic, no format-string parity to trust."""
    out = {}
    for f in schema_fields:
        t = f.dataType.simpleString()
        if t.startswith("timestamp"):
            out[f.name] = "timestamp"
        elif t == "date":
            out[f.name] = "date"
    return out


def _fingerprint_spark(sdf, dp: int | None = None):
    """(count, hsum1, hsum2, margin) computed INSIDE Spark — no rows reach
    the driver. Canonical row = sorted-by-name columns cast to string,
    NULL → '<NULL>', joined with '|' (the collect-path canonicalization
    for int/string/bool values). With ``dp`` set, float/double/decimal
    columns are grid-quantized floor(x·10^dp + 0.5) → BIGINT before the
    cast (VERDICT r9 #3), and ``margin`` is the minimum distance of any
    quantized value's scaled form from its nearest floor boundary, in
    grid units (None when no column was quantized)."""
    from pyspark.sql import functions as F

    grid = set(_fp_grid_cols(sdf.schema.fields)) if dp is not None else set()
    exprs, dists = [], []
    for f in sdf.schema.fields:
        t = f.dataType.simpleString()
        if f.name in grid:
            y = F.col(f.name).cast("double") * F.lit(float(10**dp)) + F.lit(0.5)
            m = F.least(y - F.floor(y), F.floor(y) + F.lit(1.0) - y)
            # off-lattice flag (ADVICE r10): near a boundary but NOT
            # integral to within _FP_LATTICE_ULPS ulps of the scaled
            # value — a bit-equal margin on such a row is coincidence,
            # not determinism
            ulp_tol = F.greatest(F.abs(y), F.lit(1.0)) * F.lit(
                _FP_LATTICE_ULPS * 2.0**-52
            )
            exprs.append((f.name, F.floor(y).cast("bigint").cast("string")))
            dists.append(m.alias(f"m_{f.name}"))
            dists.append(
                F.when(
                    (m < F.lit(_FP_GRID_SLACK)) & (m > ulp_tol), 1
                ).otherwise(0).alias(f"o_{f.name}")
            )
        elif t in _FP_SAFE_TYPES:
            exprs.append((f.name, F.col(f.name).cast("string")))
        elif t.startswith("timestamp"):
            exprs.append((f.name, F.unix_micros(F.col(f.name)).cast("string")))
        elif t == "date":
            exprs.append((
                f.name,
                F.datediff(F.col(f.name), F.lit("1970-01-01").cast("date"))
                .cast("string"),
            ))
        else:
            raise TypeError(
                f"fingerprint mode needs int/string/boolean/timestamp/date "
                f"columns (or float/decimal with --fingerprint=name:dp); "
                f"{f.name} is {t}"
            )
    s = F.concat_ws(
        "|", *[F.coalesce(e, F.lit("<NULL>")) for _, e in sorted(exprs)]
    )
    # conv() is unsigned-64-bit safe for 15 hex chars (60 bits); the sums
    # accumulate exactly in DECIMAL(38,0) (105M rows * 2^60 ~ 1e26 << 1e38)
    h1 = F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("decimal(38,0)")
    h2 = F.conv(F.substring(F.md5(s), 17, 15), 16, 10).cast("decimal(38,0)")
    row = (
        sdf.select(h1.alias("h1"), h2.alias("h2"), *dists)
        .agg(
            F.count("*").alias("n"),
            F.sum("h1").alias("s1"),
            F.sum("h2").alias("s2"),
            *[F.min(f"m_{c}").alias(f"m_{c}") for c in sorted(grid)],
            *[F.sum(f"o_{c}").alias(f"o_{c}") for c in sorted(grid)],
        )
        .collect()[0]
    )
    margin, off_lattice = None, 0
    if grid:
        vals = [row[f"m_{c}"] for c in sorted(grid) if row[f"m_{c}"] is not None]
        margin = min(vals) if vals else None
        off_lattice = sum(int(row[f"o_{c}"] or 0) for c in sorted(grid))
    return (
        int(row["n"]), int(row["s1"] or 0), int(row["s2"] or 0),
        margin, off_lattice,
    )


def _fingerprint_duck(
    con, sql: str, cols: list[str], grid_cols: list[str] | None = None,
    dp: int | None = None, time_cols: dict[str, str] | None = None,
):
    """Same scalars computed INSIDE DuckDB over the oracle query.
    sum(BIGINT) widens to HUGEINT (128-bit), so the 60-bit row hashes
    accumulate exactly. ``cols`` is the Spark result's column list — the
    DuckDB projection must expose the same names (schema parity is part
    of the gate; a missing name errors here). ``grid_cols`` come from the
    SPARK schema (the source of truth for which columns are float), so
    both engines quantize exactly the same columns with the same
    floor(x·10^dp + 0.5) double arithmetic."""
    grid = sorted(set(grid_cols or []) & set(cols))
    canon_parts, dist_sel = [], []
    ulp_factor = _FP_LATTICE_ULPS * 2.0**-52
    for c in sorted(cols):
        if c in grid:
            y = f"(CAST({c} AS DOUBLE) * {float(10**dp)!r} + 0.5)"
            m = f"least({y} - floor({y}), floor({y}) + 1.0 - {y})"
            canon_parts.append(
                f"coalesce(CAST(CAST(floor({y}) AS BIGINT) AS VARCHAR), '<NULL>')"
            )
            dist_sel.append(f"{m} AS m_{c}")
            dist_sel.append(
                f"CASE WHEN {m} < {_FP_GRID_SLACK!r} AND {m} > "
                f"greatest(abs({y}), 1.0) * {ulp_factor!r} "
                f"THEN 1 ELSE 0 END AS o_{c}"
            )
        elif (time_cols or {}).get(c) == "timestamp":
            canon_parts.append(
                f"coalesce(CAST(epoch_us({c}) AS VARCHAR), '<NULL>')"
            )
        elif (time_cols or {}).get(c) == "date":
            canon_parts.append(
                "coalesce(CAST(date_diff('day', DATE '1970-01-01', "
                f"{c}) AS VARCHAR), '<NULL>')"
            )
        else:
            canon_parts.append(f"coalesce(CAST({c} AS VARCHAR), '<NULL>')")
    canon = " || '|' || ".join(canon_parts)
    inner_extra = (", " + ", ".join(dist_sel)) if dist_sel else ""
    margin_aggs = "".join(f", min(m_{c}) AS m_{c}" for c in grid)
    off_aggs = "".join(f", sum(o_{c}) AS o_{c}" for c in grid)
    res = con.execute(
        f"""
        SELECT count(*) AS n,
               sum(('0x' || substr(md5(s), 1, 15))::BIGINT) AS s1,
               sum(('0x' || substr(md5(s), 17, 15))::BIGINT) AS s2
               {margin_aggs}{off_aggs}
        FROM (SELECT {canon} AS s{inner_extra} FROM ({sql}) fp_inner) fp_rows
        """
    ).fetchone()
    k = len(grid)
    margins = [float(v) for v in res[3:3 + k] if v is not None]
    margin = min(margins) if grid and margins else None
    off_lattice = sum(int(v or 0) for v in res[3 + k:3 + 2 * k]) if grid else 0
    return int(res[0]), int(res[1] or 0), int(res[2] or 0), margin, off_lattice


def _default_duckdb_mem() -> str:
    """min(60GB, 50% of physical RAM): the old flat 60GB default RAISED
    DuckDB's own 80%-of-RAM limit on small hosts, inviting the OOM killer
    instead of preventing it (ADVICE r8). DUCKDB_MEM still overrides."""
    try:
        pages = os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
        half_gb = max(1, pages // (2 * 1024**3))
    except (ValueError, OSError, AttributeError):
        half_gb = 60
    return f"{min(60, half_gb)}GB"


def main() -> int:
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    check_margins = False
    fingerprint: dict[str, int | None] = {}
    for fl in flags:
        # ADVICE r9: unknown --flags used to be silently stripped, so a
        # typo'd --fingerprints=... fell back to the full collect path
        # (a ~105M-row driver collect at sf10). Unknown flags now error.
        if fl == "--pagerank-margins":
            check_margins = True
        elif fl.startswith("--fingerprint="):
            for item in fl.split("=", 1)[1].split(","):
                if ":" in item:
                    qname, dp_s = item.split(":", 1)
                    try:
                        fingerprint[qname] = int(dp_s)
                    except ValueError:
                        raise SystemExit(
                            f"bad fingerprint spec {item!r}: dp must be an int"
                        ) from None
                else:
                    fingerprint[item] = None
        elif fl == "--fingerprint":
            raise SystemExit("use --fingerprint=q1,q2[:dp] (equals form)")
        else:
            raise SystemExit(
                f"unknown flag {fl!r}; valid: --pagerank-margins, "
                "--fingerprint=q1[:dp],q2[:dp]"
            )
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    con = duckdb.connect()
    # An in-memory DuckDB defaults to memory_limit = 80% of RAM with NO
    # temp directory — it cannot spill, so a heavy pair oracle grows until
    # the kernel OOM-kills the whole run (observed at sf1: 110 GB RSS on
    # dedup_containment with a 24 GB Spark JVM alongside). Cap the budget
    # below RAM-minus-JVM and give it a spill dir so big hash joins
    # gracefully go out-of-core instead.
    con.execute(f"SET memory_limit='{os.environ.get('DUCKDB_MEM', _default_duckdb_mem())}'")
    spill = "/tmp/duckdb_oracle_spill"
    os.makedirs(spill, exist_ok=True)
    con.execute(f"SET temp_directory='{spill}'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    spark = get_spark("oracle-check")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if fingerprint:
        print(
            f"fingerprint mode for {sorted(fingerprint)}: each engine "
            "computes COUNT + two order-insensitive 60-bit md5 hash sums "
            "in-engine; only 3 scalars cross the driver (no pair list is "
            "ever collected)"
        )

    failures, passed, rows_only = [], 0, 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        if name in fingerprint:
            if name not in oracles:
                failures.append((name, "fingerprint query has no oracle"))
                print(f"FAIL  {name}: fingerprint query has no oracle")
                continue
            dp = fingerprint[name]
            try:
                sdf = fn(spark, sf_dir)
                scols = sorted(sdf.columns)
                grid_cols = _fp_grid_cols(sdf.schema.fields) if dp is not None else []
                time_cols = _fp_time_cols(sdf.schema.fields)
                s_fp = _fingerprint_spark(sdf, dp=dp)
            except Exception as e:  # noqa: BLE001
                failures.append((name, f"SPARK ERROR: {e}"))
                print(f"FAIL  {name}: spark error: {str(e)[:300]}")
                continue
            # record the engine-side result BEFORE attempting the oracle:
            # at scale points where DuckDB hits a resource wall (r10's
            # n=10M ENOSPC), the Spark fingerprint is the artifact that
            # lets a later/bigger-box oracle run close the loop
            print(
                f"info  {name}: spark fingerprint "
                f"count={s_fp[0]} h1={s_fp[1]} h2={s_fp[2]}"
                + (f" dp={dp}" if dp is not None else ""),
                flush=True,
            )
            try:
                dcols = sorted(
                    r[0] for r in con.execute(
                        f"DESCRIBE ({oracles[name]})"
                    ).fetchall()
                )
                d_fp = _fingerprint_duck(
                    con, oracles[name], sdf.columns, grid_cols=grid_cols,
                    dp=dp, time_cols=time_cols,
                )
            except Exception as e:  # noqa: BLE001
                failures.append((name, f"DUCKDB ERROR: {e}"))
                print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
                continue
            problems = []
            if scols != dcols:
                problems.append(f"cols {scols} != {dcols}")
            if s_fp[0] != d_fp[0]:
                problems.append(f"rows {s_fp[0]} != {d_fp[0]}")
            if s_fp[1:3] != d_fp[1:3]:
                problems.append("fingerprint hash-sum mismatch")
            # Grid-reproducibility guard: a hash match is sound by
            # construction (see _FP_GRID_SLACK), but a value inside slack
            # of a floor boundary on which the engines DISAGREE means the
            # compare could flip on a re-run with different partition sum
            # order — refuse rather than report luck as proof. Bit-equal
            # tiny margins must additionally be ON the dp lattice
            # (integral scaled value to within _FP_LATTICE_ULPS ulps,
            # counted in-engine) before the deterministic annotation is
            # earned (ADVICE r10).
            s_m, d_m = s_fp[3], d_fp[3]
            s_off, d_off = s_fp[4], d_fp[4]
            grid_note = ""
            if dp is not None and (s_m is not None or d_m is not None):
                worst = min(m for m in (s_m, d_m) if m is not None)
                if worst < _FP_GRID_SLACK and s_m != d_m:
                    problems.append(
                        f"grid-unsafe at dp={dp}: boundary margin "
                        f"{worst:.3e} < {_FP_GRID_SLACK} and engines "
                        f"disagree (spark {s_m!r} vs duckdb {d_m!r})"
                    )
                elif worst < _FP_GRID_SLACK and (s_off or d_off):
                    problems.append(
                        f"grid-unsafe at dp={dp}: boundary margin "
                        f"{worst:.3e} bit-equal but {s_off}/{d_off} "
                        "(spark/duckdb) near-boundary values are OFF the "
                        "dp lattice (margin > "
                        f"{_FP_LATTICE_ULPS} ulp of the scaled value) — "
                        "a nondeterministic sum order could flip the "
                        "floor on a re-run"
                    )
                elif worst < _FP_GRID_SLACK:
                    grid_note = (
                        f" dp={dp} margin={worst:.3e} (exact-lattice "
                        "boundary verified on-grid within "
                        f"{_FP_LATTICE_ULPS} ulps, margins bit-equal — "
                        "deterministic)"
                    )
                else:
                    grid_note = f" dp={dp} margin={worst:.3e}"
            if problems:
                failures.append((name, "; ".join(problems)))
                print(f"FAIL  {name}: {'; '.join(problems)}  ({time.time()-t0:.1f}s)")
            else:
                passed += 1
                print(
                    f"ok    {name}: {s_fp[0]} rows fingerprint="
                    f"{s_fp[1] % 2**64:016x}{grid_note}  (in-engine, {time.time()-t0:.1f}s)"
                )
            continue
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
