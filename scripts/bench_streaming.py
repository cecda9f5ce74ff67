"""Live-path streaming bench (VERDICT r7 #6): every streaming operator is
benched via its batch twin in bench.py; this sibling measures the LIVE
micro-batch path — per-batch latency and rows/s — so streaming perf
regressions become visible round-over-round.

Workloads (both drain real multi-batch streams with availableNow +
maxFilesPerTrigger, metrics from StreamingQueryProgress — Spark's own
per-trigger accounting, not wall-clock guesswork):

  * ``session_windows_rocksdb`` — watermarked per-user session windows
    (streaming/jobs.py:session_agg) over the staged events source, run
    under the RocksDB state store provider (the 100 TB state backend),
    append mode (closed sessions emitted as the watermark passes).
  * ``cdc_sink_rocksdb`` — the full CDC write path: change files →
    watermarked dropDuplicatesWithinWatermark (real state traffic) →
    foreachBatch MERGE with the exactly-once ledger
    (streaming/cdc.py:cdc_apply_sink), auto-compaction policy live.

Prints ONE JSON line; the driver-style artifact is committed as
STREAMING_BENCH_r{N}.json. Usage:

    python scripts/bench_streaming.py [sf_dir] [prev_artifact]
        [--envelope N]            # fresh-JVM repetitions per small
                                  # workload (default 3); median run is
                                  # the representative, envelope recorded
        [--state-decade BIG_DIR]  # add the 10x state scale point
        [--one WORKLOAD SF TAG]   # internal child mode (one point per
                                  # fresh interpreter/JVM — ADVICE r10)
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from restaurant_etl_spark.session import get_spark
from restaurant_etl_spark.sources.tables import load_table
from restaurant_etl_spark.streaming.cdc import CDC_SCHEMA, cdc_apply_sink, read_target
from restaurant_etl_spark.streaming.jobs import session_agg

ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
SCRATCH = "/tmp/spark_graft_stream_bench"


def _progress_metrics(q) -> dict:
    """Aggregate per-trigger metrics from the query's own progress log.
    Zero-input triggers (the final empty sweep availableNow runs) are
    excluded from latency stats but reported as n_empty.

    Phase split (VERDICT r8 #4): the FIRST non-empty batch pays one-time
    costs a long-lived stream amortizes — RocksDB state-store open, plan
    codegen, first-file listing — and r8's pooled stats let that 3-4×
    outlier sit inside the same min/max as the steady batches. Report it
    as ``warmup`` and the rest as ``steady`` (throughput and latency are
    steady-phase numbers); ``pooled`` keeps the r8-comparable view."""
    rows_all, lat, row_counts = 0, [], []
    empty = 0
    for p in q.recentProgress:
        n = p.get("numInputRows", 0)
        d = (p.get("durationMs") or {}).get("triggerExecution")
        if n and d is not None:
            rows_all += n
            lat.append(d)
            row_counts.append(n)
        elif d is not None:
            empty += 1

    def _stats(ls, rs):
        total_s = sum(ls) / 1000.0
        return {
            "batches": len(ls),
            "rows": sum(rs),
            "rows_per_sec": round(sum(rs) / total_s, 1) if total_s else None,
            "batch_ms": {
                "min": min(ls) if ls else None,
                "median": round(statistics.median(ls), 1) if ls else None,
                "max": max(ls) if ls else None,
            },
        }

    return {
        "batches": len(lat),
        "empty_triggers": empty,
        "rows": rows_all,
        "warmup": {"batch_ms": lat[0] if lat else None,
                   "rows": row_counts[0] if row_counts else None},
        "steady": _stats(lat[1:], row_counts[1:]),
        "pooled": _stats(lat, row_counts),
    }


def _state_metrics(q) -> dict:
    """State-store footprint from the LAST progress carrying state
    operators (VERDICT r9 #5): total state rows, in-memory usage and the
    RocksDB-specific on-disk/SST + block-cache numbers Spark publishes
    via customMetrics — the axis that actually hurts at 100 TB."""
    for p in reversed(q.recentProgress):
        ops = p.get("stateOperators") or []
        if ops:
            o = ops[0]
            cm = o.get("customMetrics") or {}
            keep = {
                k: v for k, v in cm.items()
                if "SstFileSize" in k or "MemoryUsage" in k
                or "ZipFileBytes" in k or "CommitLatency" in k
            }
            return {
                "state_rows": o.get("numRowsTotal"),
                "state_rows_updated": o.get("numRowsUpdated"),
                "state_memory_bytes": o.get("memoryUsedBytes"),
                "rocksdb": keep,
            }
    return {}


def _latency_quarters(q) -> list:
    """Median steady batch latency per quarter of the run — state grows
    monotonically across an availableNow drain, so a rising series IS
    per-batch latency vs state growth."""
    lat = [
        (p.get("durationMs") or {}).get("triggerExecution")
        for p in q.recentProgress
        if p.get("numInputRows", 0)
    ]
    lat = [x for x in lat[1:] if x is not None]  # drop warmup
    if len(lat) < 4:
        return lat
    k = len(lat) // 4
    return [
        round(statistics.median(lat[i * k:(i + 1) * k if i < 3 else len(lat)]), 1)
        for i in range(4)
    ]


def bench_session_windows(spark, sf_dir: str, n_files: int = 16,
                          files_per_trigger: int = 2, tag: str = "") -> dict:
    src = os.path.join(SCRATCH, f"events_src{tag}")
    ckpt = os.path.join(SCRATCH, f"events_ckpt{tag}")
    # stage events as n_files -> n_files/files_per_trigger micro-batches
    ev = load_table(spark, sf_dir, "events")
    ev.repartition(n_files).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(src)
    )
    out = session_agg(stream)
    q = (
        out.writeStream.format("noop")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(3600):
        q.stop()
        raise TimeoutError("session-window drain did not finish")
    m = _progress_metrics(q)
    m["state"] = _state_metrics(q)
    m["steady_batch_ms_by_quarter"] = _latency_quarters(q)
    return m


def bench_cdc_sink(spark, sf_dir: str, n_batches: int = 10, tag: str = "") -> dict:
    src = os.path.join(SCRATCH, f"cdc_src{tag}")
    tgt = os.path.join(SCRATCH, f"cdc_tgt{tag}")
    ckpt = os.path.join(SCRATCH, f"cdc_ckpt{tag}")
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    # batch 0 bulk-inserts every order; later batches update/increment/delete
    # rotating key slices — each merge rewrites the target through the
    # hash shuffle, the production fragmentation pattern auto-compaction
    # (every 8 batches) repairs mid-stream
    base = orders.select(
        F.lit("insert").alias("op"),
        F.col("o_orderkey").alias("m_key"),
        F.col("o_orderstatus").alias("new_status"),
        F.col("o_totalprice").alias("new_price"),
        (F.col("o_orderkey") * 100).alias("change_id"),
        F.lit(t0).alias("ts"),
    )
    base.coalesce(1).write.mode("overwrite").parquet(src)
    for b in range(1, n_batches):
        delta = (
            orders.filter(F.col("o_orderkey") % n_batches == b)
            .select(
                F.when(F.col("o_orderkey") % 17 == 0, "delete")
                .when(F.col("o_orderkey") % 3 == 0, "increment")
                .otherwise("update")
                .alias("op"),
                F.col("o_orderkey").alias("m_key"),
                F.lit(f"U{b}").alias("new_status"),
                (F.col("o_totalprice") % 1000).alias("new_price"),
                (F.col("o_orderkey") * 100 + b).alias("change_id"),
                F.lit(t0 + dt.timedelta(minutes=b)).alias("ts"),
            )
        )
        delta.coalesce(1).write.mode("append").parquet(src)

    schema = CDC_SCHEMA + ", change_id bigint, ts timestamp"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["change_id"])
        .select("op", "m_key", "new_status", "new_price")
    )
    q = cdc_apply_sink(stream, tgt, ckpt, compact_every=8)
    if not q.awaitTermination(3600):
        q.stop()
        raise TimeoutError("CDC drain did not finish")
    m = _progress_metrics(q)
    m["state"] = _state_metrics(q)
    m["steady_batch_ms_by_quarter"] = _latency_quarters(q)
    m["target_rows"] = read_target(spark, tgt).count()
    return m


def _newest_prev_artifact() -> str:
    """Newest committed STREAMING_BENCH_r*.json (ADVICE r9: the default
    was hardcoded to the r08 artifact, so every later round's vs_prev
    silently compared against a stale baseline unless the caller
    remembered the positional override — which stays authoritative)."""
    import re

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cands = []
    for f in os.listdir(here):
        m = re.fullmatch(r"STREAMING_BENCH_r(\d+)\.json", f)
        if m:
            cands.append((int(m.group(1)), os.path.join(here, f)))
    return max(cands)[1] if cands else os.path.join(here, "STREAMING_BENCH_r08.json")


def _delta_vs_prev(workloads: dict, prev_path: str) -> dict | None:
    """Round-over-round comparison against a committed prior artifact
    (VERDICT r8 #4). Prior rounds pooled warm-up with steady batches, so
    the comparable series is THIS round's pooled stats; once two phase-
    split artifacts exist the steady phases compare directly."""
    try:
        with open(prev_path) as fh:
            prev = json.load(fh)["workloads"]
    except (OSError, ValueError, KeyError):
        return None
    out = {}
    for wl, now in workloads.items():
        p = prev.get(wl)
        if not p:
            continue
        now_cmp = now.get("pooled", now)
        p_cmp = p.get("pooled", p)  # r8 artifacts ARE pooled at top level
        n_rps, p_rps = now_cmp.get("rows_per_sec"), p_cmp.get("rows_per_sec")
        n_med = (now_cmp.get("batch_ms") or {}).get("median")
        p_med = (p_cmp.get("batch_ms") or {}).get("median")
        out[wl] = {
            "prev_rows_per_sec": p_rps,
            "rows_per_sec": n_rps,
            "throughput_ratio": round(n_rps / p_rps, 3) if n_rps and p_rps else None,
            "prev_median_batch_ms": p_med,
            "median_batch_ms": n_med,
            # whether the PRIOR artifact carried its own fresh-JVM
            # envelope — pre-r11 warm-JVM single-run artifacts don't, and
            # out-of-envelope deltas against them are a methodology
            # change, not confirmed drift (ADVICE r11)
            "prev_fresh_jvm": bool(p.get("envelope")),
        }
    return out or None


def _ratio(a, b):
    return round(b / a, 2) if a and b else None


#: marker line prefix for the child-process protocol (_run_point)
_CHILD_MARK = "BENCH_STREAMING_ONE:"


def _run_one(workload: str, sf_dir: str, tag: str) -> int:
    """Child mode: run ONE workload in THIS process (its own fresh JVM —
    ADVICE r10: the state-decade big point previously ran in the same
    warm JVM/Spark session as the small point, contrary to the repo's
    fresh-JVM-per-scale-point methodology; warm codegen/classes could
    flatter the big point's latency ratio). Emits the metrics dict on a
    marked line for the parent to parse."""
    spark = get_spark(f"bench_streaming_{workload}{tag}")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
    # Spark retains only the last 100 progress updates by default, and
    # _progress_metrics sums recentProgress — a drain longer than the
    # retention silently truncates the totals (the x100 point's 800
    # batches hit this at a fixed 2000 in r12). Derive the retention from
    # the workload's expected batch count plus slack (ADVICE r12) so any
    # future decade is covered by construction, not by a magic number.
    if workload.startswith("session"):
        n_files = int(workload.split(":", 1)[1]) if ":" in workload else (
            160 if workload.startswith("session_big") else 16
        )
        expected_batches = -(-n_files // 2)  # files_per_trigger=2
    else:
        expected_batches = 10  # bench_cdc_sink n_batches default
    retention = max(200, 2 * expected_batches + 50)
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates", str(retention)
    )
    if workload == "session":
        m = bench_session_windows(spark, sf_dir, tag=tag)
    elif workload.startswith("session_big"):
        # session_big -> 160 files (x10 decade); session_big:N -> N files
        # (x100 decade uses 1600: scale the FILE count with the data so
        # rows-per-batch stay equal and latency growth isolates state
        # size — VERDICT r11 #4)
        m = bench_session_windows(
            spark, sf_dir, n_files=n_files, files_per_trigger=2, tag=tag
        )
    elif workload == "cdc":
        m = bench_cdc_sink(spark, sf_dir, tag=tag)
    else:
        raise SystemExit(f"unknown --one workload {workload!r}")
    # belt-and-suspenders: the drain must have reported at least the
    # expected batch count — fewer means the retention window truncated
    # the progress log and the totals below it are fiction
    reported = m.get("batches", 0) + m.get("empty_triggers", 0)
    if "batches" in m and reported < expected_batches:
        raise SystemExit(
            f"progress log truncated: {reported} triggers reported "
            f"< {expected_batches} expected (retention={retention})"
        )
    print(_CHILD_MARK + json.dumps(m))
    return 0


def _run_point(workload: str, sf_dir: str, tag: str) -> dict:
    """Run one workload point in a FRESH interpreter/JVM."""
    import subprocess

    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__),
         "--one", workload, sf_dir, tag],
        capture_output=True, text=True, timeout=3900,
    )
    for line in reversed(proc.stdout.splitlines()):
        if line.startswith(_CHILD_MARK):
            return json.loads(line[len(_CHILD_MARK):])
    raise RuntimeError(
        f"child {workload}{tag} emitted no metrics (rc={proc.returncode}):\n"
        f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )


def _envelope(workload: str, sf_dir: str, n: int) -> dict:
    """n fresh-JVM repetitions of one workload (VERDICT r10 #8: the CDC
    sink's -8.7% round-over-round throughput drift had no classification
    — a single reading cannot distinguish drift from run variance).
    Returns the median-throughput run as the representative plus the
    envelope of steady rows/s across repetitions."""
    runs = [_run_point(workload, sf_dir, f"_{workload}_e{i}") for i in range(n)]
    # ADVICE r12: pick the representative from runs with real readings
    # only — coercing a failed run's None throughput to 0 for the sort
    # could make the median-index pick a degenerate run whose None stats
    # then propagate into the state-decade ratios
    live = [m for m in runs if m["steady"]["rows_per_sec"] is not None]
    if len(live) * 2 < len(runs) or not live:
        raise RuntimeError(
            f"{workload}: only {len(live)}/{len(runs)} repetitions produced "
            "steady readings — envelope unusable"
        )
    keyed = sorted(live, key=lambda m: m["steady"]["rows_per_sec"])
    rep = keyed[len(keyed) // 2]
    # ADVICE r11: drop None readings instead of coercing to 0 — one
    # failed/empty repetition would otherwise drive the envelope's lower
    # bound to 0 and _classify_vs_prev could never emit confirmed_faster
    pooled = sorted(
        r["pooled"]["rows_per_sec"]
        for r in runs
        if r["pooled"]["rows_per_sec"] is not None
    )
    rep["envelope"] = {
        "n_runs": n,
        "complete": len(pooled) == n,
        "steady_rows_per_sec": [r["steady"]["rows_per_sec"] for r in keyed],
        "pooled_rows_per_sec": pooled,
        "steady_median_batch_ms": sorted(
            r["steady"]["batch_ms"]["median"]
            for r in runs
            if r["steady"]["batch_ms"]["median"] is not None
        ),
    }
    return rep


def _classify_vs_prev(vs_prev: dict | None, workloads: dict) -> None:
    """Attach an envelope-based classification to each vs_prev delta:
    the prior round's pooled throughput falling INSIDE this round's
    fresh-JVM pooled envelope is run variance; outside it is a confirmed
    delta needing a bisect (the bench.py envelope discipline, applied to
    the streaming artifact — VERDICT r10 #8)."""
    if not vs_prev:
        return
    for wl, delta in vs_prev.items():
        env = (workloads.get(wl) or {}).get("envelope")
        p_rps = delta.get("prev_rows_per_sec")
        if not env or p_rps is None or not env.get("pooled_rows_per_sec"):
            delta["classification"] = "no_envelope"
            continue
        if not env.get("complete", True):
            # ADVICE r11: a repetition lacked a pooled throughput — the
            # envelope is partial, so don't confirm anything from it
            delta["classification"] = "no_envelope"
            continue
        lo, hi = env["pooled_rows_per_sec"][0], env["pooled_rows_per_sec"][-1]
        if lo <= p_rps <= hi:
            delta["classification"] = "run_variance"
        elif not delta.get("prev_fresh_jvm", True):
            # ADVICE r11: the prior artifact is a warm-JVM single-run
            # reading (no envelope of its own) — an out-of-envelope delta
            # on that transition conflates the fresh-JVM methodology
            # change with true drift, so don't call it confirmed
            delta["classification"] = "methodology_change"
        else:
            delta["classification"] = (
                "confirmed_faster" if p_rps < lo else "confirmed_slower"
            )
        delta["envelope_pooled_rows_per_sec"] = [lo, hi]


#: vs_prev workload keys -> child --one workload names
_WL_CHILD = {"session_windows_rocksdb": "session", "cdc_sink_rocksdb": "cdc"}


def _tag_baseline(vs_prev: dict | None, sf_dir: str) -> dict | None:
    """Same-boot tag-matched baseline (VERDICT r12 #6): for every vs_prev
    delta classified confirmed_*, re-run that workload ONCE in a fresh JVM
    at the previous artifact's commit (throwaway git worktree) and record
    the reading in the artifact itself. If the tag reading falls inside
    THIS round's pooled envelope, the code never moved — the cross-round
    delta is the box (reclassified ``environment``); outside it, the delta
    survives same-boot replay (``code_change``). Advisory: any failure is
    recorded, never raised."""
    if not vs_prev:
        return None
    flagged = [
        wl for wl, d in vs_prev.items()
        if str(d.get("classification", "")).startswith("confirmed")
        and wl in _WL_CHILD
    ]
    if not flagged:
        return None
    env_rev = os.environ.get("SPARK_GRAFT_TAG_BASELINE", "auto")
    if env_rev in ("off", "0", "none", ""):
        return None
    import re
    import subprocess
    import tempfile

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if env_rev != "auto":
        rev = env_rev
    else:
        # ADVICE r13: the newest artifact may be this round's UNCOMMITTED
        # one (git log empty) — walk candidates newest-first and take the
        # first with a commit instead of silently no-op'ing the baseline.
        rev = ""
        arts = sorted(
            (f for f in os.listdir(here)
             if re.fullmatch(r"STREAMING_BENCH_r(\d+)\.json", f)),
            key=lambda f: int(re.findall(r"\d+", f)[0]),
            reverse=True,
        )
        for art in arts:
            rev = subprocess.run(
                ["git", "log", "-1", "--format=%H", "--", art],
                cwd=here, capture_output=True, text=True,
            ).stdout.strip()
            if rev:
                break
    if not rev:
        # record the failure in the artifact instead of a silent None
        return {"error": "rev unresolved: no committed STREAMING_BENCH_r*.json "
                         "(or git log unavailable)"}
    out: dict = {"rev": rev[:12], "workloads": {}}
    wt = tempfile.mkdtemp(prefix="stream_tag_")
    try:
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, rev],
            cwd=here, capture_output=True, text=True, check=True,
        )
        for wl in flagged:
            child_wl = _WL_CHILD[wl]
            try:
                proc = subprocess.run(
                    [sys.executable,
                     os.path.join(wt, "scripts", "bench_streaming.py"),
                     "--one", child_wl, sf_dir, f"_tag_{child_wl}"],
                    cwd=wt, capture_output=True, text=True, timeout=3900,
                )
                m = None
                for line in reversed(proc.stdout.splitlines()):
                    if line.startswith(_CHILD_MARK):
                        m = json.loads(line[len(_CHILD_MARK):])
                        break
                if m is None:
                    out["workloads"][wl] = {
                        "error": f"no metrics (rc={proc.returncode})"}
                    continue
                tag_rps = (m.get("pooled") or {}).get("rows_per_sec")
                rec: dict = {"pooled_rows_per_sec": tag_rps}
                env = vs_prev[wl].get("envelope_pooled_rows_per_sec")
                if tag_rps is not None and env:
                    lo, hi = env
                    rec["classification"] = (
                        "environment" if lo <= tag_rps <= hi else "code_change"
                    )
                    vs_prev[wl]["tag_classification"] = rec["classification"]
                out["workloads"][wl] = rec
            except Exception as exc:  # noqa: BLE001 — advisory
                out["workloads"][wl] = {
                    "error": f"{type(exc).__name__}: {str(exc)[:200]}"}
    except Exception as exc:  # noqa: BLE001 — advisory
        out["error"] = f"{type(exc).__name__}: {str(exc)[:200]}"
    finally:
        import shutil

        subprocess.run(["git", "worktree", "remove", "--force", wt],
                       cwd=here, capture_output=True, text=True)
        shutil.rmtree(wt, ignore_errors=True)
    return out


def main() -> int:
    argv = list(sys.argv[1:])
    if argv[:1] == ["--one"]:
        return _run_one(argv[1], argv[2], argv[3])
    decade_big = None
    if "--state-decade" in argv:
        # VERDICT r9 #5: the stream path gets its own scale decade. The big
        # point carries ×10 rows AND ×10 key cardinality (make_sfN key
        # offsets give every copy a disjoint user/order key range — state
        # size is the axis that hurts). For the session workload the big
        # point stages 10× the FILES at the same files-per-trigger, so
        # rows-per-batch stay equal and any latency growth isolates the
        # STATE-SIZE effect (10× more batches, state rows growing to 10×)
        # instead of conflating it with batch volume. Every point runs in
        # a FRESH interpreter/JVM (ADVICE r10).
        i = argv.index("--state-decade")
        decade_big = argv[i + 1] if i + 1 < len(argv) else "/tmp/spark_graft_sf1"
        argv = argv[:i] + argv[i + 2:]
    n_env = 3
    if "--envelope" in argv:
        i = argv.index("--envelope")
        n_env = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    prev = argv[1] if len(argv) > 1 else _newest_prev_artifact()
    shutil.rmtree(SCRATCH, ignore_errors=True)
    workloads = {
        "session_windows_rocksdb": _envelope("session", sf_dir, n_env),
        "cdc_sink_rocksdb": _envelope("cdc", sf_dir, n_env),
    }
    state_decade = None
    if decade_big:
        # comma-separated dirs = successive x10 decades vs the small
        # point (x10, x100, ...); the session file count scales with the
        # data so rows-per-batch stay equal at every decade
        decade_dirs = [d for d in decade_big.split(",") if d]
        small_session, small_cdc = (
            workloads["session_windows_rocksdb"], workloads["cdc_sink_rocksdb"]
        )

        def _pair(small, big, note):
            return {
                "small": small, "big": big, "axis": note,
                "ratios": {
                    "rows": _ratio(small["rows"], big["rows"]),
                    "state_rows": _ratio(
                        (small.get("state") or {}).get("state_rows"),
                        (big.get("state") or {}).get("state_rows")),
                    "steady_median_batch_ms": _ratio(
                        small["steady"]["batch_ms"]["median"],
                        big["steady"]["batch_ms"]["median"]),
                    "steady_rows_per_sec": _ratio(
                        small["steady"]["rows_per_sec"],
                        big["steady"]["rows_per_sec"]),
                    "state_memory_bytes": _ratio(
                        (small.get("state") or {}).get("state_memory_bytes"),
                        (big.get("state") or {}).get("state_memory_bytes")),
                },
            }

        state_decade = {}
        for i, d in enumerate(decade_dirs):
            scale = 10 ** (i + 1)
            n_files = 16 * scale
            big_session = _run_point(
                f"session_big:{n_files}", d, f"_big_x{scale}"
            )
            big_cdc = _run_point("cdc", d, f"_cdc_big_x{scale}")
            point = {
                "big_dir": d,
                "session_windows": _pair(
                    small_session, big_session,
                    f"equal rows-per-batch ({n_files} files @ 2/trigger), "
                    f"{scale}x batches, {scale}x key cardinality -> "
                    "latency ratio isolates state size"),
                "cdc_sink": _pair(
                    small_cdc, big_cdc,
                    f"same 10-batch shape on {scale}x rows and {scale}x "
                    "merge keys"),
            }
            if i == 0:
                # keep the r11 artifact shape for the x10 point so
                # round-over-round diffs stay mechanical
                state_decade.update(point)
            else:
                state_decade[f"x{scale}"] = point
    vs_prev = _delta_vs_prev(workloads, prev)
    _classify_vs_prev(vs_prev, workloads)
    tag_baseline = _tag_baseline(vs_prev, sf_dir)
    result = {
        "metric": "streaming_bench",
        "state_store": "rocksdb",
        "methodology": "every point in a fresh interpreter/JVM (ADVICE "
                       "r10); small workloads = median of an n-run "
                       "envelope; vs_prev classified against the pooled "
                       "envelope",
        "phases": "warmup = first non-empty batch (state-store open + codegen); "
                  "steady = the rest; pooled = r8-comparable view",
        "workloads": workloads,
        "state_decade": state_decade,
        "vs_prev": vs_prev,
        "tag_baseline": tag_baseline,
        "prev_artifact": os.path.basename(prev),
        "sf_dir": sf_dir,
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
