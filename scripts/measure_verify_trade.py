"""Price the embedding keep-list's verify-stage design points with
MEASURED shuffle traffic, not estimates (VERDICT r13 #4): one arm per
process, each printing a single JSON line with wall seconds, total
shuffle write/read bytes (Spark status REST, all stages of this app),
and the arm's result counts.

Arms:
  float     — the all-float verify twin (_adaptive_cand + exact cosine):
              the r12 shape whose vector re-fetch joins shuffle the full
              float relation. Only run at n ≤ 10M — this is the arm that
              needed ~160 GB at n=100M.
  quant     — the production r14 two-sided int16 verify
              (_quantized_dup_pairs): band join carries int16, integer-
              certain pairs bypass floats, only the ±eps margin re-checks
              on floats via broadcast.
  classify  — survivor classification counts only (definite vs margin),
              the direct evidence for how thin the float margin is.
  bandhist  — full candidate histogram on the quantized-cosine scale
              (r15, VERDICT r14 #4): every DISTINCT candidate pair
              bucketed as definite (≥ hi) / margin ([lo, hi)) /
              borderline (quantized cosine in [0.25, lo) — the
              near-threshold non-dup mass the waste-series decomposition
              attributes the fourth-decade growth to) / random (< 0.25,
              pure band collisions). Counted WITHOUT materializing a
              pair DISTINCT (the n=100M ids-only DISTINCT ENOSPC'd at
              r13): per-band bucket counts minus the both-bands
              correction join — inclusion-exclusion at ADAPT_BANDS=2 —
              so the only shuffles are the two band joins and byte-sized
              count rows. Bucket edges use qdot ≥ c·_Q_NORM_LO² as
              "quantized cosine ≥ c"; exact for the production lo/hi
              thresholds, and for the 0.25 diagnostic edge off by at
              most the norm wobble (±2.5e-4 in cosine) — a measurement
              bucket, not a correctness gate.

Usage:
    python scripts/measure_verify_trade.py DIR {float|quant|classify|bandhist}

Env: SPARK_DRIVER_MEM, SPARK_GRAFT_SHUFFLE as usual.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from restaurant_etl_spark.session import get_spark


def _shuffle_totals(spark) -> dict:
    ui = spark.sparkContext.uiWebUrl
    app = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages?status=complete")
    )
    return {
        "shuffle_write_bytes": sum(s.get("shuffleWriteBytes", 0) for s in stages),
        "shuffle_read_bytes": sum(s.get("shuffleReadBytes", 0) for s in stages),
        "input_bytes": sum(s.get("inputBytes", 0) for s in stages),
        "disk_spill_bytes": sum(s.get("diskBytesSpilled", 0) for s in stages),
        "stages": len(stages),
    }


def main() -> int:
    d, arm = sys.argv[1], sys.argv[2]
    spark = get_spark(f"verify-trade-{arm}", extra_conf={"spark.ui.enabled": "true"})
    from restaurant_etl_spark.operators.similarity import (
        _adaptive_cand,
        _adaptive_stage,
        _band_exprs,  # noqa: F401  (documented entry points)
        _dot,
        _dvec,
        _q_int_threshold,
        _q_int_threshold_hi,
        _quantized_dup_pairs,
    )

    t0 = time.time()
    out: dict = {"dir": d, "arm": arm}
    if arm == "float":
        e, n, width, cand = _adaptive_cand(spark, d)
        dup = cand.filter(
            F.try_divide(_dot(_dvec("va"), _dvec("vb")), F.col("na") * F.col("nb"))
            >= 0.3
        )
        out.update(n=n, band_width=width, dup_pairs=dup.count())
    elif arm == "quant":
        e, n, width, dup = _quantized_dup_pairs(spark, d)
        out.update(n=n, band_width=width, dup_pairs=dup.count())
    elif arm == "classify":
        # the pre stage of _quantized_dup_pairs, counted by verdict —
        # definite (integer-certain dups) vs margin (float re-check)
        from restaurant_etl_spark.operators.similarity import (
            _Q_EXPR,
            _QDOT_EXPR,
            _sig_bands_frame,
        )

        from restaurant_etl_spark.operators.similarity import ADAPT_BANDS

        e, n, width, s = _adaptive_stage(spark, d)
        bq = (
            _sig_bands_frame(s, width, extra_cols=("vec_id", "v", "nrm"))
            .select(
                "vec_id", "v", "nrm",
                F.posexplode(
                    F.array(*[F.col(f"band{k}") for k in range(ADAPT_BANDS)])
                ).alias("band_idx", "band"),
            )
            .withColumn("q", F.expr(_Q_EXPR))
            .select("vec_id", "q", "band_idx", "band")
        )
        a, b = bq.alias("a"), bq.alias("b")
        pre = (
            a.join(
                b,
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band") == F.col("b.band"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
            .withColumn("qdot", F.expr(_QDOT_EXPR))
            .filter(F.col("qdot") >= F.lit(_q_int_threshold(0.3)))
            .select(
                F.col("a.vec_id").alias("id_a"),
                F.col("b.vec_id").alias("id_b"),
                (F.col("qdot") >= F.lit(_q_int_threshold_hi(0.3))).alias("definite"),
            )
            .distinct()
        )
        rows = {r["definite"]: r["c"] for r in
                pre.groupBy("definite").agg(F.count("*").alias("c")).collect()}
        out.update(
            n=n, band_width=width,
            definite_pairs=int(rows.get(True, 0)),
            margin_pairs=int(rows.get(False, 0)),
        )
    elif arm == "bandhist":
        import math

        from restaurant_etl_spark.operators.similarity import (
            ADAPT_BANDS,
            _Q_EXPR,
            _Q_NORM_LO,
            _QDOT_EXPR,
            _sig_bands_frame,
        )

        assert ADAPT_BANDS == 2, "inclusion-exclusion below is written for 2 bands"
        lo, hi = _q_int_threshold(0.3), _q_int_threshold_hi(0.3)
        t25 = int(math.floor(0.25 * _Q_NORM_LO * _Q_NORM_LO))
        bucket = (
            F.when(F.col("qdot") >= F.lit(hi), F.lit("definite"))
            .when(F.col("qdot") >= F.lit(lo), F.lit("margin"))
            .when(F.col("qdot") >= F.lit(t25), F.lit("borderline"))
            .otherwise(F.lit("random"))
        )
        # quantize ONCE per row on the un-exploded (wide) frame; both the
        # per-band and the both-bands join read the same relation
        _e, n, w, s = _adaptive_stage(spark, d)
        wide = (
            _sig_bands_frame(s, w, extra_cols=("vec_id", "v", "nrm"))
            .withColumn("q", F.expr(_Q_EXPR))
            .select("vec_id", "q", "band0", "band1")
        )
        bq = wide.select(
            "vec_id", "q",
            F.posexplode(F.array("band0", "band1")).alias("band_idx", "band"),
        )
        a, b = bq.alias("a"), bq.alias("b")
        per_band = (
            a.join(
                b,
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band") == F.col("b.band"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
            .withColumn("qdot", F.expr(_QDOT_EXPR))
            .select(bucket.alias("bucket"))
            .groupBy("bucket")
            .count()
        )
        wa, wb = wide.alias("a"), wide.alias("b")
        both = (
            wa.join(
                wb,
                (F.col("a.band0") == F.col("b.band0"))
                & (F.col("a.band1") == F.col("b.band1"))
                & (F.col("a.vec_id") < F.col("b.vec_id")),
            )
            .withColumn("qdot", F.expr(_QDOT_EXPR))
            .select(bucket.alias("bucket"))
            .groupBy("bucket")
            .count()
        )
        c1 = {r["bucket"]: r["count"] for r in per_band.collect()}
        c2 = {r["bucket"]: r["count"] for r in both.collect()}
        hist = {k: int(c1.get(k, 0) - c2.get(k, 0))
                for k in ("definite", "margin", "borderline", "random")}
        out.update(
            n=n, band_width=w,
            cand_pairs=sum(hist.values()),
            **{f"{k}_pairs": v for k, v in hist.items()},
            qdot_edges={"t25": t25, "lo": lo, "hi": hi},
        )
    else:
        print(f"unknown arm {arm!r}", file=sys.stderr)
        return 2
    out["wall_sec"] = round(time.time() - t0, 1)
    out.update(_shuffle_totals(spark))
    print("VERIFY_TRADE: " + json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
