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

Usage:
    python scripts/measure_verify_trade.py DIR {float|quant|classify}

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

        e, n, width, s = _adaptive_stage(spark, d)
        bq = (
            _sig_bands_frame(s, width, extra_cols=("vec_id", "v", "nrm"))
            .select(
                "vec_id", "v", "nrm",
                F.posexplode(
                    F.array(*[F.col(f"band{k}") for k in range(2)])
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
    else:
        print(f"unknown arm {arm!r}", file=sys.stderr)
        return 2
    out["wall_sec"] = round(time.time() - t0, 1)
    out.update(_shuffle_totals(spark))
    print("VERIFY_TRADE: " + json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
