"""Dump `.explain("formatted")` for every headline bench query into
plans/r16/<query>_<suffix>.txt — the optimization round's before/after
plan evidence (OPTIMIZATION_r16.md references these files).

Usage: python scripts/dump_plans_r16.py <suffix> [sf_dir] [query ...]

  suffix   "before" or "after" (or any label)
  sf_dir   defaults to /root/testdata/sf0.1
  query    optional subset; defaults to the full bench HEADLINE list
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from restaurant_etl_spark.operators.registry import load_all  # noqa: E402
from restaurant_etl_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    import bench

    names = sys.argv[3:] or bench.HEADLINE
    out_dir = os.path.join(REPO, "plans", "r16")
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("plan-dump-r16")
    specs = load_all()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        spec = specs.get(name)
        if spec is None:
            print(f"skip {name}: not registered", file=sys.stderr)
            continue
        df = spec.fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain(formatted), {sf_dir}, "
                    f"Spark {spark.version}\n\n")
            f.write(plan.rstrip() + "\n")
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
