"""Write ``explain("formatted")`` for named registry queries to
``plans/<round>/<name>_<suffix>.txt`` — the round's plan-evidence
files (round from $SPARK_GRAFT_ROUND, default r12).

Run: ``python tools/capture_plans.py <suffix> name[,name...]``

Uses the same session shape as bench.py so plan choices (AQE,
shuffle partitions) match what the bench measures. sf dir from
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_session  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    rnd = os.environ.get("SPARK_GRAFT_ROUND", "r12")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session(cpus)
    from x_spark.plans.registry import QUERIES

    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
