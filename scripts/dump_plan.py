"""Dump the executed physical plan of queries for the judge's plan
evidence (plans/<round>/<query>_{before,after}.txt).

Mirrors the r14 methodology: plans are built at sf0.001 with
checkpoint barriers DISABLED (plans.barriers_disabled) so the full
upstream DAG is visible — barrier-mode plans show only the
post-checkpoint fragment and overcount shared subtrees.

Usage: python scripts/dump_plan.py <outdir> <suffix> name [name...]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("PLAN_SF_DIR", "/root/testdata/sf0.001")
    os.makedirs(outdir, exist_ok=True)

    import __spark_entry__ as entrymod
    from conduit_spark import get_spark
    from conduit_spark.plans import barriers_disabled, executed_plan

    spark = get_spark("conduit-spark-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.extended_queries()
    for name in names:
        with barriers_disabled():
            df = queries[name](spark, sf_dir)
            plan = executed_plan(df)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        print(f"{name}: {len(plan.splitlines())} lines, "
              f"{n_ex} Exchange mentions -> {path}")


if __name__ == "__main__":
    main()
