"""Benchmark harness: runs the engine's headline queries and prints one
JSON line ``{"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": sf}``.

Env: ``SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1),
``SPARK_GRAFT_CPUS`` (default 32), ``BENCH_QUERIES`` (comma list to
subset), ``BENCH_RUNS`` (per-query repetitions, default 1; reported
value is the min).

Each query executes fully on the cluster via the ``noop`` sink (no
driver-side collect), so timings measure scan+shuffle+compute, not
result transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("BENCH_RUNS", "1"))

    from conduit_spark import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("conduit-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # JVM/codegen warmup so the alphabetically-first query doesn't
    # absorb ~5s of one-time session cost
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1).collect()

    # extended = gate + beyond-cap relational; bench times everything
    all_queries = entrymod.extended_queries()
    subset = os.environ.get("BENCH_QUERIES")
    names = (
        [n for n in subset.split(",") if n in all_queries]
        if subset
        else sorted(all_queries)
    )

    timings: dict[str, float] = {}
    for name in names:
        best = None
        for _ in range(runs):
            t0 = time.monotonic()
            df = all_queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 4)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "conduit_spark_query_suite_total",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
