"""sf1 scale probe (VERDICT r9 item 2): build a full 10x dataset from
sf0.1 and measure per-query sf0.1 -> sf1 wall-time ratios across the
ENTIRE analytics suite, proving the 100 TB posture empirically instead
of by docstring.

Dataset construction (``/tmp/conduit_sf1``): every fact table is
replicated ``COPIES``x with CONSISTENT key shifts — copy *i* of
``orders`` references copy *i* of ``customer`` (o_custkey and
c_custkey shift by the same ``i*SHIFT``), lineitem's order/part/supp
FKs shift with their parents, events shift user_id so the user
population grows 10x with identical per-user behavior. ``region`` and
``nation`` stay fixed (TPC-H semantics: dimension tables are
SF-invariant). Replication makes a HARDER-than-organic corpus for
dedup/similarity (every text/vector has exactly 10 copies — maximal
candidate-pair pressure on the LSH/banding caps) while keeping join
fan-outs exactly 10x.

Exclusions (printed, not silent): the ``g_*`` connector-transport and
``p_*`` processor-semantics queries run on bounded fixtures
(SNAP_N/SECURE_N objects, 8000-row CDC scripts) by design — their
cost is protocol work, not table scans, so an sf ratio is
meaningless for them.

Usage:
  python scripts/sf1_probe.py [names...]      # default: full suite
Env: SF_SMALL (default /root/testdata/sf0.1), SF1_DIR
(default /tmp/conduit_sf1), SF1_RUNS (default 1).

Prints one line per query (small sec, sf1 sec, ratio, sf1 rows) and a
final PERF.md-ready markdown table sorted by ratio descending.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

SF_SMALL = os.environ.get("SF_SMALL", "/root/testdata/sf0.1")
SF1_DIR = os.environ.get("SF1_DIR", "/tmp/conduit_sf1")
COPIES = 10
SHIFT = 10_000_000

# fact table -> key columns that shift per copy (FKs shift with the
# PKs they reference, so referential integrity holds per copy)
REPLICATE = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
VERBATIM = ["region", "nation"]

SKIP_PREFIXES = ("g_", "p_")


def _complete(out: str) -> bool:
    # a bare exists() would accept a partially-written table from an
    # interrupted prior build and silently understate every ratio;
    # Spark writes _SUCCESS last, so that is the completion marker
    return os.path.exists(os.path.join(out, "_SUCCESS"))


def build_sf1(spark) -> None:
    os.makedirs(SF1_DIR, exist_ok=True)
    for table in VERBATIM:
        out = os.path.join(SF1_DIR, f"{table}.parquet")
        if not _complete(out):
            spark.read.parquet(
                os.path.join(SF_SMALL, f"{table}.parquet")
            ).write.mode("overwrite").parquet(out)
    for table, keys in REPLICATE.items():
        out = os.path.join(SF1_DIR, f"{table}.parquet")
        if _complete(out):
            continue
        base = spark.read.parquet(os.path.join(SF_SMALL, f"{table}.parquet"))
        parts = []
        for i in range(COPIES):
            p = base
            for k in keys:
                p = p.withColumn(k, F.col(k) + F.lit(i * SHIFT))
            parts.append(p)
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big.write.mode("overwrite").parquet(out)
        print(f"built {table} x{COPIES}", flush=True)


def main() -> None:
    from conduit_spark import get_spark

    import __spark_entry__ as entrymod

    runs = int(os.environ.get("SF1_RUNS", "1"))
    queries = entrymod.extended_queries()
    # validate CLI names BEFORE the expensive sf1 build — a typo should
    # fail in milliseconds, not after minutes of dataset replication
    unknown = [n for n in sys.argv[1:] if n not in queries]
    if unknown:
        sys.exit(f"unknown query name(s): {', '.join(unknown)} "
                 f"(see extended_queries() for the registry)")

    spark = get_spark("sf1-probe")
    spark.sparkContext.setLogLevel("ERROR")
    build_sf1(spark)

    names = sys.argv[1:] or sorted(
        n for n in queries if not n.startswith(SKIP_PREFIXES)
    )
    skipped = sorted(n for n in queries if n.startswith(SKIP_PREFIXES))
    print(f"probing {len(names)} queries; skipping {len(skipped)} "
          f"fixture-bounded ({', '.join(skipped[:6])}, ...)", flush=True)

    # codegen/worker-pool warmup (same rationale as bench.py)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def timed(fn, sf_dir: str) -> float:
        best = None
        for _ in range(runs):
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        return best

    rows = []
    print(f"{'query':26} {'sf0.1':>8} {'sf1':>8} {'ratio':>6}", flush=True)
    for name in names:
        fn = queries[name]
        try:
            small = timed(fn, SF_SMALL)
            big = timed(fn, SF1_DIR)
        except Exception as e:  # keep probing; report at the end
            print(f"{name:26} ERROR {type(e).__name__}: {e}", flush=True)
            rows.append((name, None, None, None))
            continue
        ratio = big / small if small > 0 else float("inf")
        if ratio > 12:
            # a 10x-data query reading >12x slower is either genuinely
            # super-linear or absorbed one-time costs (first scan of a
            # table, codegen) — confirm before reporting an alarm
            small = min(small, timed(fn, SF_SMALL))
            big = min(big, timed(fn, SF1_DIR))
            ratio = big / small if small > 0 else float("inf")
        rows.append((name, small, big, ratio))
        print(f"{name:26} {small:8.2f} {big:8.2f} {ratio:6.2f}", flush=True)

    ok = [r for r in rows if r[3] is not None]
    print("\n## sf0.1 -> sf1 (10x) scaling ratios — PERF.md paste\n")
    print("| query | sf0.1 s | sf1 s | ratio |")
    print("|---|---|---|---|")
    for name, small, big, ratio in sorted(
        ok, key=lambda r: -r[3]
    ):
        print(f"| `{name}` | {small:.2f} | {big:.2f} | {ratio:.2f}x |")
    errs = [r[0] for r in rows if r[3] is None]
    if errs:
        print("errors:", ", ".join(errs))


if __name__ == "__main__":
    main()
