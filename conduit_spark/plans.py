"""Physical-plan audit: the scale-smell report behind ``cli plan``
and the fleet-wide ``cli audit``.

The engine's 100 TB posture is enforced twice: statically by
tests/test_plan_shapes.py, and operationally by
``python -m conduit_spark plan <query>`` / ``audit`` which print the
executed plan plus the audit below — the checklist a reviewer walks
before promoting a query to a big cluster:

- **global window** — ``Window`` without partition columns funnels the
  whole relation through one task (the round-2 q15 regression class);
  both renderings are caught: frame-only specs AND order-only specs
  (partition columns render bare; order columns carry ASC/DESC).
- **cartesian** — ``CartesianProduct`` is quadratic;
- **single-partition exchange** — ``Exchange SinglePartition`` whose
  child is NOT a scalar partial aggregate collapses parallelism on
  real data. The scalar-agg idiom (final agg above, ``keys=[]``
  partial below) is benign — every ``df.agg(count)`` has one — and is
  not counted.

Known-and-documented funnels are declared in :data:`WAIVED` with the
reason; they are reported under ``waived`` instead of ``smells`` so
the audit exit code stays meaningful as a CI gate.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

SMELL_GLOBAL_WINDOW = "global-window"
SMELL_CARTESIAN = "cartesian-product"
SMELL_SINGLE_PARTITION = "single-partition-exchange"

# query name -> {smell: reason}. A waiver is a reviewed, documented
# exception — the audit still reports it, just not as a failure.
WAIVED: dict[str, dict[str, str]] = {
    "c_pack_blocks": {
        SMELL_SINGLE_PARTITION: (
            "two-phase prefix sum: the one funnel reads the "
            "4096x-reduced bucket relation, not the corpus"
        ),
        SMELL_GLOBAL_WINDOW: (
            "the global running sum runs over the bucket relation "
            "(n_docs/4096 rows) — the fix for this smell, not the smell"
        ),
    },
}


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _global_windows(plan: str) -> bool:
    if "windowspecdefinition(specifiedwindowframe" in plan:
        return True
    for m in re.finditer(
        r"windowspecdefinition\(([^)]*?)specifiedwindowframe", plan
    ):
        args = [a.strip() for a in m.group(1).split(",") if a.strip()]
        if args and all((" ASC" in a) or (" DESC" in a) for a in args):
            return True
    return False


def _hot_single_partition_exchanges(plan: str) -> int:
    """Single-partition exchanges whose child is not a scalar partial
    aggregate (``keys=[]``) — the ones that funnel real data."""
    hot = 0
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        child = lines[i + 1] if i + 1 < len(lines) else ""
        if re.search(r"(Hash|Sort)Aggregate\(keys=\[\]", child):
            continue  # scalar-agg idiom
        hot += 1
    return hot


def audit_plan(df: DataFrame, query: str | None = None) -> dict:
    plan = executed_plan(df)
    joins = sorted(
        set(
            re.findall(
                r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
                r"BroadcastNestedLoopJoin|CartesianProduct)\b",
                plan,
            )
        )
    )
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    smells = []
    if _global_windows(plan):
        smells.append(SMELL_GLOBAL_WINDOW)
    if "CartesianProduct" in plan:
        smells.append(SMELL_CARTESIAN)
    hot_single = _hot_single_partition_exchanges(plan)
    if hot_single:
        smells.append(SMELL_SINGLE_PARTITION)
    waivers = WAIVED.get(query or "", {})
    waived = {s: waivers[s] for s in smells if s in waivers}
    smells = [s for s in smells if s not in waivers]
    out = {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "joins": joins,
        "pushed_filters": [p for p in pushed if p.strip()],
        "codegen_spans": len(
            set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
        ),
        "single_partition_exchanges": hot_single,
        "smells": smells,
    }
    if waived:
        out["waived"] = waived
    return out
