"""Physical-plan audit: the scale-smell report behind `cli plan`.

The engine's 100 TB posture is enforced twice: statically by
tests/test_plan_shapes.py, and operationally by
``python -m conduit_spark plan <query>`` which prints the executed
plan plus the audit below — the checklist a reviewer walks before
promoting a query to a big cluster:

- **global window** — ``Window`` without partition columns funnels the
  whole relation through one task (the round-2 q15 regression class);
- **cartesian** — ``CartesianProduct`` is quadratic;
- **single-partition exchange** — ``Exchange SinglePartition`` outside
  a scalar aggregate/limit collapses parallelism;
- plus the facts you want visible: shuffle count, join strategies,
  filters pushed to the scan, whole-stage-codegen span count.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

SMELL_GLOBAL_WINDOW = "global-window"
SMELL_CARTESIAN = "cartesian-product"
SMELL_SINGLE_PARTITION = "single-partition-exchange"


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def audit_plan(df: DataFrame) -> dict:
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
    if "windowspecdefinition(specifiedwindowframe" in plan:
        smells.append(SMELL_GLOBAL_WINDOW)
    if "CartesianProduct" in plan:
        smells.append(SMELL_CARTESIAN)
    single = plan.count("Exchange SinglePartition")
    # a final top-k/scalar agg legitimately collapses; more than one is
    # a mid-plan funnel
    if single > 1:
        smells.append(SMELL_SINGLE_PARTITION)
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "joins": joins,
        "pushed_filters": [p for p in pushed if p.strip()],
        "codegen_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))),
        "single_partition_exchanges": single,
        "smells": smells,
    }
