"""Analytics surface: relational queries + training-data operators.

The reference has no relational algebra (SURVEY.md §2.4) — joins,
aggregations, windows, sorts come straight from Spark SQL. This package
holds the engine's query library: the TPC-H-ish relational suite
(``relational``), large-scale dedup (``dedup``), similarity search
(``similarity``), text analysis (``text``) and multimodal plumbing
(``multimodal``).
"""

from pyspark.sql import Column, DataFrame


def ordered_result(df: DataFrame, *cols: "Column | str") -> DataFrame:
    """Final presentation sort with a materialization barrier.

    A bare ``orderBy`` on an expensive subtree executes it TWICE: the
    range partitioner's sampling job runs the full child once to pick
    split points, then the sort stage runs it again (measured 5.7s →
    3.8s on the SemDeDup pair join at sf0.1). A lazy ``localCheckpoint``
    pins the subtree's result on first execution, so the sample pass
    materializes it and the sort re-reads executor-local blocks.

    Scale note: the checkpointed relation is the query RESULT (already
    reduced), not the input — output-sized executor memory, freed when
    the DataFrame is GC'd. The sort itself stays a distributed range
    sort; use only as the outermost presentation step.
    """
    return df.localCheckpoint(eager=False).orderBy(*cols)
