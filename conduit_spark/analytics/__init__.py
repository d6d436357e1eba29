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


def combination_pairs(
    df: DataFrame, arr_col: str = "g", a: str = "a", b: str = "b"
) -> DataFrame:
    """All i<j element pairs of a sorted, cap-bounded array column —
    the pair-generation tail shared by every banded near-dup operator
    (minhash/simhash buckets, sign-LSH bands, image/audio fingerprint
    bands, shingle groups).

    Shape: ``posexplode`` emits each element with its position, then a
    second ``explode`` over ``slice(arr, i+2, ...)`` yields only the
    j>i partners, in whole-stage codegen with no self-join. r14: this
    replaced the ``flatten(transform(sequence, i -> transform(
    sequence, j -> ...)))`` nested-lambda form — Catalyst spent ~1.2s
    PER QUERY BUILD optimizing that expression and its generated code
    ran ~2x slower than the two flat generators (measured at sf0.1:
    plan 1.25s → 0.68s, execute 1.12s → 0.60s, byte-identical rows).
    Upstream hot-bucket caps must bound the array size; the slice
    keeps intermediate rows at C(n,2), never n².
    """
    from pyspark.sql import functions as F

    e = df.select(F.posexplode(arr_col).alias("__i", a), F.col(arr_col))
    return e.select(
        a,
        F.explode(
            F.expr(f"slice({arr_col}, __i + 2, size({arr_col}) - __i - 1)")
        ).alias(b),
    )
