"""Scale primitives: bucketed co-located joins and skew-salted joins.

Neither exists in the reference (single-node, no joins); both are core
to running this engine's relational/dedup surface at 100 TB:

- **bucketing** removes the shuffle from repeated large-large joins:
  write both fact tables bucketed+sorted by the join key once, then
  every subsequent join on that key is exchange-free on the bucketed
  sides (sort-merge over pre-sorted buckets).
- **salting** handles keys whose frequency breaks hash partitioning:
  explode the hot side's key space by a salt factor and replicate the
  small side per salt. AQE's skew-join handles moderate skew
  automatically (enabled in session defaults); explicit salting is for
  the pathological keys AQE can't split (single-key hot spots in
  groupBy or the build side of an LSH bucket join).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Persist as a bucketed+sorted managed table (Hive-style layout).

    Bucket count should be chosen so one bucket ≈ 100-200 MB at the
    target scale; it is fixed at write time and both join sides must
    match for the exchange to be elided."""
    writer = df.write.mode(mode).format(fmt).bucketBy(n_buckets, *bucket_cols)
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.saveAsTable(table)


def bucketed_join_ready(spark: SparkSession, table_a: str, table_b: str) -> bool:
    """True when both tables exist as bucketed tables (join on the
    bucket key will skip the exchange on both sides)."""
    cat = spark.catalog
    return cat.tableExists(table_a) and cat.tableExists(table_b)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    *,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side salted against key skew.

    left (large, skewed) gets a random-but-deterministic salt derived
    from a row hash; right (smaller) is replicated ``salt`` times via
    explode — so each hot key spreads over ``salt`` reducers. Columns
    out match a plain ``left.join(right, key, how)``.
    """
    if salt < 2:
        return left.join(right, key, how)
    salted_l = left.withColumn(
        "__salt", (F.abs(F.xxhash64(*[F.col(c) for c in left.columns])) % salt)
    )
    salted_r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = salted_l.join(salted_r, [key, "__salt"], how)
    return out.drop("__salt")


def repartition_for_key_join(df: DataFrame, key: str, partitions: int | None = None) -> DataFrame:
    """Pre-partition on a join/group key so several downstream ops on
    the same key reuse one exchange (Catalyst recognizes the existing
    hash partitioning)."""
    return df.repartition(partitions, F.col(key)) if partitions else df.repartition(F.col(key))
