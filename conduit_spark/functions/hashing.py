"""Cross-engine deterministic hashing primitives.

MD5 produces identical hex in Spark and DuckDB, so
``conv(substr(md5(x),1,8),16,10)`` (Spark) ==
``CAST('0x'||substr(md5(x),1,8) AS BIGINT)`` (DuckDB) — a 32-bit
integer hash computable by both engines. Every sketch operator
(minhash, simhash, fingerprints) builds on this so the DuckDB oracle
can reproduce results bit-for-bit.

Spark's own xxhash64/hash are faster but engine-specific; at cluster
scale you may swap ``HASH_IMPL='xxhash64'`` — the operators only need
*some* stable 32-bit hash.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# prime > 2^32 for minhash permutations (a*x+b) % P
MINHASH_PRIME = 4_294_967_311


def md5_int32(col: Column) -> Column:
    """First 8 md5 hex digits as a bigint in [0, 2^32)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("bigint")


def sql_md5_int32(expr: str) -> str:
    """DuckDB fragment mirroring :func:`md5_int32`."""
    return f"CAST('0x' || substr(md5({expr}), 1, 8) AS BIGINT)"


def md5_int60(col: Column) -> Column:
    """First 15 md5 hex digits as a bigint in [0, 2^60) — the wide
    variant for relations where 32-bit birthday collisions are no
    longer negligible (gram universes: 500k grams at sf0.1 already
    expect ~30 pair collisions at 32 bits, ~0 at 60). 15 digits keep
    the value inside signed-BIGINT range in both engines."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )


def sql_md5_int60(expr: str) -> str:
    """DuckDB fragment mirroring :func:`md5_int60`."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def minhash_params(k: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for k permutation hashes.

    Simple LCG so the constants are reproducible in any engine/test
    without a RNG library.
    """
    params = []
    state = seed
    for _ in range(k):
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        a = (state % 65_521) | 1  # odd, < 2^16 → a*x < 2^48, no overflow
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        b = state % MINHASH_PRIME
        params.append((a, b))
    return params


def hyperplanes(n_planes: int, dim: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes for sign-LSH.

    LCG-driven uniform values in [-1, 1], embedded as literals in both
    the Spark plan and the SQL oracle.
    """
    planes = []
    state = seed
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
            row.append(round((state / float(2**63)) * 2.0 - 1.0, 6))
        planes.append(row)
    return planes
