"""Local mirror of the driver's duckdb-oracle compare.

Sorts columns by name, canonicalizes values, compares row multisets —
order-insensitive, exact (no float tolerance, matching the driver's
value-hash)."""

from __future__ import annotations

import datetime
import math


def _canon(v):
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("n", float(v)) if not isinstance(v, bool) else ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("n", v)
    if isinstance(v, datetime.datetime):
        return ("t", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("t", v.isoformat())
    if isinstance(v, (bytes, bytearray)):
        return ("y", bytes(v).hex())
    if isinstance(v, (list, tuple)):
        return ("l", tuple(_canon(x) for x in v))
    if isinstance(v, dict):
        return ("m", tuple(sorted((k, _canon(x)) for k, x in v.items())))
    return ("s", str(v))


def rows_to_multiset(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def compare_spark_duckdb(spark_df, duck_con, sql):
    spark_cols = spark_df.columns
    spark_rows = [tuple(r) for r in spark_df.collect()]
    res = duck_con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s = rows_to_multiset(spark_cols, spark_rows)
    d = rows_to_multiset(duck_cols, duck_rows)
    if s != d:
        diff_s = [r for r in s if r not in d][:3]
        diff_d = [r for r in d if r not in s][:3]
        raise AssertionError(
            f"value mismatch; spark-only={diff_s} duck-only={diff_d}"
        )
