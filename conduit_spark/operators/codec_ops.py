"""json.* / base64.* / avro.* processors.

Reference behavior:
- ``json.decode`` — raw JSON bytes/string at ``.Payload.After``/
  ``.Key`` → structured data (impl/json/decode.go:78-129).
- ``json.encode`` — structured field → JSON string
  (impl/json/encode.go:77-109).
- ``base64.encode``/``base64.decode`` — base64 the field value
  (impl/base64/encode.go:79-122, decode.go:76-120).
- ``avro.encode``/``avro.decode`` — Avro with registry schema
  (impl/avro/encode.go:135-206, decode.go:114-166). Spark-side these
  are ``to_avro``/``from_avro`` with an explicit JSON schema — the
  schema-registry wire format (magic byte + id) is handled by the
  pipeline's schema binding, not per record. Gated: requires the
  spark-avro package on the classpath.

In the dual raw/structured envelope, "structured" payload lives in the
JSON text column (plus the optional typed struct); "raw" lives in the
binary column with ``is_structured = false``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.types import StructType

from conduit_spark.expr import parse_ref
from conduit_spark.operators.base import conditional_with_columns
from conduit_spark.operators.field_ops import _PAYLOAD_JSON, _PAYLOAD_TYPED, _typed_col


def json_decode(
    df: DataFrame,
    field: str = ".Payload.After",
    *,
    schema: StructType | str | None = None,
    condition: str | Column | None = None,
) -> DataFrame:
    """Parse raw JSON at ``field`` into structured data.

    Whole-payload/key targets (like the reference, decode.go:84-105:
    only raw→structured of a field's bytes). With ``schema`` the typed
    struct column is (re)bound — fully JVM-side via from_json.
    """
    ref = parse_ref(field)
    if ref.root == "key":
        changes = {
            "key_json": F.coalesce(F.col("key_json"), F.col("key_raw").cast("string")),
            "key_raw": F.lit(None).cast("binary"),
        }
        return conditional_with_columns(df, condition, changes)
    if not ref.root.startswith("payload."):
        raise ValueError("json.decode targets .Payload.After/.Payload.Before/.Key")
    js = _PAYLOAD_JSON[ref.root]
    changes = {js: F.coalesce(F.col(js), F.col("payload_after_raw").cast("string"))
               if ref.root == "payload.after" else F.col(js)}
    if ref.root == "payload.after":
        changes["payload_after_raw"] = F.lit(None).cast("binary")
        changes["is_structured"] = F.lit(True)
    out = conditional_with_columns(df, condition, changes)
    if schema is not None:
        out = out.withColumn(_PAYLOAD_TYPED[ref.root], F.from_json(F.col(js), schema))
    return out


def json_encode(
    df: DataFrame,
    field: str = ".Payload.After",
    *,
    condition: str | Column | None = None,
) -> DataFrame:
    """Serialize the structured field back to raw JSON text
    (impl/json/encode.go:77-109)."""
    ref = parse_ref(field)
    if ref.root == "key":
        return conditional_with_columns(
            df,
            condition,
            {
                "key_raw": F.coalesce(
                    F.col("key_raw"), F.col("key_json").cast("binary")
                ),
                "key_json": F.lit(None).cast("string"),
            },
        )
    if ref.root != "payload.after":
        raise ValueError("json.encode supports .Payload.After/.Key targets")
    typed = _typed_col(df, ref.root)
    js = F.to_json(F.col(typed)) if typed else F.col("payload_after_json")
    return conditional_with_columns(
        df,
        condition,
        {
            "payload_after_raw": js.cast("binary"),
            "payload_after_json": F.lit(None).cast("string"),
            "is_structured": F.lit(False),
        },
    )


def _field_col(df: DataFrame, field: str) -> tuple[Column, str]:
    """(readable column, kind) where kind describes how to write back."""
    from conduit_spark.expr.refs import resolve

    ref = parse_ref(field)
    return resolve(ref, df), ref.root


def base64_encode(
    df: DataFrame,
    field: str = ".Payload.After",
    *,
    condition: str | Column | None = None,
) -> DataFrame:
    """Base64-encode the field's value in place
    (impl/base64/encode.go:79-122). Value becomes a raw string."""
    return _base64_apply(df, field, encode=True, condition=condition)


def base64_decode(
    df: DataFrame,
    field: str = ".Payload.After",
    *,
    condition: str | Column | None = None,
) -> DataFrame:
    """Base64-decode (impl/base64/decode.go:76-120)."""
    return _base64_apply(df, field, encode=False, condition=condition)


def _base64_apply(df, field, *, encode, condition):
    ref = parse_ref(field)
    if ref.root == "key" and not ref.path:
        src = F.coalesce(F.col("key_raw"), F.col("key_json").cast("binary"))
        val = (
            F.base64(src).cast("binary")
            if encode
            else F.unbase64(src.cast("string"))
        )
        return conditional_with_columns(
            df,
            condition,
            {"key_raw": val, "key_json": F.lit(None).cast("string")},
        )
    if ref.root == "payload.after" and not ref.path:
        src = F.coalesce(
            F.col("payload_after_raw"),
            F.col("payload_after_json").cast("binary"),
        )
        if encode:
            return conditional_with_columns(
                df,
                condition,
                {
                    "payload_after_json": F.lit(None).cast("string"),
                    "payload_after_raw": F.base64(src).cast("binary"),
                    "is_structured": F.lit(False),
                },
            )
        return conditional_with_columns(
            df,
            condition,
            {
                "payload_after_json": F.lit(None).cast("string"),
                "payload_after_raw": F.unbase64(src.cast("string")),
                "is_structured": F.lit(False),
            },
        )
    # sub-field target on a typed payload: encode the leaf in place
    typed = _typed_col(df, ref.root)
    if ref.root.startswith("payload.") and ref.path and typed:
        src = F.col(typed)
        for p in ref.path:
            src = src[p]
        val = (
            F.base64(src.cast("binary")) if encode else F.unbase64(src.cast("string")).cast("string")
        )
        new = F.col(typed).withField(".".join(ref.path), val)
        out = conditional_with_columns(df, condition, {typed: new})
        from conduit_spark.operators.field_ops import _resync_json

        return _resync_json(out, ref.root)
    raise ValueError(
        f"base64 target {field!r} needs a whole payload/key or a schema-bound sub-field"
    )


# ---- avro (gated on spark-avro being available) --------------------------


def _avro_funcs():
    try:
        from pyspark.sql.avro.functions import from_avro, to_avro

        return from_avro, to_avro
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "avro.encode/decode need the spark-avro package on the classpath"
        ) from e


def avro_encode(
    df: DataFrame,
    json_schema: str,
    field: str = ".Payload.After",
    *,
    condition: str | Column | None = None,
) -> DataFrame:
    """Encode the typed payload struct to Avro bytes
    (reference: impl/avro/encode.go:135-206; schema strategies
    preRegistered/autoRegister collapse to an explicit schema here)."""
    from_avro, to_avro = _avro_funcs()
    ref = parse_ref(field)
    typed = _typed_col(df, ref.root)
    if not typed:
        raise ValueError("avro.encode requires a schema-bound payload")
    return conditional_with_columns(
        df,
        condition,
        {
            "payload_after_raw": to_avro(F.col(typed), json_schema),
            "payload_after_json": F.lit(None).cast("string"),
            "is_structured": F.lit(False),
        },
    )


def avro_decode(
    df: DataFrame,
    json_schema: str,
    field: str = ".Payload.After",
    *,
    condition: str | Column | None = None,
) -> DataFrame:
    """Decode Avro bytes at the field into the typed payload struct
    (reference: impl/avro/decode.go:114-166)."""
    from_avro, to_avro = _avro_funcs()
    ref = parse_ref(field)
    typed_name = _PAYLOAD_TYPED[ref.root]
    out = df.withColumn(typed_name, from_avro(F.col("payload_after_raw"), json_schema))
    out = out.withColumn("payload_after_json", F.to_json(F.col(typed_name)))
    return out.withColumn("is_structured", F.lit(True)).withColumn(
        "payload_after_raw", F.lit(None).cast("binary")
    )
