"""Processor library — the reference's 25 built-in processors
(pkg/plugin/processor/builtin/registry.go:46-72) as pure
DataFrame→DataFrame functions over the OpenCDC envelope.

Registry mapping (reference name → function):

| reference            | here                                     |
|----------------------|------------------------------------------|
| filter               | topology.filter_records                  |
| field.set            | field_ops.field_set                      |
| field.exclude        | field_ops.field_exclude                  |
| field.rename         | field_ops.field_rename                   |
| field.convert        | field_ops.field_convert                  |
| json.decode          | codec_ops.json_decode                    |
| json.encode          | codec_ops.json_encode                    |
| base64.encode        | codec_ops.base64_encode                  |
| base64.decode        | codec_ops.base64_decode                  |
| avro.encode          | codec_ops.avro_encode                    |
| avro.decode          | codec_ops.avro_decode                    |
| clone                | topology.clone                           |
| split                | topology.split                           |
| error                | topology.error                           |
| unwrap.opencdc       | unwrap.unwrap_opencdc                    |
| unwrap.debezium      | unwrap.unwrap_debezium                   |
| unwrap.kafkaconnect  | unwrap.unwrap_kafka_connect              |
| webhook.http         | enrich.webhook_http                      |
| custom.javascript    | custom.custom_python (mapInPandas; ADR   |
|                      | 20260704-no-bespoke-dsl.md → Python)     |
| cohere.command       | enrich.llm_transform(provider="cohere")  |
| cohere.embed         | enrich.llm_embed(provider="cohere")      |
| cohere.rerank        | enrich.llm_rerank                        |
| ollama.request       | enrich.llm_transform(provider="ollama")  |
| openai.embed         | enrich.llm_embed(provider="openai")      |
| openai.textgen       | enrich.llm_transform(provider="openai")  |
"""

from conduit_spark.operators.base import (  # noqa: F401
    ERROR_COL,
    conditional_with_columns,
    ensure_error_col,
    split_errors,
)
from conduit_spark.operators.codec_ops import (  # noqa: F401
    avro_decode,
    avro_encode,
    base64_decode,
    base64_encode,
    json_decode,
    json_encode,
)
from conduit_spark.operators.custom import (  # noqa: F401
    custom_python,
    custom_subprocess,
)
from conduit_spark.operators.enrich import (  # noqa: F401
    fake_transport,
    hash_embed_transport,
    llm_embed,
    llm_rerank,
    llm_transform,
    policy_transport,
    webhook_http,
)
from conduit_spark.operators.field_ops import (  # noqa: F401
    field_convert,
    field_exclude,
    field_rename,
    field_set,
)
from conduit_spark.operators.topology import (  # noqa: F401
    clone,
    error,
    filter_records,
    split,
)
from conduit_spark.operators.unwrap import (  # noqa: F401
    unwrap_debezium,
    unwrap_kafka_connect,
    unwrap_opencdc,
)
