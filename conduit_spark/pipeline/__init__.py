"""Pipeline control plane: YAML config → runnable batch/streaming
pipelines with fan-in/fan-out, per-connector processors, DLQ routing
and checkpoint recovery."""

from conduit_spark.pipeline.config import (  # noqa: F401
    ConnectorConfig,
    DLQConfig,
    PipelineConfig,
    ProcessorConfig,
    load_pipelines,
    parse_yaml,
)
from conduit_spark.pipeline.runtime import (  # noqa: F401
    BatchResult,
    Pipeline,
    PipelineFailure,
)
