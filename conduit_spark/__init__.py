"""conduit_spark — a PySpark-native data-pipeline engine.

A brand-new engine with the query/data-processing capabilities of
ConduitIO/conduit (see SURVEY.md), re-expressed Spark-first:

- OpenCDC-style record envelope as a fixed StructType (``envelope``)
- per-record processors as pure ``DataFrame -> DataFrame`` functions
  (``operators``) driven by a reference-path + template expression
  compiler (``expr``)
- sources/sinks (``sources``, ``sinks``), YAML pipeline runtime with
  fan-in/fan-out/DLQ (``pipeline``), Structured Streaming wrappers
  (``streaming``)
- large-scale training-data analytics beyond the reference: dedup,
  similarity search, text analysis, multimodal plumbing
  (``analytics``)

Everything is designed for a many-executor cluster (declarative plans
for Catalyst, broadcast-able dims, partition-local work, no driver-side
loops) while remaining testable on ``local[*]``.
"""

from conduit_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
