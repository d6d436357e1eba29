"""Expression layer: field references and template compilation.

Compiles the reference's record-addressing notation
(``.Payload.After.foo``) and its Go-template condition/value subset
into Spark Column expressions, so per-record logic stays JVM-side.
"""

from conduit_spark.expr.refs import FieldRef, parse_ref, resolve  # noqa: F401
from conduit_spark.expr.template import (  # noqa: F401
    TemplateError,
    compile_condition,
    compile_template,
)
