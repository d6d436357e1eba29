"""Go-template-subset → Spark Column compiler.

The reference evaluates Go templates (text/template + sprig) per record
for processor *conditions* (must render "true"/"false" —
pkg/processor/processor_condition.go:35-63) and for dynamic *values*
(field.set — impl/field/set.go:76-110). Running a template engine per
row would put every record through Python; instead we compile the
documented subset directly to Column expressions so conditions and
values stay inside whole-stage codegen.

Supported subset (bounded scope per SURVEY.md §7.3):

- actions ``{{ ... }}`` interleaved with literal text (concatenated)
- field references ``.Payload.After.x`` etc. (expr.refs)
- literals: double/back-quoted strings, ints, floats, true/false/nil
- comparison/logic functions (Go template builtins): ``eq ne lt le gt
  ge and or not``
- sprig string helpers: ``contains hasPrefix hasSuffix upper lower
  trim title toJson``, ``printf`` with plain %s/%d/%v verbs
- pipelines ``{{ .X | upper }}`` (value piped as last arg)
- parenthesized sub-expressions

Anything outside the subset raises ``TemplateError``; callers may fall
back to a pandas-UDF template engine (slow path) or reject the config.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from conduit_spark.expr.refs import parse_ref, resolve


class TemplateError(ValueError):
    pass


_ACTION_RE = re.compile(r"\{\{-?\s*(.*?)\s*-?\}\}", re.DOTALL)

_TOKEN_RE = re.compile(
    r"""
    \s*(
        "(?:[^"\\]|\\.)*"      # double-quoted string
      | `[^`]*`                # raw string
      | -?\d+\.\d+             # float
      | -?\d+                  # int
      | \.[A-Za-z_][\w.]*      # field reference
      | \.                     # bare dot (whole context)
      | [A-Za-z_][\w]*         # identifier / function
      | \(|\)|\|
    )""",
    re.VERBOSE,
)


def _tokenize(src: str) -> list[str]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise TemplateError(f"cannot tokenize template at: {src[pos:]!r}")
        out.append(m.group(1))
        pos = m.end()
    return out


@dataclass
class _Lit:
    value: object


@dataclass
class _Ref:
    path: str


@dataclass
class _Call:
    fn: str
    args: list


def _parse_expr(tokens: list[str], pos: int = 0, *, in_parens: bool = False):
    """Parse a pipeline: command {| command}*."""
    node, pos = _parse_command(tokens, pos, in_parens=in_parens)
    while pos < len(tokens) and tokens[pos] == "|":
        fn_node, pos = _parse_command(tokens, pos + 1, in_parens=in_parens)
        if isinstance(fn_node, _Call):
            fn_node.args.append(node)
            node = fn_node
        elif isinstance(fn_node, _Lit) and isinstance(fn_node.value, str):
            node = _Call(fn_node.value, [node])
        else:
            raise TemplateError("pipeline target must be a function")
    return node, pos


def _parse_command(tokens: list[str], pos: int, *, in_parens: bool):
    """A command: operand, or function with operand args."""
    first, pos = _parse_operand(tokens, pos)
    if isinstance(first, _Call) and first.fn in _FUNCTIONS:
        args = []
        while pos < len(tokens) and tokens[pos] not in ("|", ")"):
            arg, pos = _parse_operand(tokens, pos)
            if isinstance(arg, _Call) and arg.fn in _FUNCTIONS and not arg.args:
                raise TemplateError(f"function {arg.fn} needs parentheses here")
            args.append(arg)
        first.args.extend(args)
    return first, pos


def _parse_operand(tokens: list[str], pos: int):
    if pos >= len(tokens):
        raise TemplateError("unexpected end of template expression")
    t = tokens[pos]
    if t == "(":
        node, pos = _parse_expr(tokens, pos + 1, in_parens=True)
        if pos >= len(tokens) or tokens[pos] != ")":
            raise TemplateError("unbalanced parentheses in template")
        return node, pos + 1
    if t.startswith('"'):
        return _Lit(_unescape(t[1:-1])), pos + 1
    if t.startswith("`"):
        return _Lit(t[1:-1]), pos + 1
    if re.fullmatch(r"-?\d+", t):
        return _Lit(int(t)), pos + 1
    if re.fullmatch(r"-?\d+\.\d+", t):
        return _Lit(float(t)), pos + 1
    if t == "true":
        return _Lit(True), pos + 1
    if t == "false":
        return _Lit(False), pos + 1
    if t == "nil":
        return _Lit(None), pos + 1
    if t.startswith("."):
        return _Ref(t), pos + 1
    if re.fullmatch(r"[A-Za-z_]\w*", t):
        if t in _FUNCTIONS:
            return _Call(t, []), pos + 1
        raise TemplateError(f"unsupported template function/identifier: {t!r}")
    raise TemplateError(f"unexpected token {t!r}")


def _unescape(s: str) -> str:
    return s.encode().decode("unicode_escape")


# ---- compilation to Column ----------------------------------------------


def _num_or_str(c: Column, other) -> Column:
    """Cast the ref side so comparisons against numeric/bool literals work
    even when the value came out of JSON as a string."""
    if isinstance(other, _Lit):
        if isinstance(other.value, bool):
            return c.cast("boolean")
        if isinstance(other.value, (int, float)):
            return c.cast("double")
    return c


def _cmp(op):
    def run(args, df):
        if len(args) < 2:
            raise TemplateError("comparison needs 2 args")
        cols = []
        for i, a in enumerate(args):
            other = args[1 - i] if len(args) == 2 else None
            c = _compile_node(a, df)
            if isinstance(a, _Ref) and other is not None:
                c = _num_or_str(c, other)
            if isinstance(a, _Lit) and isinstance(a.value, (int, float)) and not isinstance(a.value, bool):
                c = c.cast("double")
            cols.append(c)
        res = op(cols[0], cols[1])
        for extra in cols[2:]:  # go's eq is variadic: eq a b c == (a==b or a==c)
            res = res | op(cols[0], extra)
        return res

    return run


def _fn_and(args, df):
    cols = [_to_bool(_compile_node(a, df)) for a in args]
    out = cols[0]
    for c in cols[1:]:
        out = out & c
    return out


def _fn_or(args, df):
    cols = [_to_bool(_compile_node(a, df)) for a in args]
    out = cols[0]
    for c in cols[1:]:
        out = out | c
    return out


def _fn_not(args, df):
    return ~_to_bool(_compile_node(args[0], df))


def _str1(fn):
    return lambda args, df: fn(_compile_node(args[0], df).cast("string"))


def _fn_contains(args, df):
    # sprig: contains substring string
    sub = _compile_node(args[0], df).cast("string")
    s = _compile_node(args[1], df).cast("string")
    return s.contains(sub)


def _fn_has_prefix(args, df):
    return _compile_node(args[1], df).cast("string").startswith(
        _compile_node(args[0], df).cast("string")
    )


def _fn_has_suffix(args, df):
    return _compile_node(args[1], df).cast("string").endswith(
        _compile_node(args[0], df).cast("string")
    )


def _fn_printf(args, df):
    if not (isinstance(args[0], _Lit) and isinstance(args[0].value, str)):
        raise TemplateError("printf format must be a literal string")
    fmt = args[0].value
    fmt_spark = re.sub(r"%[vd]", "%s", fmt)
    return F.format_string(fmt_spark, *[
        _compile_node(a, df).cast("string") for a in args[1:]
    ])


def _fn_to_json(args, df):
    c = _compile_node(args[0], df)
    return F.to_json(c)


def _fn_default(args, df):
    # sprig: default defaultVal value
    return F.coalesce(_compile_node(args[1], df), _compile_node(args[0], df))


def _fn_replace(args, df):
    # sprig: replace old new string
    return F.replace(
        _compile_node(args[2], df).cast("string"),
        _compile_node(args[0], df).cast("string"),
        _compile_node(args[1], df).cast("string"),
    )


def _fn_substr(args, df):
    # sprig: substr start end string (end exclusive, 0-based)
    start = _compile_node(args[0], df).cast("int")
    end = _compile_node(args[1], df).cast("int")
    s = _compile_node(args[2], df).cast("string")
    return F.substring(s, start + F.lit(1), end - start)


def _fn_len(args, df):
    return F.length(_compile_node(args[0], df).cast("string"))


def _fn_trim_prefix(args, df):
    # sprig: trimPrefix prefix string
    pre = _compile_node(args[0], df).cast("string")
    s = _compile_node(args[1], df).cast("string")
    return F.when(
        s.startswith(pre),
        F.substring(s, F.length(pre) + F.lit(1), F.lit(2**31 - 1)),
    ).otherwise(s)


def _fn_trim_suffix(args, df):
    suf = _compile_node(args[0], df).cast("string")
    s = _compile_node(args[1], df).cast("string")
    return F.when(
        s.endswith(suf), F.substring(s, F.lit(1), F.length(s) - F.length(suf))
    ).otherwise(s)


def _arith(op):
    def run(args, df):
        cols = [_compile_node(a, df).cast("double") for a in args]
        out = cols[0]
        for c in cols[1:]:
            out = op(out, c)
        # Go template math on ints renders without decimal point; keep
        # integral results integral for string rendering parity
        return F.when(out == out.cast("long").cast("double"), out.cast("long").cast("string")).otherwise(out.cast("string"))

    return run


def _sprig_empty(col: Column, df: DataFrame) -> Column:
    """sprig's ``empty()``: nil, numeric zero, false, "" and empty
    collections are all empty — typed, not stringified ("0" the STRING
    is non-empty). Type comes from a driver-side analysis of the
    compiled expression (once per template compile)."""
    from pyspark.sql import types as T

    dt = df.select(col.alias("__c")).schema[0].dataType
    if isinstance(dt, T.BooleanType):
        return col.isNull() | ~col
    if isinstance(dt, T.NumericType):
        return col.isNull() | (col == F.lit(0).cast(dt))
    if isinstance(dt, T.StringType):
        return col.isNull() | (col == "")
    if isinstance(dt, (T.ArrayType, T.MapType)):
        return col.isNull() | (F.size(col) == 0)
    return col.isNull()


def _fn_coalesce_sprig(args, df):
    # sprig: first non-EMPTY argument (not merely non-null — see
    # processor_condition.go:40 wiring sprig's FuncMap)
    out = F.lit(None)
    for a in reversed(args):
        c = _compile_node(a, df)
        out = F.when(~_sprig_empty(c, df), c).otherwise(out)
    return out


_FUNCTIONS = {
    "eq": _cmp(lambda a, b: a == b),
    "ne": _cmp(lambda a, b: a != b),
    "lt": _cmp(lambda a, b: a < b),
    "le": _cmp(lambda a, b: a <= b),
    "gt": _cmp(lambda a, b: a > b),
    "ge": _cmp(lambda a, b: a >= b),
    "and": _fn_and,
    "or": _fn_or,
    "not": _fn_not,
    "contains": _fn_contains,
    "hasPrefix": _fn_has_prefix,
    "hasSuffix": _fn_has_suffix,
    "upper": _str1(F.upper),
    "lower": _str1(F.lower),
    "trim": _str1(F.trim),
    "title": _str1(F.initcap),
    "toJson": _fn_to_json,
    "printf": _fn_printf,
    "default": _fn_default,
    "replace": _fn_replace,
    "substr": _fn_substr,
    "len": _fn_len,
    "trimPrefix": _fn_trim_prefix,
    "trimSuffix": _fn_trim_suffix,
    "b64enc": lambda args, df: F.base64(
        _compile_node(args[0], df).cast("string").cast("binary")
    ),
    "b64dec": lambda args, df: F.unbase64(
        _compile_node(args[0], df).cast("string")
    ).cast("string"),
    "add": _arith(lambda a, b: a + b),
    "sub": _arith(lambda a, b: a - b),
    "mul": _arith(lambda a, b: a * b),
    # sprig `div` is INTEGER division (Go int64 `/`, truncation toward
    # zero — Spark's double→long cast truncates the same way); `divf`
    # is the float form (processor_condition.go:40 wires sprig's
    # FuncMap, where div=toInt64 division).
    "div": _arith(lambda a, b: (a / b).cast("long")),
    "divf": _arith(lambda a, b: a / b),
    "mod": _arith(lambda a, b: a % b),
    # sprig ternary: value-if-true, value-if-false, condition
    "ternary": lambda args, df: F.when(
        _to_bool(_compile_node(args[2], df)), _compile_node(args[0], df)
    ).otherwise(_compile_node(args[1], df)),
    "coalesce": _fn_coalesce_sprig,
}


def _compile_node(node, df: DataFrame) -> Column:
    if isinstance(node, _Lit):
        return F.lit(node.value)
    if isinstance(node, _Ref):
        if node.path == ".":
            raise TemplateError("bare '.' (whole record) not supported in expressions")
        return resolve(parse_ref(node.path), df)
    if isinstance(node, _Call):
        fn = _FUNCTIONS.get(node.fn)
        if fn is None:
            raise TemplateError(f"unsupported function {node.fn!r}")
        return fn(node.args, df)
    raise TemplateError(f"cannot compile node {node!r}")


def _to_bool(c: Column) -> Column:
    # Go-template truthiness for conditions: booleans pass through;
    # strings must equal "true" (processor_condition.go parses bool).
    return F.when(c.cast("string") == "true", F.lit(True)).otherwise(
        c.cast("boolean").isNotNull() & c.cast("boolean")
    )


def compile_action(src: str, df: DataFrame) -> Column:
    """Compile the inside of one ``{{ ... }}`` action to a Column."""
    tokens = _tokenize(src)
    node, pos = _parse_expr(tokens)
    if pos != len(tokens):
        raise TemplateError(f"trailing tokens in template: {tokens[pos:]!r}")
    return _compile_node(node, df)


def compile_template(template: str, df: DataFrame) -> Column:
    """Compile a full template (literal text + actions) to a *string*
    Column — Go template rendering always produces text."""
    parts: list[Column] = []
    pos = 0
    for m in _ACTION_RE.finditer(template):
        if m.start() > pos:
            parts.append(F.lit(template[pos : m.start()]))
        col = compile_action(m.group(1), df)
        parts.append(_render(col))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    if not parts:
        return F.lit("")
    if len(parts) == 1:
        return parts[0]
    return F.concat(*parts)


def _render(c: Column) -> Column:
    # Go renders booleans as true/false, numbers per %v; string cast
    # matches for the supported types.
    return c.cast("string")


def compile_condition(template: str, df: DataFrame) -> Column:
    """Compile a processor condition to a BooleanType Column.

    Mirrors processor_condition.go:52-63: render the template, parse
    the output as a boolean; non-boolean output is an error there — we
    treat it as false-with-null semantics at plan time when possible.
    """
    t = template.strip()
    m = _ACTION_RE.fullmatch(t)
    if m:
        return _to_bool(compile_action(m.group(1), df))
    return _to_bool(compile_template(template, df))
