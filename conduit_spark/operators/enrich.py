"""Per-record enrichment processors: webhook.http + LLM providers.

Reference behavior:
- ``webhook.http`` — templated URL/method/headers/body per record,
  response into a field, exponential backoff retries
  (impl/webhook/http.go:39-77,203-379).
- ``cohere.command``/``cohere.embed``/``cohere.rerank``,
  ``ollama.request``, ``openai.embed``/``openai.textgen`` — prompt or
  embed a field through a provider, batched requests
  (impl/cohere/embed.go:159-325 batches via maxTextsPerRequest; others
  per-record with backoff).

Spark-first design: these are the *only* operators that genuinely need
Python in the hot path, so they run as ``mapInPandas`` stages — Arrow
batches amortize interpreter overhead, each partition issues its own
requests (no driver fan-out), and bounded exponential backoff mirrors
webhook/http.go:52-59. The HTTP/LLM transport is injectable; the
default raises unless a transport is supplied, and ``fake_transport``
gives a deterministic offline stand-in (this container has no network
or provider SDKs — the Spark-side plumbing is real and tested, the
wire call is the stub).
"""

from __future__ import annotations

import hashlib
import json
import time
from collections.abc import Callable, Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from conduit_spark.expr import compile_template
from conduit_spark.operators.base import ERROR_COL, ensure_error_col, to_condition

Transport = Callable[[dict], dict]
"""A transport takes one request dict and returns a response dict.
Requests: {"url","method","headers","body"} (webhook) or
{"provider","model","input"} (LLM). Responses: {"status","body"} /
{"output"}; raise to trigger backoff."""


def fake_transport(request: dict) -> dict:
    """Deterministic offline transport: hashes the request.

    Lets pipelines and tests run end-to-end with stable outputs where
    real HTTP/LLM egress is unavailable.
    """
    digest = hashlib.sha256(
        json.dumps(request, sort_keys=True, default=str).encode()
    ).hexdigest()
    if request.get("provider"):
        if request.get("kind") == "embed":
            # 8-dim unit-ish vector derived from the digest
            vals = [int(digest[i : i + 4], 16) / 65535.0 for i in range(0, 32, 4)]
            return {"output": vals}
        return {"output": f"fake:{digest[:16]}"}
    return {"status": 200, "body": f'{{"digest":"{digest[:16]}"}}'}


HASH_EMBED_DIM = 8


def hash_embed_transport(request: dict) -> dict:
    """Per-text deterministic embedding transport.

    Unlike :func:`fake_transport` (which digests the whole request, so
    every text in an Arrow batch shares one vector and results depend
    on batch boundaries), this embeds EACH text independently:

        v[j] = int(md5(f"{model}:{text}:{j}")[:8], 16) / 2**32

    Batch-invariant, partition-invariant, and exactly reproducible in
    SQL (``CAST('0x'||substr(md5(model||':'||text||':'||j),1,8) AS
    BIGINT) / 4294967296.0``) — which makes end-to-end embedding
    pipelines oracle-checkable, not just rows-countable.
    """
    if request.get("kind") != "embed":
        return fake_transport(request)
    model = request.get("model", "")
    vecs = [
        [
            int(
                hashlib.md5(f"{model}:{text}:{j}".encode()).hexdigest()[:8], 16
            )
            / 2**32
            for j in range(HASH_EMBED_DIM)
        ]
        for text in request.get("input", [])
    ]
    return {"output": vecs}


def http_transport(request: dict) -> dict:
    """Default webhook transport over urllib (stdlib; no extra deps).

    Used on clusters with egress; this container has no network, so
    tests inject ``fake_transport`` instead. For an SSRF-guarded
    variant use :func:`policy_transport` — same allowlist engine the
    standalone-processor egress capability enforces."""
    import urllib.request

    req = urllib.request.Request(
        request["url"],
        data=(request.get("body") or "").encode() or None,
        headers=request.get("headers") or {},
        method=request.get("method", "GET"),
    )
    with urllib.request.urlopen(req, timeout=30) as resp:  # noqa: S310
        return {"status": resp.status, "body": resp.read().decode()}


def policy_transport(egress: dict) -> Transport:
    """A webhook/LLM transport that routes every call through the
    ONE egress boundary (``functions/egress.py``): hostname allowlist
    pre-filter, resolved-IP dial check, pinned Host/SNI, no redirects,
    total-call deadline and response-size cap. Declare it on the
    processor as ``egress: {allow: [...], ...}`` so webhook.http and
    the LLM processors share the standalone-plugin SSRF defense
    instead of each growing their own."""
    from conduit_spark.functions.egress import policy_from_settings

    policy = policy_from_settings(egress)
    if policy is None:
        raise ValueError("policy_transport needs a non-empty egress block")

    def transport(request: dict) -> dict:
        out = policy.request(
            request.get("method", "GET"),
            request["url"],
            headers=request.get("headers") or {},
            body=request.get("body"),
        )
        return {"status": out["status"], "body": out["body"]}

    return transport


def _with_retries(
    transport: Transport, request: dict, *, retries: int, backoff_s: float
) -> tuple[dict | None, str | None]:
    """Bounded exponential backoff (webhook/http.go:52-59 params)."""
    delay = backoff_s
    for attempt in range(retries + 1):
        try:
            return transport(request), None
        except Exception as e:  # noqa: BLE001 — error becomes a routed nack
            if attempt == retries:
                return None, f"{type(e).__name__}: {e}"
            time.sleep(delay)
            delay *= 2
    return None, "unreachable"


def _run_pool(
    transport: Transport,
    requests: list[dict],
    *,
    retries: int,
    backoff_s: float,
    concurrency: int,
) -> list[tuple[dict | None, str | None]]:
    """Issue requests with bounded in-flight concurrency per partition.

    At 100 TB the wall-clock of per-record transports is round-trip
    dominated; ~``concurrency`` overlapping calls per partition (×
    partitions across executors) hides that latency while per-record
    retry/backoff and error routing are preserved — each task is its
    own ``_with_retries``. Blocking socket I/O releases the GIL, so
    threads are the right tool here (no asyncio dependency in the
    executor Python)."""
    if not requests:
        return []
    if concurrency <= 1 or len(requests) == 1:
        return [
            _with_retries(transport, r, retries=retries, backoff_s=backoff_s)
            for r in requests
        ]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(concurrency, len(requests))) as pool:
        return list(
            pool.map(
                lambda r: _with_retries(
                    transport, r, retries=retries, backoff_s=backoff_s
                ),
                requests,
            )
        )


def _write_response(
    out: DataFrame, target_ref: str, resp_col: str, *, default_json: bool
) -> DataFrame:
    """Write a temp response column to the addressed envelope field.

    ``.Payload.After`` (the default) replaces the JSON payload text
    wholesale; any other ref goes through ``field_set``'s resolver so
    ``response_field``/``output_field`` configs are honored (round-1
    advice: they were accepted but ignored).

    On whole-payload replace the typed ``payload_after`` struct no
    longer describes the payload (the response has an unknown schema):
    it is DROPPED so downstream operators fall back to the JSON path
    instead of silently reading stale pre-response values."""
    from conduit_spark.operators.field_ops import field_set

    got = F.col(resp_col).isNotNull()
    if target_ref in (".Payload.After", ""):
        out = out.withColumn(
            "payload_after_json",
            F.when(got, F.col(resp_col)).otherwise(F.col("payload_after_json")),
        )
        if "payload_after" in out.columns:
            if default_json:
                out = out.withColumn(
                    "payload_after",
                    F.when(
                        got,
                        F.from_json(
                            F.col(resp_col), out.schema["payload_after"].dataType
                        ),
                    ).otherwise(F.col("payload_after")),
                )
            else:
                out = out.drop("payload_after")
        return out.drop(resp_col)
    return field_set(out, target_ref, F.col(resp_col), condition=got).drop(resp_col)


def webhook_http(
    df: DataFrame,
    url: str,
    *,
    method: str = "GET",
    headers: dict[str, str] | None = None,
    body: str | None = None,
    content_type: str | None = None,
    response_field: str = ".Payload.After",
    response_status_field: str | None = None,
    transport: Transport | None = None,
    retries: int = 3,
    backoff_s: float = 0.1,
    concurrency: int = 16,
    condition: str | Column | None = None,
) -> DataFrame:
    """Call a webhook per record; response body into ``response_field``,
    and (when ``response_status_field`` is set) the HTTP status code
    into that ref — webhook/http.go's ResponseBodyRef/ResponseStatusRef
    pair; ``content_type`` is the request.contentType shorthand for a
    Content-Type header.

    URL/body are templates evaluated per record *JVM-side*; only the
    HTTP call itself crosses into Python (mapInPandas), with up to
    ``concurrency`` requests in flight per partition. Failed records
    are tagged in ``_error`` (→ DLQ), matching ErrorRecord semantics.
    """
    if transport is None:
        raise ValueError(
            "webhook.http needs a transport (no network in this environment); "
            "pass conduit_spark.operators.enrich.fake_transport for offline runs"
        )
    df = ensure_error_col(df)
    cond = to_condition(df, condition)
    work = df.withColumn("__wh_url", compile_template(url, df).cast("string"))
    work = work.withColumn(
        "__wh_body",
        compile_template(body, df).cast("string") if body else F.lit(None).cast("string"),
    )
    work = work.withColumn(
        "__wh_go", F.lit(True) if cond is None else F.coalesce(cond, F.lit(False))
    )
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(
        list(work.schema.fields)
        + [
            StructField("__wh_resp", StringType(), True),
            StructField("__wh_status", StringType(), True),
        ]
    )
    hdrs = dict(headers or {})
    if content_type:
        hdrs.setdefault("Content-Type", content_type)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            resps: list = [None] * n
            stats: list = [None] * n
            errs = list(pdf[ERROR_COL])
            reqs, idxs = [], []
            # zip over columns, not iterrows() — ~20× less per-row
            # overhead in the Python stage
            for i, (go, url_v, body_v) in enumerate(
                zip(pdf["__wh_go"], pdf["__wh_url"], pdf["__wh_body"])
            ):
                if go:
                    reqs.append(
                        {"url": url_v, "method": method, "headers": hdrs,
                         "body": body_v}
                    )
                    idxs.append(i)
            results = _run_pool(
                transport, reqs, retries=retries, backoff_s=backoff_s,
                concurrency=concurrency,
            )
            for i, (resp, err) in zip(idxs, results):
                if resp is not None and "status" in resp:
                    stats[i] = str(resp["status"])
                if err is not None or resp is None:
                    errs[i] = f"webhook.http: {err}"
                elif resp.get("status", 500) >= 400:
                    errs[i] = f"webhook.http: status {resp['status']}"
                else:
                    resps[i] = resp.get("body")
            pdf = pdf.copy()
            pdf["__wh_resp"] = resps
            pdf["__wh_status"] = stats
            pdf[ERROR_COL] = errs
            yield pdf

    out = work.mapInPandas(run, schema)
    out = _write_response(out, response_field, "__wh_resp", default_json=False)
    if response_status_field:
        out = _write_response(out, response_status_field, "__wh_status", default_json=False)
    else:
        out = out.drop("__wh_status")
    return out.drop("__wh_url", "__wh_body", "__wh_go")


def llm_transform(
    df: DataFrame,
    *,
    provider: str,
    model: str,
    prompt: str,
    output_field: str = ".Payload.After",
    transport: Transport | None = None,
    retries: int = 3,
    backoff_s: float = 0.1,
    concurrency: int = 16,
    condition: str | Column | None = None,
    params: dict | None = None,
) -> DataFrame:
    """Shared text-generation processor for cohere.command /
    ollama.request / openai.textgen (impl/cohere/command.go:135-284,
    impl/ollama/ollama.go:102-308, impl/openai/textgen.go:125-186).

    The templated prompt renders JVM-side; generation happens in
    Arrow-batched partitions with up to ``concurrency`` in-flight
    requests each; output lands in ``output_field``. ``params`` carries
    provider generation knobs (temperature, max_tokens, top_p, seed, …
    — openai/textgen.go request fields) verbatim to the transport;
    omitted entirely when empty so request digests (and the offline
    fake-transport outputs derived from them) stay stable.
    """
    if transport is None:
        raise ValueError("llm_transform needs a transport; use fake_transport offline")
    df = ensure_error_col(df)
    cond = to_condition(df, condition)
    work = df.withColumn("__llm_prompt", compile_template(prompt, df).cast("string"))
    work = work.withColumn(
        "__llm_go", F.lit(True) if cond is None else F.coalesce(cond, F.lit(False))
    )
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(
        list(work.schema.fields) + [StructField("__llm_resp", StringType(), True)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resps: list = [None] * len(pdf)
            errs = list(pdf[ERROR_COL])
            reqs, idxs = [], []
            for i, (go, prompt_v) in enumerate(
                zip(pdf["__llm_go"], pdf["__llm_prompt"])
            ):
                if go:
                    req = {"provider": provider, "model": model,
                           "kind": "generate", "input": prompt_v}
                    if params:
                        req["params"] = params
                    reqs.append(req)
                    idxs.append(i)
            results = _run_pool(
                transport, reqs, retries=retries, backoff_s=backoff_s,
                concurrency=concurrency,
            )
            for i, (resp, err) in zip(idxs, results):
                if err is not None or resp is None:
                    errs[i] = f"{provider}: {err}"
                else:
                    resps[i] = json.dumps({"response": resp.get("output")})
            pdf = pdf.copy()
            pdf["__llm_resp"] = resps
            pdf[ERROR_COL] = errs
            yield pdf

    out = work.mapInPandas(run, schema)
    out = _write_response(out, output_field, "__llm_resp", default_json=False)
    return out.drop("__llm_prompt", "__llm_go")


def llm_rerank(
    df: DataFrame,
    *,
    provider: str,
    model: str,
    query: str,
    input_field: str,
    output_col: str = "__rerank_score",
    transport: Transport | None = None,
    retries: int = 3,
    backoff_s: float = 0.1,
    concurrency: int = 16,
    condition: str | Column | None = None,
    params: dict | None = None,
) -> DataFrame:
    """Rerank text vs a query (impl/cohere/rerank.go:134-301).

    Adds a relevance-score column; ordering/limiting is left to the
    caller (a sort at 100 TB should be an explicit, keyed top-k)."""
    if transport is None:
        raise ValueError("llm_rerank needs a transport; use fake_transport offline")
    from conduit_spark.expr.refs import resolve

    df = ensure_error_col(df)
    cond = to_condition(df, condition)
    work = df.withColumn("__rr_in", resolve(input_field, df).cast("string"))
    work = work.withColumn(
        "__rr_go", F.lit(True) if cond is None else F.coalesce(cond, F.lit(False))
    )
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(
        list(work.schema.fields) + [StructField(output_col, DoubleType(), True)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            scores: list = [None] * len(pdf)
            errs = list(pdf[ERROR_COL])
            reqs, idxs = [], []
            for i, (go, text) in enumerate(zip(pdf["__rr_go"], pdf["__rr_in"])):
                if go and text is not None:
                    req = {"provider": provider, "model": model, "kind": "rerank",
                           "input": text, "query": query}
                    if params:
                        req["params"] = params
                    reqs.append(req)
                    idxs.append(i)
            results = _run_pool(
                transport, reqs, retries=retries, backoff_s=backoff_s,
                concurrency=concurrency,
            )
            for i, (resp, err) in zip(idxs, results):
                if err is not None or resp is None:
                    errs[i] = f"{provider}.rerank: {err}"
                    continue
                out = resp.get("output")
                if isinstance(out, (int, float)):
                    scores[i] = float(out)
                else:  # fake transport returns a string digest — hash to score
                    h = hashlib.sha256(str(out).encode()).hexdigest()
                    scores[i] = int(h[:8], 16) % 10_000 / 10_000.0
            pdf = pdf.copy()
            pdf[output_col] = scores
            pdf[ERROR_COL] = errs
            yield pdf

    out = work.mapInPandas(run, schema)
    return out.drop("__rr_in", "__rr_go")


def llm_embed(
    df: DataFrame,
    *,
    provider: str,
    model: str,
    input_field: str,
    output_col: str = "__embedding",
    transport: Transport | None = None,
    max_texts_per_request: int = 96,
    retries: int = 3,
    backoff_s: float = 0.1,
    condition: str | Column | None = None,
    params: dict | None = None,
) -> DataFrame:
    """Embedding processor for cohere.embed / openai.embed
    (impl/cohere/embed.go:159-325 — request batching via
    maxTextsPerRequest maps naturally onto Arrow batches).

    Adds ``output_col`` (array<double>) next to the envelope. The
    reference zstd-compresses vectors into the payload; we keep them
    columnar — at 100 TB a typed array column beats opaque bytes for
    every downstream op (similarity, dedup, ANN).
    """
    if transport is None:
        raise ValueError("llm_embed needs a transport; use fake_transport offline")
    from conduit_spark.expr.refs import resolve

    df = ensure_error_col(df)
    cond = to_condition(df, condition)
    work = df.withColumn("__emb_in", resolve(input_field, df).cast("string"))
    work = work.withColumn(
        "__emb_go", F.lit(True) if cond is None else F.coalesce(cond, F.lit(False))
    )
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    # copy: StructType.add mutates in place, corrupting work's schema
    schema = StructType(
        list(work.schema.fields) + [StructField(output_col, ArrayType(DoubleType()), True)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embeddings: list = [None] * len(pdf)
            errs = list(pdf[ERROR_COL])
            texts, idxs = [], []
            for i, (go, text) in enumerate(zip(pdf["__emb_go"], pdf["__emb_in"])):
                if go and text is not None:
                    texts.append(text)
                    idxs.append(i)
            for start in range(0, len(texts), max_texts_per_request):
                chunk = texts[start : start + max_texts_per_request]
                chunk_idx = idxs[start : start + max_texts_per_request]
                req = {
                    "provider": provider,
                    "model": model,
                    "kind": "embed",
                    "input": chunk,
                }
                if params:
                    req["params"] = params
                resp, err = _with_retries(
                    transport,
                    req,
                    retries=retries,
                    backoff_s=backoff_s,
                )
                if err is not None or resp is None:
                    for i in chunk_idx:
                        errs[i] = f"{provider}.embed: {err}"
                    continue
                out = resp.get("output")
                # transport may return one vector per text or one shared
                vecs = out if out and isinstance(out[0], list) else [out] * len(chunk)
                for i, v in zip(chunk_idx, vecs):
                    embeddings[i] = v
            pdf = pdf.copy()
            pdf[output_col] = embeddings
            pdf[ERROR_COL] = errs
            yield pdf

    out = work.mapInPandas(run, schema)
    return out.drop("__emb_in", "__emb_go")
