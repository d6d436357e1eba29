"""Text analysis for training-data pipelines (beyond the reference).

Language ID (marker-word heuristic), quality scoring (length /
punctuation / stopword / uniqueness ratios), token counting, and
document fingerprinting (position-weighted rolling hash) over the
``documents`` table. Everything is built-in-function column algebra —
single scan, one optional shuffle, no Python — and each query has an
exact DuckDB oracle (hash parity via functions.hashing).

The reference's closest precedent is its AI-pipeline processor family
(cohere/openai/ollama, docs/design-documents/20260724-ai-pipeline-components.md);
these operators are the deterministic, 100 TB-scalable complement.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from conduit_spark.functions.hashing import md5_int32, sql_md5_int32
from conduit_spark.sources.tables import load_table

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it", "for", "on")

LANG_MARKERS = {
    "en": ("the", "and", "of", "is", "fast"),
    "es": ("el", "la", "los", "una", "es"),
    "de": ("der", "die", "und", "ist", "ein"),
    "fr": ("le", "les", "et", "est", "une"),
    "zh": ("de", "shi", "he", "zai", "le"),
}
_LANG_ORDER = ("en", "es", "de", "fr", "zh")


def _tokens():
    return F.split(F.col("text"), " ")


def t_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count + distinct count per document."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.length("text").alias("n_chars_actual"),
    )


# BPE-ish pre-tokenization classes (the GPT-2 pattern's shape without
# lookahead, so one regex works identically in Java and RE2): letter
# runs, digit runs, runs of other non-space symbols.
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+"


def t_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style pre-token count: how many letter/digit/symbol runs a
    subword tokenizer would see (the cheap proxy for LLM token cost —
    whitespace counting undercounts code/punctuation-heavy text)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), 0)
    return docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_bpe_distinct"),
        (F.length("text").cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")).alias(
            "chars_per_token"
        ),
    )


def t_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: stopword ratio, uniqueness, mean token length.

    Composite score = 0.3*stopword + 0.4*unique + 0.3*min(len/8, 1);
    every term is exact integer counting followed by IEEE double
    arithmetic — bit-identical across engines.
    """
    docs = load_table(spark, sf_dir, "documents").withColumn("__toks", _tokens())
    toks = F.col("__toks")
    n_tok = F.size(toks).cast("double")
    n_stop = F.size(
        F.filter(toks, lambda x: x.isin(*STOPWORDS))
    ).cast("double")
    n_uniq = F.size(F.array_distinct(toks)).cast("double")
    mean_len = (F.length(F.regexp_replace(F.col("text"), " ", "")).cast("double")) / n_tok
    stop_ratio = n_stop / n_tok
    uniq_ratio = n_uniq / n_tok
    score = (
        F.lit(0.3) * stop_ratio
        + F.lit(0.4) * uniq_ratio
        + F.lit(0.3) * F.least(mean_len / F.lit(8.0), F.lit(1.0))
    )
    return docs.select(
        "doc_id",
        F.round(stop_ratio, 9).alias("stopword_ratio"),
        F.round(uniq_ratio, 9).alias("uniq_ratio"),
        F.round(mean_len, 9).alias("mean_token_len"),
        F.round(score, 9).alias("quality_score"),
    )


def t_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID with deterministic tie-break order."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "__toks", _tokens()  # split once; five marker scans reuse it
    )
    toks = F.col("__toks")

    def marker_count(markers: tuple[str, ...]):
        # closure, not a default arg: a 2-arg lambda would be treated
        # as pyspark's (element, index) form
        return F.size(F.filter(toks, lambda x: x.isin(*markers)))

    scores = {lang: marker_count(m) for lang, m in LANG_MARKERS.items()}
    best = scores[_LANG_ORDER[0]]
    pred = F.lit(_LANG_ORDER[0])
    for lang in _LANG_ORDER[1:]:
        is_better = scores[lang] > best
        pred = F.when(is_better, F.lit(lang)).otherwise(pred)
        best = F.when(is_better, scores[lang]).otherwise(best)
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        pred.alias("predicted_lang"),
        best.cast("bigint").alias("marker_hits"),
    )


def t_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-weighted rolling fingerprint:
    ``sum((i+1) * md5_int32(token_i))`` — order-sensitive, overflow-safe
    (< 2^51 for realistic docs), reproducible in any engine."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    weighted = F.transform(toks, lambda x, i: (i + F.lit(1)).cast("bigint") * md5_int32(x))
    fp = F.aggregate(weighted, F.lit(0).cast("bigint"), lambda acc, x: acc + x)
    return docs.select("doc_id", fp.alias("fingerprint"))


TFIDF_TOP = 3


def t_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``TFIDF_TOP`` most characteristic terms per document by
    tf × (N/df) — the log-free TF-IDF variant (rank-equivalent to the
    log form for fixed N, and exactly reproducible cross-engine where
    ``ln`` is libm-dependent).

    Plan: explode → (doc,term) count → term document-frequency agg →
    broadcast N → per-doc top-k window. Shuffles only on (doc,term),
    term, and doc_id. The vocabulary relation is Zipf-small relative to
    the corpus, and per-doc window state is K rows.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_tokens()).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    total = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf").cast("double")
                * (F.col("n_docs").cast("double") / F.col("df").cast("double")),
                9,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TFIDF_TOP)
        .orderBy("doc_id", "rank")
    )


QUERIES = {
    "t_token_count": t_token_count,
    "t_bpe_tokens": t_bpe_tokens,
    "t_quality": t_quality,
    "t_langid": t_langid,
    "t_fingerprint": t_fingerprint,
    "t_tfidf_top_terms": t_tfidf_top_terms,
}

_SQL_STOP = ",".join(f"'{w}'" for w in STOPWORDS)


def _sql_marker_count(markers: tuple[str, ...]) -> str:
    inlist = ",".join(f"'{m}'" for m in markers)
    return f"len(list_filter(string_split(text,' '), x -> x IN ({inlist})))"


def _langid_sql() -> str:
    cases = []
    # mirror the when-chain: later languages win only on strictly greater
    expr_pred = f"'{_LANG_ORDER[0]}'"
    expr_best = _sql_marker_count(LANG_MARKERS[_LANG_ORDER[0]])
    for lang in _LANG_ORDER[1:]:
        cnt = _sql_marker_count(LANG_MARKERS[lang])
        expr_pred = f"CASE WHEN {cnt} > {expr_best} THEN '{lang}' ELSE {expr_pred} END"
        expr_best = f"CASE WHEN {cnt} > {expr_best} THEN {cnt} ELSE {expr_best} END"
    return f"""
        SELECT doc_id, lang AS labeled_lang,
               {expr_pred} AS predicted_lang,
               CAST({expr_best} AS BIGINT) AS marker_hits
        FROM documents
    """


ORACLES = {
    "t_bpe_tokens": f"""
        WITH t AS (
            SELECT doc_id,
                   regexp_extract_all(text, '{BPE_PATTERN}') AS toks,
                   length(text) AS n_chars
            FROM documents)
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_bpe_tokens,
               CAST(len(list_distinct(toks)) AS BIGINT) AS n_bpe_distinct,
               CAST(n_chars AS DOUBLE) / CAST(greatest(len(toks), 1) AS DOUBLE)
                   AS chars_per_token
        FROM t
    """,
    "t_token_count": """
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               len(list_distinct(string_split(text, ' '))) AS n_distinct,
               length(text) AS n_chars_actual
        FROM documents
    """,
    "t_quality": f"""
        WITH t AS (
            SELECT doc_id,
                   CAST(len(string_split(text,' ')) AS DOUBLE) AS n_tok,
                   CAST(len(list_filter(string_split(text,' '),
                        x -> x IN ({_SQL_STOP}))) AS DOUBLE) AS n_stop,
                   CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE) AS n_uniq,
                   CAST(length(replace(text,' ','')) AS DOUBLE) AS n_nonspace
            FROM documents)
        SELECT doc_id,
               round(n_stop / n_tok, 9) AS stopword_ratio,
               round(n_uniq / n_tok, 9) AS uniq_ratio,
               round(n_nonspace / n_tok, 9) AS mean_token_len,
               round(0.3 * (n_stop / n_tok) + 0.4 * (n_uniq / n_tok)
                     + 0.3 * least((n_nonspace / n_tok) / 8.0, 1.0), 9) AS quality_score
        FROM t
    """,
    "t_langid": _langid_sql(),
    "t_fingerprint": f"""
        SELECT doc_id,
               CAST(list_sum(list_transform(string_split(text,' '),
                   (x, i) -> CAST(i AS BIGINT) * {sql_md5_int32('x')})) AS BIGINT) AS fingerprint
        FROM documents
    """,
    "t_tfidf_top_terms": f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents),
        tf AS (
            SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        dfreq AS (
            SELECT term, count(*) AS df FROM tf GROUP BY 1),
        scored AS (
            SELECT tf.doc_id, tf.term,
                   CAST(tf.tf AS BIGINT) AS tf, CAST(dfreq.df AS BIGINT) AS df,
                   round(CAST(tf.tf AS DOUBLE) *
                         (CAST((SELECT count(*) FROM documents) AS DOUBLE)
                          / CAST(dfreq.df AS DOUBLE)), 9) AS score
            FROM tf JOIN dfreq USING (term)),
        ranked AS (
            SELECT *, CAST(row_number() OVER (
                PARTITION BY doc_id ORDER BY score DESC, term ASC
            ) AS BIGINT) AS rank
            FROM scored)
        SELECT doc_id, term, tf, df, score, rank
        FROM ranked WHERE rank <= {TFIDF_TOP}
        ORDER BY doc_id, rank
    """,
}
