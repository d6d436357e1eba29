"""Web-corpus curation operators (beyond the reference).

The stages a Common-Crawl-scale pretraining pipeline runs before any
model sees a byte — URL canonicalization + dedup (the very first
dedup pass in CCNet/RefinedWeb-style pipelines), per-source
boilerplate span removal (the paragraph-hash dedup of CCNet, mapped
to word-3-gram spans because the synthetic documents are single-line),
and Gopher-style rule filtering (Rae et al. 2021 §A1.1 quality gates).

The reference has no analog (its closest is the AI-pipeline processor
family, docs/design-documents/20260724-ai-pipeline-components.md);
these complement `analytics.text` / `analytics.dedup` /
`analytics.curation` and follow the same contract: built-in-function
column algebra only, exact DuckDB oracles, SF-linear plans.

Scale posture (100 TB):
- `d_url_dedup`: per-row regexp/array expressions (narrow), one
  hash-agg on the canonical-URL key + one equi-join back on that same
  key — AQE coalesces both exchanges; no window over the corpus.
- `cur_boilerplate`: explode is narrow and SF-linear; the
  (source, gram) document-frequency agg has map-side partials; the
  boiler-flag join is a shuffle equi-join on (source, gram) — the
  frequent-gram side is corpus-dependent so it is NOT broadcast.
- `t_gopher_rules`: single scan, zero shuffles — every rule is a
  column expression; threshold comparisons are integer-scaled
  (``5*uniq >= 2*n`` not ``uniq/n >= 0.4``) so engine float rounding
  can never flip a flag.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from conduit_spark.analytics import ordered_result
from conduit_spark.analytics.dedup import word_grams
from conduit_spark.analytics.text import STOPWORDS
from conduit_spark.sources.tables import load_table

# query-string parameter prefixes dropped by URL canonicalization
TRACKING_PREFIXES = ("utm_", "fbclid=", "gclid=", "ref=")

BOILER_K = 3  # boilerplate span width (word 3-grams)
BOILER_DF = 2  # a gram seen in >= this many docs of one source is boilerplate

GOPHER_MIN_WORDS = 15
GOPHER_MAX_WORDS = 400
GOPHER_MIN_MEAN_LEN = 4.0
GOPHER_MAX_MEAN_LEN = 4.8
GOPHER_MIN_STOPWORDS = 2


def canonical_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL, as one expression.

    lowercases scheme+host, strips the fragment, strips default ports
    (http:80 / https:443), strips trailing path slashes, drops
    tracking query params (``utm_*``/``fbclid``/``gclid``/``ref``) and
    sorts the survivors so param order never splits a dedup group.
    Pure column algebra — usable on any string column, not just the
    fixture URLs below.
    """
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z]+)://", 1))
    hostport = F.regexp_extract(url, r"^[A-Za-z]+://([^/?#]+)", 1)
    host = F.lower(F.regexp_extract(hostport, r"^([^:]+)", 1))
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    path = F.regexp_extract(url, r"^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    qs = F.regexp_extract(url, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(qs, "&"),
        lambda p: (p != "")
        & ~p.startswith(TRACKING_PREFIXES[0])
        & ~p.startswith(TRACKING_PREFIXES[1])
        & ~p.startswith(TRACKING_PREFIXES[2])
        & ~p.startswith(TRACKING_PREFIXES[3]),
    )
    canon_q = F.array_join(F.array_sort(params), "&")
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when((port != "") & ~default_port, F.concat(F.lit(":"), port)).otherwise(
            F.lit("")
        ),
        F.regexp_replace(path, "/+$", ""),
        F.when(canon_q != "", F.concat(F.lit("?"), canon_q)).otherwise(F.lit("")),
    )


def _fixture_url() -> Column:
    """Deterministic messy URL per document (the test-data has no URL
    column, so one is derived from (doc_id, source, lang) — mixed-case
    scheme/host, default + explicit ports, trailing slashes, shuffled
    query-param order, tracking junk, fragments)."""
    d = F.col("doc_id")
    qid = (d % 25).cast("string")
    return F.concat(
        F.when(d % 3 == 0, F.lit("HTTP")).otherwise(F.lit("https")),
        F.lit("://"),
        F.when(d % 2 == 0, F.lit("WWW.")).otherwise(F.lit("www.")),
        F.col("source"),
        F.when(d % 4 < 2, F.lit(".Example.COM")).otherwise(F.lit(".example.com")),
        F.when(d % 7 == 0, F.lit(":8080"))
        .when((d % 5 == 0) & (d % 3 == 0), F.lit(":80"))
        .when(d % 5 == 0, F.lit(":443"))
        .otherwise(F.lit("")),
        F.lit("/p/"),
        (d % 40).cast("string"),
        F.when(d % 4 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(
            d % 2 == 0,
            F.concat(F.lit("?utm_source=feed&id="), qid, F.lit("&lang="), F.col("lang")),
        ).otherwise(
            F.concat(F.lit("?lang="), F.col("lang"), F.lit("&id="), qid, F.lit("&gclid=1x"))
        ),
        F.when(d % 6 == 0, F.lit("#sec")).otherwise(F.lit("")),
    )


def d_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup: per document, its canonical URL,
    whether it is the kept representative (min doc_id in its group),
    and the group size.

    One hash-agg on canonical_url + one equi-join back on the same
    key; the second exchange reuses the first's partitioning under
    AQE. No window function over the corpus.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", canonical_url(_fixture_url()).alias("canonical_url")
    )
    groups = docs.groupBy("canonical_url").agg(
        F.min("doc_id").alias("__keep"),
        F.count(F.lit(1)).alias("n_dupes"),
    )
    out = docs.join(groups, "canonical_url").select(
        "doc_id",
        "canonical_url",
        (F.col("doc_id") == F.col("__keep")).cast("int").alias("is_canonical"),
        F.col("n_dupes").cast("bigint").alias("n_dupes"),
    )
    return ordered_result(out, "doc_id")


def cur_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source boilerplate span removal stats (CCNet-style).

    A word-5-gram appearing in >= BOILER_DF distinct documents of the
    same source is boilerplate (nav bars, footers, disclaimers — the
    spans that repeat across a site; width/threshold tuned to the
    synthetic corpus, where cross-doc 5-gram repeats are absent).
    Unlike ``d_span_dedup`` (which
    keeps one winner per duplicated span) this removes ALL copies —
    boilerplate is noise, not content. Output: per-doc gram counts,
    boilerplate-gram counts, and an integer-exact keep flag
    (``2*boiler <= total``, no float threshold).

    Round-7 shape fixes (4.2s → 1.15s warm at sf0.1): the gram
    relation feeds BOTH the document-frequency agg and the stats join
    — it is persisted so the split+explode runs once, not twice; and
    grams shuffle as 60-bit md5 hashes (``md5_int60``, the CCNet
    trick), not ~50-byte 5-gram strings — the DF-agg and join exchange
    8-byte keys. The oracle hashes identically, so a collision (none
    expected below ~2^30 grams) conflates the same pair in both
    engines and the comparison stays exact.
    """
    from conduit_spark.functions.hashing import md5_int60

    docs = load_table(spark, sf_dir, "documents")
    # r14 restructure (same outputs, proven oracle-exact): grams hash
    # into a per-doc in-row array first, so
    # - the DF agg explodes the per-doc DISTINCT grams and counts
    #   plain rows — the old countDistinct's two-phase expand is gone;
    # - per-doc n_grams is ``size(hs)`` in-row — the old corpus-sized
    #   count agg disappears;
    # - the boilerplate gram set is tiny by construction, so the
    #   instance recount is a BROADCAST join + a boiler-rows-only agg
    #   instead of a corpus-sized shuffle join.
    # (A first cut also computed per-distinct-gram multiplicities
    # in-row; the O(distinct x len) array scan cost MORE than the
    # exchange it saved — A/B'd and dropped, guide §1.1.)
    hs = F.transform(word_grams(BOILER_K), lambda g: md5_int60(g))
    base = (
        docs.filter(F.size(F.split(F.col("text"), " ")) >= BOILER_K)
        .select("doc_id", "source", hs.alias("hs"))
        .localCheckpoint()  # not persist: checkpoint blocks are freed
        # when the DataFrame is GC'd, while the old persist() was never
        # unpersisted and accumulated cached partitions across the
        # gate+bench+scale_probe invocations of one session (ADVICE r7)
    )
    boiler = (
        base.select(
            "source", F.explode(F.array_distinct("hs")).alias("g")
        )  # one row per (doc, distinct gram): plain count IS the DF
        .groupBy("source", "g")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") >= BOILER_DF)
        .select("source", "g")
    )
    nb = (
        base.select("doc_id", "source", F.explode("hs").alias("g"))
        .join(F.broadcast(boiler), ["source", "g"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_boiler"))
    )
    ng = base.select("doc_id", F.size("hs").cast("bigint").alias("n_grams"))
    out = (
        docs.select("doc_id")
        .join(ng, "doc_id", "left")
        .join(nb, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
            F.coalesce("n_boiler", F.lit(0)).cast("bigint").alias("n_boiler_grams"),
            (
                F.lit(2) * F.coalesce("n_boiler", F.lit(0))
                <= F.coalesce("n_grams", F.lit(0))
            )
            .cast("int")
            .alias("keep"),
        )
    )
    return ordered_result(out, "doc_id")


def t_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule gates (Rae et al. 2021 §A1.1, thresholds
    adapted to the fixture corpus): word-count bounds, mean-word-length
    bounds, minimum stopword hits, unique-word fraction, alphabetic-word
    fraction — plus the conjunctive ``passes`` gate.

    Single scan, zero shuffles. Ratio rules compare integer-scaled
    counts (``5*uniq >= 2*n``) so no float rounding can flip a flag;
    the one double comparison (mean word length) is an exact IEEE
    division identical in both engines.
    """
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "__toks", F.split(F.col("text"), " ")
    )
    toks = F.col("__toks")
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    n_uniq = F.size(F.array_distinct(toks))
    n_alpha = F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]")))
    mean_len = F.length(F.regexp_replace(F.col("text"), " ", "")).cast(
        "double"
    ) / n_tok.cast("double")
    f_words = ((n_tok >= GOPHER_MIN_WORDS) & (n_tok <= GOPHER_MAX_WORDS)).cast("int")
    f_mean = (
        (mean_len >= GOPHER_MIN_MEAN_LEN) & (mean_len <= GOPHER_MAX_MEAN_LEN)
    ).cast("int")
    f_stop = (n_stop >= GOPHER_MIN_STOPWORDS).cast("int")
    f_uniq = (n_uniq * 5 >= n_tok * 2).cast("int")  # uniq/n >= 0.4, exact
    f_alpha = (n_alpha * 10 >= n_tok * 7).cast("int")  # alpha/n >= 0.7, exact
    return docs.select(
        "doc_id",
        n_tok.cast("bigint").alias("n_tokens"),
        f_words.alias("f_word_count"),
        f_mean.alias("f_mean_word_len"),
        f_stop.alias("f_stopwords"),
        f_uniq.alias("f_unique_frac"),
        f_alpha.alias("f_alpha_frac"),
        (f_words * f_mean * f_stop * f_uniq * f_alpha).alias("passes"),
    )


QUERIES = {
    "d_url_dedup": d_url_dedup,
    "cur_boilerplate": cur_boilerplate,
    "t_gopher_rules": t_gopher_rules,
}

_CANON_PARAM_FILTER = (
    "list_filter(string_split(qs, '&'), p -> p <> '' "
    "AND NOT starts_with(p, 'utm_') AND NOT starts_with(p, 'fbclid=') "
    "AND NOT starts_with(p, 'gclid=') AND NOT starts_with(p, 'ref='))"
)

_URL_DEDUP_SQL = f"""
    WITH raw AS (
        SELECT doc_id,
               (CASE WHEN doc_id % 3 = 0 THEN 'HTTP' ELSE 'https' END)
               || '://'
               || (CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE 'www.' END)
               || source
               || (CASE WHEN doc_id % 4 < 2 THEN '.Example.COM'
                        ELSE '.example.com' END)
               || (CASE WHEN doc_id % 7 = 0 THEN ':8080'
                        WHEN doc_id % 5 = 0 AND doc_id % 3 = 0 THEN ':80'
                        WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END)
               || '/p/' || CAST(doc_id % 40 AS VARCHAR)
               || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
               || (CASE WHEN doc_id % 2 = 0
                        THEN '?utm_source=feed&id=' || CAST(doc_id % 25 AS VARCHAR)
                             || '&lang=' || lang
                        ELSE '?lang=' || lang || '&id='
                             || CAST(doc_id % 25 AS VARCHAR) || '&gclid=1x' END)
               || (CASE WHEN doc_id % 6 = 0 THEN '#sec' ELSE '' END) AS url
        FROM documents),
    parts AS (
        SELECT doc_id,
               lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
               regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1) AS hostport,
               regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1) AS path,
               regexp_extract(url, '\\?([^#]*)', 1) AS qs
        FROM raw),
    canon AS (
        SELECT doc_id,
               scheme || '://'
               || lower(regexp_extract(hostport, '^([^:]+)', 1))
               || (CASE WHEN regexp_extract(hostport, ':([0-9]+)$', 1) <> ''
                         AND NOT ((scheme = 'http'
                                   AND regexp_extract(hostport, ':([0-9]+)$', 1) = '80')
                              OR (scheme = 'https'
                                   AND regexp_extract(hostport, ':([0-9]+)$', 1) = '443'))
                        THEN ':' || regexp_extract(hostport, ':([0-9]+)$', 1)
                        ELSE '' END)
               || regexp_replace(path, '/+$', '')
               || (CASE WHEN array_to_string(list_sort({_CANON_PARAM_FILTER}), '&') <> ''
                        THEN '?' || array_to_string(list_sort({_CANON_PARAM_FILTER}), '&')
                        ELSE '' END) AS canonical_url
        FROM parts),
    groups AS (
        SELECT canonical_url, min(doc_id) AS keep_id,
               CAST(count(*) AS BIGINT) AS n_dupes
        FROM canon GROUP BY 1)
    SELECT c.doc_id, c.canonical_url,
           CASE WHEN c.doc_id = g.keep_id THEN 1 ELSE 0 END AS is_canonical,
           g.n_dupes
    FROM canon c JOIN groups g USING (canonical_url)
    ORDER BY c.doc_id
"""

_BOILER_SQL = f"""
    WITH grams AS (
        SELECT doc_id, source,
               CAST('0x' || substr(md5(unnest(list_transform(
                   generate_series(1, len(string_split(text, ' ')) - {BOILER_K - 1}),
                   i -> array_to_string(
                       string_split(text, ' ')[i:i+{BOILER_K - 1}], ' ')
               ))), 1, 15) AS BIGINT) AS g
        FROM documents
        WHERE len(string_split(text, ' ')) >= {BOILER_K}),
    boiler AS (
        SELECT source, g FROM grams
        GROUP BY source, g
        HAVING count(DISTINCT doc_id) >= {BOILER_DF}),
    stats AS (
        SELECT gr.doc_id,
               CAST(count(*) AS BIGINT) AS n_grams,
               CAST(sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_boiler
        FROM grams gr
        LEFT JOIN boiler b ON b.source = gr.source AND b.g = gr.g
        GROUP BY gr.doc_id)
    SELECT d.doc_id,
           CAST(coalesce(s.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(coalesce(s.n_boiler, 0) AS BIGINT) AS n_boiler_grams,
           CASE WHEN 2 * coalesce(s.n_boiler, 0) <= coalesce(s.n_grams, 0)
                THEN 1 ELSE 0 END AS keep
    FROM documents d LEFT JOIN stats s USING (doc_id)
    ORDER BY d.doc_id
"""

_STOP_LIST = ", ".join(f"'{w}'" for w in STOPWORDS)

_GOPHER_SQL = f"""
    WITH base AS (
        SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
    m AS (
        SELECT doc_id,
               len(t) AS n_tok,
               len(list_filter(t, x -> list_contains([{_STOP_LIST}], x))) AS n_stop,
               len(list_distinct(t)) AS n_uniq,
               len(list_filter(t, x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha,
               CAST(length(replace(text, ' ', '')) AS DOUBLE)
                   / CAST(len(t) AS DOUBLE) AS mean_len
        FROM base),
    f AS (
        SELECT doc_id,
               CAST(n_tok AS BIGINT) AS n_tokens,
               CASE WHEN n_tok >= {GOPHER_MIN_WORDS}
                     AND n_tok <= {GOPHER_MAX_WORDS} THEN 1 ELSE 0 END AS f_word_count,
               CASE WHEN mean_len >= {GOPHER_MIN_MEAN_LEN}
                     AND mean_len <= {GOPHER_MAX_MEAN_LEN} THEN 1 ELSE 0 END
                   AS f_mean_word_len,
               CASE WHEN n_stop >= {GOPHER_MIN_STOPWORDS} THEN 1 ELSE 0 END
                   AS f_stopwords,
               CASE WHEN n_uniq * 5 >= n_tok * 2 THEN 1 ELSE 0 END AS f_unique_frac,
               CASE WHEN n_alpha * 10 >= n_tok * 7 THEN 1 ELSE 0 END AS f_alpha_frac
        FROM m)
    SELECT doc_id, n_tokens, f_word_count, f_mean_word_len, f_stopwords,
           f_unique_frac, f_alpha_frac,
           f_word_count * f_mean_word_len * f_stopwords * f_unique_frac
               * f_alpha_frac AS passes
    FROM f ORDER BY doc_id
"""

ORACLES = {
    "d_url_dedup": _URL_DEDUP_SQL,
    "cur_boilerplate": _BOILER_SQL,
    "t_gopher_rules": _GOPHER_SQL,
}
