"""Independent-model property tests for the late-round-6 operators.

The DuckDB oracles mirror each operator's algebra, so a shared
misunderstanding (wrong span-merge rule, wrong BM25 normalization,
wrong greedy step) would pass the oracle gate on both sides. These
tests compare against NAIVE pure-Python reference implementations
written from the papers' definitions — a different failure surface.

Seeded ``random`` corpora, one Spark job per test (the
test_property.py convention: many cases, one action).
"""

from __future__ import annotations

import math
import random

import pyspark.sql.functions as F


VOCAB = [f"w{i}" for i in range(12)]  # small vocab → organic collisions


def _random_corpus(rng: random.Random, n_docs: int, max_len: int):
    docs = []
    for i in range(n_docs):
        n = rng.randint(1, max_len)
        toks = [rng.choice(VOCAB) for _ in range(n)]
        docs.append((i, " ".join(toks)))
    # force structure: two docs share a long verbatim run at different
    # offsets, one doc is an exact copy of another
    run = [rng.choice(VOCAB) for _ in range(25)]
    docs.append((n_docs, " ".join(run + [f"tail{n_docs}"] * 3)))
    docs.append((n_docs + 1, " ".join(["head"] * 2 + run)))
    docs.append((n_docs + 2, docs[0][1]))
    return docs


def test_substring_dedup_matches_naive_model(spark, tmp_path, monkeypatch):
    from conduit_spark.analytics import dedup
    from conduit_spark.analytics.dedup import SUB_W, d_substring_dedup

    rng = random.Random(20260815)
    docs = _random_corpus(rng, 40, 60)

    # naive reference: count every sliding gram corpus-wide, then merge
    # each doc's duplicated positions into maximal spans by walking them
    gram_count: dict[tuple, int] = {}
    tokenized = {i: t.split(" ") for i, t in docs}
    for i, toks in tokenized.items():
        for j in range(len(toks) - SUB_W + 1):
            g = tuple(toks[j : j + SUB_W])
            gram_count[g] = gram_count.get(g, 0) + 1
    expected = {}
    for i, toks in tokenized.items():
        n = len(toks)
        if n < SUB_W:
            continue
        pos = [
            j
            for j in range(n - SUB_W + 1)
            if gram_count[tuple(toks[j : j + SUB_W])] >= 2
        ]
        if not pos:
            expected[i] = (n, 0, 0, 0)
            continue
        spans, covered, start, prev = 1, 0, pos[0], pos[0]
        for j in pos[1:]:
            if j - prev > SUB_W:  # gap: close the span
                spans += 1
                covered += prev + SUB_W - start
                start = j
            prev = j
        covered += prev + SUB_W - start
        expected[i] = (n, len(pos), spans, covered)

    df = spark.createDataFrame(docs, "doc_id: long, text: string")
    path = str(tmp_path / "documents.parquet")
    df.repartition(3).write.parquet(path)
    monkeypatch.setattr(
        dedup, "load_table", lambda sp, d, name, **kw: sp.read.parquet(path)
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_dup_grams, r.n_dup_spans, r.n_dup_tokens)
        for r in d_substring_dedup(spark, str(tmp_path)).collect()
    }
    assert got == expected
    assert any(v[1] > 0 for v in expected.values())  # non-vacuous


def test_bm25_matches_naive_model(spark, tmp_path, monkeypatch):
    from conduit_spark.analytics import text
    from conduit_spark.analytics.text import BM25_B, BM25_K1, bm25_scores

    rng = random.Random(20260816)
    docs = _random_corpus(rng, 50, 40)
    terms = ("w1", "w5", "w9")

    tokenized = {i: t.split(" ") for i, t in docs}
    n_docs = len(docs)
    avgdl = sum(len(t) for t in tokenized.values()) / n_docs
    dfreq = {
        q: sum(1 for t in tokenized.values() if q in t) for q in terms
    }
    expected = {}
    for i, toks in tokenized.items():
        score, hits = 0.0, 0
        for q in sorted(terms):  # the term-sorted fold order
            tf = toks.count(q)
            if not tf:
                continue
            hits += 1
            idf = math.log(1.0 + (n_docs - dfreq[q] + 0.5) / (dfreq[q] + 0.5))
            score += (
                idf
                * (tf * (BM25_K1 + 1.0))
                / (tf + BM25_K1 * ((1.0 - BM25_B) + BM25_B * len(toks) / avgdl))
            )
        if hits:
            expected[i] = (hits, round(score, 6))

    df = spark.createDataFrame(docs, "doc_id: long, text: string")
    path = str(tmp_path / "documents.parquet")
    df.repartition(3).write.parquet(path)
    monkeypatch.setattr(
        text, "load_table", lambda sp, d, name, **kw: sp.read.parquet(path)
    )
    got = {
        r.doc_id: (r.n_query_terms, r.bm25)
        for r in bm25_scores(
            spark.read.parquet(path), terms
        ).collect()
    }
    assert set(got) == set(expected)
    for i, (hits, score) in expected.items():
        assert got[i][0] == hits
        assert abs(got[i][1] - score) < 1e-6, i  # libm ULP tolerance


def test_mmr_matches_naive_greedy(spark, sf_dir):
    """Replicate the MMR greedy loop in numpy-free pure Python from
    the paper's definition and compare the SELECTION ORDER."""
    from conduit_spark.analytics.similarity import (
        MMR_CANDIDATES,
        MMR_K,
        MMR_LAMBDA,
        MMR_MU,
        QUERY_VEC_ID,
        s_mmr_rerank,
    )
    from conduit_spark.sources.tables import load_table

    emb = {
        r.vec_id: list(map(float, r.embedding))
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    q = emb[QUERY_VEC_ID]

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(dot / (na * nb), 9)

    rel = {i: cos(v, q) for i, v in emb.items() if i != QUERY_VEC_ID}
    cand = sorted(rel, key=lambda i: (-rel[i], i))[:MMR_CANDIDATES]
    sims = {
        (a, b): cos(emb[a], emb[b]) for a in cand for b in cand if a != b
    }
    picked = [max(cand, key=lambda i: (rel[i], -i))]
    while len(picked) < MMR_K:
        rest = [c for c in cand if c not in picked]
        scored = {
            c: round(
                MMR_LAMBDA * rel[c]
                - MMR_MU * max(sims[(c, s)] for s in picked),
                9,
            )
            for c in rest
        }
        picked.append(max(rest, key=lambda c: (scored[c], -c)))

    got = [r.vec_id for r in s_mmr_rerank(spark, sf_dir).collect()]
    assert got == picked


def _md5_int32(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_dsir_matches_naive_model(spark, tmp_path, monkeypatch):
    """Pure-Python DSIR from the paper's definition: hashed uni+bigram
    buckets, Laplace-smoothed log-likelihood-ratio weights, Gumbel keys
    from the md5 gate — selection set and weights must match."""
    from conduit_spark.analytics import sampling
    from conduit_spark.analytics.sampling import (
        DSIR_BUCKETS,
        DSIR_TARGET_SOURCES,
        smp_dsir,
    )

    rng = random.Random(20260817)
    rows = []
    for i in range(60):
        src = rng.choice(["src0", "src1", "srcA", "srcB", "srcC"])
        n = rng.randint(1, 30)
        rows.append((i, " ".join(rng.choice(VOCAB) for _ in range(n)), src))

    def grams(toks):
        out = list(toks)
        out += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        return out

    ct: dict[int, int] = {}
    cr: dict[int, int] = {}
    per_doc: dict[int, dict[int, int]] = {}
    meta = {}
    for i, text, src in rows:
        toks = text.split(" ")
        tgt = src in DSIR_TARGET_SOURCES
        meta[i] = src
        buckets = [_md5_int32(g) % DSIR_BUCKETS for g in grams(toks)]
        for b in buckets:
            (ct if tgt else cr)[b] = (ct if tgt else cr).get(b, 0) + 1
        if not tgt:
            d = per_doc.setdefault(i, {})
            for b in buckets:
                d[b] = d.get(b, 0) + 1
    tt, tr = float(sum(ct.values())), float(sum(cr.values()))
    expected = {}
    for i, d in per_doc.items():
        logw = 0.0
        for b in sorted(d):  # the bucket-sorted fold order
            lam = math.log((ct.get(b, 0) + 1.0) / (tt + DSIR_BUCKETS)) - math.log(
                (cr.get(b, 0) + 1.0) / (tr + DSIR_BUCKETS)
            )
            logw += d[b] * lam
        u = (_md5_int32(str(i)) + 0.5) / 2**32
        expected[i] = (round(logw, 6), round(logw + (-math.log(-math.log(u))), 6))

    df = spark.createDataFrame(rows, "doc_id: long, text: string, source: string")
    path = str(tmp_path / "documents.parquet")
    df.repartition(3).write.parquet(path)
    monkeypatch.setattr(
        sampling, "load_table", lambda sp, d, name, **kw: sp.read.parquet(path)
    )
    got = {
        r.doc_id: (r.log_weight, r.gumbel_key, r.source)
        for r in smp_dsir(spark, str(tmp_path)).collect()
    }
    assert set(got) == set(expected)  # DSIR_K=64 > raw docs: all kept
    for i, (lw, gk) in expected.items():
        assert abs(got[i][0] - lw) < 1e-6 and abs(got[i][1] - gk) < 1e-6, i
        assert got[i][2] == meta[i]


def test_ppl_buckets_matches_naive_model(spark, tmp_path, monkeypatch):
    """Pure-Python CCNet bucketing: per-lang unigram LM scores, 3-decimal
    bins, integer cumulative tercile boundaries — per-(lang, bucket)
    doc counts must match exactly."""
    from collections import defaultdict

    from conduit_spark.analytics import curation
    from conduit_spark.analytics.curation import cur_ppl_buckets

    rng = random.Random(20260818)
    rows = []
    for i in range(80):
        lang = rng.choice(["aa", "bb", "cc"])
        n = rng.randint(1, 25)
        rows.append((i, " ".join(rng.choice(VOCAB) for _ in range(n)), lang))

    corpus: dict[tuple, int] = defaultdict(int)
    totals: dict[str, int] = defaultdict(int)
    for _, text, lang in rows:
        for t in text.split(" "):
            corpus[(lang, t)] += 1
            totals[lang] += 1
    binned = defaultdict(list)  # lang -> [(bin, n_tokens)]
    for i, text, lang in rows:
        toks = text.split(" ")
        per_tok = defaultdict(int)
        for t in toks:
            per_tok[t] += 1
        logp = 0.0
        for t in sorted(per_tok):  # tok-sorted fold
            logp += per_tok[t] * math.log(corpus[(lang, t)] / totals[lang])
        score = round(logp / len(toks), 6)
        binned[lang].append((math.floor(score * 1000.0), len(toks)))
    expected = defaultdict(lambda: [0, 0])  # (lang,bucket) -> [docs, toks]
    for lang, items in binned.items():
        n = len(items)
        hist = defaultdict(int)
        for b, _ in items:
            hist[b] += 1
        cum, label = 0, {}
        for b in sorted(hist, reverse=True):
            cum += hist[b]
            label[b] = (
                "head" if 3 * cum <= n else "middle" if 3 * cum <= 2 * n else "tail"
            )
        for b, ntok in items:
            e = expected[(lang, label[b])]
            e[0] += 1
            e[1] += ntok

    df = spark.createDataFrame(rows, "doc_id: long, text: string, lang: string")
    path = str(tmp_path / "documents.parquet")
    df.repartition(3).write.parquet(path)
    monkeypatch.setattr(
        curation, "load_table", lambda sp, d, name, **kw: sp.read.parquet(path)
    )
    got = {
        (r.lang, r.bucket): [r.n_docs, r.n_tokens]
        for r in cur_ppl_buckets(spark, str(tmp_path)).collect()
    }
    assert got == dict(expected)


def test_incremental_dedup_matches_naive_model(spark, tmp_path, monkeypatch):
    """Full pure-Python reimplementation of the incremental pipeline —
    md5 batch gate, shingle minhash signatures, banded buckets with the
    existing-side hot cap, new x existing candidates, exact-Jaccard
    verify, best-match selection — compared verdict-for-verdict. Also
    independently validates the LSH machinery shared with
    d_minhash_lsh_pairs."""
    from conduit_spark.analytics import dedup
    from conduit_spark.analytics.dedup import (
        INCR_BATCH_MOD,
        JACCARD_THRESHOLD,
        LSH_BANDS,
        LSH_ROWS,
        MINHASH_BUCKET_CAP,
        SHINGLE_W,
        _PARAMS,
        d_incremental,
    )
    from conduit_spark.functions.hashing import MINHASH_PRIME

    rng = random.Random(20260819)
    docs = _random_corpus(rng, 60, 50)
    # ids 1 and 3 hash into the new batch (md5 gate); pin every verdict
    # class: doc 1 = exact copy of existing doc 0, doc 3 = near-dup of
    # doc 0 (two appended tokens), the other new ids stay random
    text0 = " ".join(rng.choice(VOCAB) for _ in range(30))
    overrides = {0: text0, 1: text0, 3: text0 + " zz1 zz2"}
    docs = [(i, overrides.get(i, t)) for i, t in docs]

    is_new = {i: _md5_int32(str(i)) % INCR_BATCH_MOD == 0 for i, _ in docs}
    assert is_new[1] and is_new[3] and not is_new[0]
    shingles = {}
    for i, text in docs:
        toks = text.split(" ")
        if len(toks) < SHINGLE_W:
            continue
        shingles[i] = {
            _md5_int32(" ".join(toks[j : j + SHINGLE_W]))
            for j in range(len(toks) - SHINGLE_W + 1)
        }
    sigs = {
        i: [min((a * x + b) % MINHASH_PRIME for x in xs) for a, b in _PARAMS]
        for i, xs in shingles.items()
    }
    buckets = {
        i: [
            (b, ":".join(str(sig[b * LSH_ROWS + r]) for r in range(LSH_ROWS)))
            for b in range(LSH_BANDS)
        ]
        for i, sig in sigs.items()
    }
    occupancy: dict[tuple, int] = {}
    for i, bs in buckets.items():
        if not is_new[i]:
            for key in bs:
                occupancy[key] = occupancy.get(key, 0) + 1
    hot = {k for k, n in occupancy.items() if n > MINHASH_BUCKET_CAP}
    cand = set()
    for i, bs in buckets.items():
        if not is_new[i]:
            continue
        for key in set(bs) - hot:
            for j, bs2 in buckets.items():
                if not is_new[j] and key in set(bs2) - hot:
                    cand.add((i, j))
    import hashlib

    text_of = dict(docs)
    old_hash: dict[str, int] = {}
    for i, text in docs:
        if not is_new[i]:
            h = hashlib.md5(text.encode()).hexdigest()
            old_hash[h] = min(old_hash.get(h, i), i)
    expected = {}
    for i, text in docs:
        if not is_new[i]:
            continue
        h = hashlib.md5(text.encode()).hexdigest()
        if h in old_hash:
            expected[i] = ("exact_dup", old_hash[h], -1.0)
            continue
        best = None
        for (a, b) in cand:
            if a != i:
                continue
            inter = len(shingles[i] & shingles[b])
            jac = round(inter / len(shingles[i] | shingles[b]), 9)
            if jac >= JACCARD_THRESHOLD:
                if best is None or (jac, -b) > (best[1], -best[0]):
                    best = (b, jac)
        if best:
            expected[i] = ("near_dup", best[0], best[1])
        else:
            expected[i] = ("unique", -1, -1.0)

    df = spark.createDataFrame(docs, "doc_id: long, text: string")
    path = str(tmp_path / "documents.parquet")
    df.repartition(3).write.parquet(path)
    monkeypatch.setattr(
        dedup, "load_table", lambda sp, d, name, **kw: sp.read.parquet(path)
    )
    got = {
        r.doc_id: (r.verdict, r.match_id, r.jaccard)
        for r in d_incremental(spark, str(tmp_path)).collect()
    }
    assert got == expected
    # every verdict class exercised
    assert {v[0] for v in expected.values()} == {"exact_dup", "near_dup", "unique"}
    assert expected[1][0] == "exact_dup" and expected[3][0] == "near_dup"


def test_bpe_train_matches_naive_model(spark, tmp_path, monkeypatch):
    """Classic BPE trainer (Sennrich et al. 2016) in pure Python —
    weighted pair counts over the word vocabulary, greedy left-to-right
    single-scan merge application — must produce the identical merge
    table, including inside same-char runs (the canonical-greedy case
    the wrapped-replace representation exists to get right)."""
    from collections import Counter

    from conduit_spark.analytics import text
    from conduit_spark.analytics.text import BPE_MERGES, t_bpe_train

    rng = random.Random(20260820)
    docs = _random_corpus(rng, 40, 30)
    # inject same-char runs so odd-run greedy segmentation is exercised
    docs += [(900, "aaaaa aaa bbbb"), (901, "aaaaa aaaaa")]

    vocab = Counter()
    for _, t in docs:
        for w in t.split(" "):
            if w and all(c.isalnum() and ord(c) < 128 for c in w):
                vocab[w] += 1
    seqs = {w: list(w) for w in vocab}
    expected = []
    for rank in range(1, BPE_MERGES + 1):
        pairs = Counter()
        for w, c in vocab.items():
            s = seqs[w]
            for x, y in zip(s, s[1:]):
                pairs[(x, y)] += c
        (a, b), cnt = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        expected.append((rank, a, b, cnt))
        for w in seqs:
            s, new, i = seqs[w], [], 0
            while i < len(s):  # canonical greedy single scan
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    new.append(a + b)
                    i += 2
                else:
                    new.append(s[i])
                    i += 1
            seqs[w] = new

    df = spark.createDataFrame(docs, "doc_id: long, text: string")
    path = str(tmp_path / "documents.parquet")
    df.repartition(3).write.parquet(path)
    monkeypatch.setattr(
        text, "load_table", lambda sp, d, name, **kw: sp.read.parquet(path)
    )
    got = [
        (r.merge_rank, r.left_sym, r.right_sym, r.pair_count)
        for r in t_bpe_train(spark, str(tmp_path)).collect()
    ]
    assert got == expected


def test_bpe_encode_matches_naive_model(spark, tmp_path, monkeypatch):
    """Encoding with the learned merges: per-doc token counts must
    equal applying the pure-Python trainer's final word segmentations
    (out-of-vocab words count as one token)."""
    from collections import Counter

    from conduit_spark.analytics import text
    from conduit_spark.analytics.text import BPE_MERGES, t_bpe_encode

    rng = random.Random(20260821)
    docs = _random_corpus(rng, 30, 25)
    docs += [(900, "aaaaa aaa !!punct!! bbbb")]  # OOV word in play

    vocab = Counter()
    for _, t in docs:
        for w in t.split(" "):
            if w and all(c.isalnum() and ord(c) < 128 for c in w):
                vocab[w] += 1
    seqs = {w: list(w) for w in vocab}
    for _ in range(BPE_MERGES):
        pairs = Counter()
        for w, c in vocab.items():
            s = seqs[w]
            for x, y in zip(s, s[1:]):
                pairs[(x, y)] += c
        (a, b), _cnt = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        for w in seqs:
            s, new, i = seqs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    new.append(a + b)
                    i += 2
                else:
                    new.append(s[i])
                    i += 1
            seqs[w] = new
    expected = {}
    for i, t in docs:
        words = t.split(" ")
        n_tok = sum(len(seqs[w]) if w in seqs else 1 for w in words)
        expected[i] = (len(words), n_tok)

    df = spark.createDataFrame(docs, "doc_id: long, text: string")
    path = str(tmp_path / "documents.parquet")
    df.repartition(3).write.parquet(path)
    monkeypatch.setattr(
        text, "load_table", lambda sp, d, name, **kw: sp.read.parquet(path)
    )
    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in t_bpe_encode(spark, str(tmp_path)).collect()
    }
    assert got == expected


def test_zorder_matches_naive_model(spark, tmp_path, monkeypatch):
    """Pure-Python Morton interleave + zone-map pruning over a seeded
    random orders table — per-layout shard counts, pruned counts, and
    scanned rows must match exactly."""
    import datetime

    from conduit_spark.analytics import curation
    from conduit_spark.analytics.curation import (
        ZORDER_BITS,
        ZORDER_SHARDS,
        ZQ_C_LO,
        ZQ_C_HI,
        ZQ_D_LO,
        ZQ_D_HI,
        _Z_SHIFT,
        cur_zorder,
    )

    rng = random.Random(20260822)
    epoch = datetime.datetime(1995, 1, 1)
    rows = []
    for k in range(800):
        c = rng.randint(0, 1500)
        d = rng.randint(0, 2400)
        rows.append((k, c, epoch + datetime.timedelta(days=d)))

    def morton(c, d):
        z = 0
        for i in range(ZORDER_BITS):
            z += ((c >> i) & 1) << (2 * i)
            z += ((d >> i) & 1) << (2 * i + 1)
        return z

    shards = {}  # (layout, shard) -> [min_c, max_c, min_d, max_d, n]
    for k, c, dt in rows:
        d = (dt - epoch).days
        for layout, shard in (
            ("naive", _md5_int32(str(k)) % ZORDER_SHARDS),
            ("zorder", morton(c, d) >> _Z_SHIFT),
        ):
            e = shards.setdefault((layout, shard), [c, c, d, d, 0])
            e[0], e[1] = min(e[0], c), max(e[1], c)
            e[2], e[3] = min(e[2], d), max(e[3], d)
            e[4] += 1
    expected = {}
    for (layout, _), (mc, xc, md, xd, n) in shards.items():
        e = expected.setdefault(layout, [0, 0, 0, 0])
        pruned = xc < ZQ_C_LO or mc > ZQ_C_HI or xd < ZQ_D_LO or md > ZQ_D_HI
        e[0] += 1
        e[1] += 1 if pruned else 0
        e[2] += 0 if pruned else n
        e[3] += n

    df = spark.createDataFrame(
        rows, "o_orderkey: long, o_custkey: long, o_orderdate: timestamp"
    )
    path = str(tmp_path / "orders.parquet")
    df.repartition(3).write.parquet(path)
    monkeypatch.setattr(
        curation, "load_table", lambda sp, d, name, **kw: sp.read.parquet(path)
    )
    got = {
        r.layout: [r.n_shards, r.n_pruned, r.rows_scanned, r.rows_total]
        for r in cur_zorder(spark, str(tmp_path)).collect()
    }
    assert got == expected
    assert expected["zorder"][1] > 0  # the z layout actually prunes


def test_lang_temperature_matches_naive_model(spark, tmp_path, monkeypatch):
    """Pure-Python alpha-smoothing over a seeded corpus: shares, boosts,
    and budgeted token draws must match to the rounding contract."""
    from conduit_spark.analytics import curation
    from conduit_spark.analytics.curation import (
        LANG_TEMP_ALPHA,
        LANG_TEMP_BUDGET,
        cur_lang_temperature,
    )

    rng = random.Random(20260823)
    rows = []
    for i in range(90):
        lang = rng.choice(["aa", "bb", "cc", "dd"])
        n = rng.randint(1, 40)
        rows.append((i, " ".join(rng.choice(VOCAB) for _ in range(n)), lang))

    toks = {}
    for _, text, lang in rows:
        toks[lang] = toks.get(lang, 0) + len(text.split(" "))
    total = float(sum(toks.values()))
    p = {lang: n / total for lang, n in toks.items()}
    pw = {lang: p[lang] ** LANG_TEMP_ALPHA for lang in p}
    z = sum(pw[lang] for lang in sorted(pw))  # lang-sorted fold order
    expected = {
        lang: (
            round(p[lang], 9),
            round(pw[lang] / z, 9),
            round(pw[lang] / z / p[lang], 9),
            round(pw[lang] / z * LANG_TEMP_BUDGET * total, 6),
        )
        for lang in p
    }

    df = spark.createDataFrame(rows, "doc_id: long, text: string, lang: string")
    path = str(tmp_path / "documents.parquet")
    df.repartition(3).write.parquet(path)
    monkeypatch.setattr(
        curation, "load_table", lambda sp, d, name, **kw: sp.read.parquet(path)
    )
    got = {
        r.lang: (r.nat_share, r.temp_share, r.boost, r.mix_tokens)
        for r in cur_lang_temperature(spark, str(tmp_path)).collect()
    }
    assert set(got) == set(expected)
    for lang in expected:
        for a, b in zip(got[lang], expected[lang]):
            assert abs(a - b) < 1e-6, lang  # pow/ULP tolerance


def test_word_grams_matches_naive_model(spark):
    """The bound-once word_grams expression (round-11 rewrite: token
    array captured via the 1-element-array lambda trick) must produce
    EXACTLY the naive Python sliding window for every k — this is the
    hottest scan in the dedup/decontamination family, so a silent
    off-by-one here would corrupt a dozen oracle families at once.
    Edge cases: len == k (one gram), repeated tokens, single doc."""
    from conduit_spark.analytics.dedup import word_grams

    rng = random.Random(411)
    docs = _random_corpus(rng, 30, 40)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for k in (2, 4, 8, 16):
        got = {
            r.doc_id: list(r.grams)
            for r in df.filter(
                F.size(F.split(F.col("text"), " ")) >= k
            ).select("doc_id", word_grams(k).alias("grams")).collect()
        }
        for doc_id, text in docs:
            toks = text.split(" ")
            if len(toks) < k:
                assert doc_id not in got
                continue
            expect = [
                " ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)
            ]
            assert got[doc_id] == expect, (doc_id, k)


def test_span_expr_matches_naive_model(spark):
    """The d_span_dedup span expression (round-11 bound-once rewrite)
    must produce exactly the naive non-overlapping SPAN_W-word windows
    — same guard as test_word_grams_matches_naive_model for the other
    rewritten hot expression. Edge cases: len == SPAN_W (one span),
    len % SPAN_W != 0 (tail dropped), len < SPAN_W (filtered out)."""
    import pyspark.sql.functions as FF

    from conduit_spark.analytics.dedup import SPAN_W

    rng = random.Random(1105)
    docs = _random_corpus(rng, 30, 45)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    spans = FF.expr(
        f"transform(array(split(text, ' ')), toks ->"
        f" transform(sequence(1, size(toks) div {SPAN_W}),"
        f" j -> array_join(slice(toks, (j - 1) * {SPAN_W} + 1,"
        f" {SPAN_W}), ' ')))[0]"
    )
    got = {
        r.doc_id: list(r.spans)
        for r in df.filter(
            FF.size(FF.split(FF.col("text"), " ")) >= SPAN_W
        ).select("doc_id", spans.alias("spans")).collect()
    }
    for doc_id, text in docs:
        toks = text.split(" ")
        if len(toks) < SPAN_W:
            assert doc_id not in got
            continue
        expect = [
            " ".join(toks[i * SPAN_W:(i + 1) * SPAN_W])
            for i in range(len(toks) // SPAN_W)
        ]
        assert got[doc_id] == expect, doc_id
