"""Randomized sweeps for the text-analysis primitives vs Python references.

These expressions underpin dedup shingles, chunking, vocab, quality
scoring, and language ID; until now they were verified only through the
entry queries' DuckDB oracles (written by the same author — correlated-
interpretation risk).  The references here are independent Python
implementations of the documented semantics.
"""

from __future__ import annotations

import random
import re as pyre

import pytest
from pyspark.sql import functions as F

from remote_tsdb_clickhouse_spark.functions.textfuncs import (
    BPE_ISH_PATTERN,
    STOPWORDS,
    langid_expr,
    nonascii_ratio,
    punct_ratio,
    token_count_bpe_ish,
    tokens,
)

PIECES = [
    "Hello", "WORLD", "the", "der", "le", "el", "und", "et", "y",
    "a1b2", "42", "7", "...", "!!!", "(x)", "a-b", "e@d",
    "héllo", "naïve", "日本語テキスト", "中文内容测试", "", " ", "\t", "\n",
    "foo,bar;baz", "x" * 40, "1.2.3", "the the the",
]


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(43)
    rows = [(d, " ".join(rng.choice(PIECES) for _ in range(rng.randint(0, 20))))
            for d in range(150)]
    return rows, spark.createDataFrame(rows, "doc_id LONG, text STRING")


def _py_tokens(t):
    return pyre.sub(r"[^a-zA-Z0-9 ]", " ", t).lower().split()


def test_tokens_randomized_sweep(corpus):
    rows, df = corpus
    got = {r.doc_id: r.toks for r in
           df.select("doc_id", tokens("text").alias("toks")).collect()}
    for d, t in rows:
        assert got[d] == _py_tokens(t), (t, got[d], _py_tokens(t))


def test_bpe_ish_count_randomized_sweep(corpus):
    rows, df = corpus
    got = {r.doc_id: r.n for r in
           df.select("doc_id", token_count_bpe_ish("text").alias("n")).collect()}
    for d, t in rows:
        assert got[d] == len(pyre.findall(BPE_ISH_PATTERN, t)), (t, got[d])


def test_ratios_randomized_sweep(corpus):
    rows, df = corpus
    got = {r.doc_id: (r.p, r.na) for r in df.select(
        "doc_id", punct_ratio("text").alias("p"), nonascii_ratio("text").alias("na")
    ).collect()}
    for d, t in rows:
        punct = len(pyre.sub(r"[a-zA-Z0-9\s]", "", t))
        nonascii = sum(1 for ch in t if ord(ch) > 0x7F)
        denom = max(len(t), 1)
        assert got[d] == (punct / denom, nonascii / denom), (t, got[d])


def test_langid_randomized_sweep(corpus):
    rows, df = corpus
    got = {r.doc_id: r.lang for r in
           df.select("doc_id", langid_expr("text").alias("lang")).collect()}
    for d, t in rows:
        nonascii = sum(1 for ch in t if ord(ch) > 0x7F) / max(len(t), 1)
        if nonascii > 0.3:
            want = "zh"
        else:
            toks = _py_tokens(t)
            hits = {lang: sum(1 for x in toks if x in ws)
                    for lang, ws in STOPWORDS.items()}
            want = next(lang for lang in ["en", "de", "fr", "es"]
                        if hits[lang] == max(hits.values()))
        assert got[d] == want, (t, got[d], want)


def test_decontamination_randomized_sweep(spark):
    """Seeded randomized sweep of the 13-gram decontamination operator
    (run at n=5 so a small-vocabulary corpus collides naturally) against a
    pure-Python n-gram reference: random train/benchmark docs over a tiny
    vocabulary with casing and punctuation junk (normalization must line
    up on both sides), verbatim benchmark spans planted into a subset of
    train docs, and sub-n documents that must produce no n-grams.  The
    operator's (doc_id, n_shared_ngrams, n_benchmark_docs) rows must equal
    the reference exactly — including which clean docs are ABSENT."""
    import re as _re

    from remote_tsdb_clickhouse_spark.operators.decontaminate import ngram_contamination

    rng = random.Random(1301)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    junk = ["", ",", "!", "  ", "?", ";"]

    def make_doc(n_words):
        words = []
        for _ in range(n_words):
            w = rng.choice(vocab)
            if rng.random() < 0.3:
                w = w.capitalize()
            words.append(w + rng.choice(junk))
        return " ".join(words)

    n = 5
    bench_rows = [(i, make_doc(rng.randint(n, 20))) for i in range(6)]
    train_rows = []
    for i in range(40):
        if rng.random() < 0.25:
            # plant a verbatim benchmark span long enough to share >=1 n-gram
            src = rng.choice(bench_rows)[1]
            toks = src.split()
            if len(toks) > n:
                lo = rng.randrange(len(toks) - n)
                span = " ".join(toks[lo : lo + rng.randint(n, len(toks) - lo)])
                train_rows.append((i, make_doc(rng.randint(0, 6)) + " " + span))
                continue
        train_rows.append((i, make_doc(rng.randint(1, 25))))  # incl. sub-n docs

    def py_tokens(text):
        return [t for t in _re.sub(r"[^a-zA-Z0-9 ]", " ", text).lower().split() if t]

    def py_ngrams(text):
        toks = py_tokens(text)
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    bench_ngrams = {i: py_ngrams(t) for i, t in bench_rows}
    want = {}
    for i, t in train_rows:
        tg = py_ngrams(t)
        shared = tg & set().union(*bench_ngrams.values())
        if shared:
            hit_docs = sum(1 for g in bench_ngrams.values() if tg & g)
            want[i] = (len(shared), hit_docs)

    train = spark.createDataFrame(train_rows, "doc_id LONG, text STRING").repartition(7)
    bench = spark.createDataFrame(bench_rows, "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: (r["n_shared_ngrams"], r["n_benchmark_docs"])
        for r in ngram_contamination(train, bench, n=n).collect()
    }
    assert got == want
    # the sweep must exercise real contamination, not a vacuous empty match
    assert len(want) >= 5


def test_decontamination_default_shingle_width_is_13():
    """The GPT-3-style default n=13 is a semantic constant the randomized
    sweep never sees (it passes n=5 explicitly), and the r13 mutation
    screen proved a 13->12 mutant survived the unit suite (only the
    driver's oracle row pinned it).  Pin it structurally: a train doc
    sharing a verbatim 13-token span with the benchmark carries exactly
    ONE shared default-width n-gram, and a doc sharing only a 12-token
    span is absent — any other default (12 gives two shared grams on the
    13-span; 14 gives zero) fails one of the legs."""
    from remote_tsdb_clickhouse_spark.operators.decontaminate import ngram_contamination
    from remote_tsdb_clickhouse_spark.session import get_spark

    spark = get_spark()
    span13 = [f"shared{i}" for i in range(13)]
    bench = spark.createDataFrame([(0, " ".join(span13))], "doc_id LONG, text STRING")
    train = spark.createDataFrame(
        [
            (1, "trainpadone " + " ".join(span13) + " trainpadtwo"),
            (2, "trainpadthree " + " ".join(span13[:12]) + " trainpadfour"),
        ],
        "doc_id LONG, text STRING",
    )
    got = {r.doc_id: r.n_shared_ngrams for r in ngram_contamination(train, bench).collect()}
    assert got == {1: 1}


def test_min_shingle_fingerprint_is_min_of_shingle_hashes(spark):
    """Mutation screen M61: the 1-permutation MinHash fingerprint must be
    the MINIMUM 32-bit shingle hash (documents sharing any low-hash
    shingle collide — the winnowing-lite property).  Differential against
    a hashlib re-computation of hash32 over the word 3-grams, with the
    fixture asserted to have distinct min/max hashes so a max-taking
    mutant cannot pass by coincidence."""
    import hashlib

    from remote_tsdb_clickhouse_spark.functions import textfuncs as tx

    texts = [
        "alpha beta gamma delta epsilon",
        "one two three four five six seven",
    ]

    def expected(text):
        toks = text.split()  # fixture text is already normalized
        shingles = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        hs = [int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in shingles]
        assert min(hs) != max(hs), "fixture must distinguish min from max"
        return min(hs)

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id LONG, text STRING")
    got = {
        r.doc_id: r.fp
        for r in df.select(
            "doc_id",
            tx.min_shingle_fingerprint(tx.tokens("text"), 3).alias("fp"),
        ).collect()
    }
    assert got == {i: expected(t) for i, t in enumerate(texts)}
    # documents too short to shingle carry the -1 sentinel, not NULL
    short = spark.createDataFrame([(0, "just two")], "doc_id LONG, text STRING")
    assert short.select(
        tx.min_shingle_fingerprint(tx.tokens("text"), 3).alias("fp")
    ).collect()[0].fp == -1


def test_langid_frame_matches_expr_and_breaks_ties_en_first(spark):
    """Mutation screen M66 (survived batch 11 unmutated: langid_frame —
    the engine path with the single-tokenize + exchange barrier — had no
    unit test; only the expr cascade did).  The two spellings must agree
    row-for-row, including the documented tie order en > de > fr > es:
    the fixture plants an exact en/de stopword tie AND a zero-stopword
    doc (a four-way tie at 0) — both must label en, which a
    strict-inequality cascade silently sends to de."""
    from remote_tsdb_clickhouse_spark.functions.textfuncs import langid_frame

    rows = [
        (0, "the und"),              # en == de == 1: tie must break to en
        (1, "xyz abc qqq"),          # no stopwords: four-way tie at 0 -> en
        (2, "der die das und ist"),  # clear de
        (3, "le la les et pour"),    # clear fr
        (4, "el los las y por"),     # clear es
        (5, "the a and of to"),      # clear en
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    frame = {r.doc_id: r.pred_lang for r in langid_frame(df).collect()}
    expr = {
        r.doc_id: r.lang
        for r in df.select("doc_id", langid_expr("text").alias("lang")).collect()
    }
    assert frame == expr
    assert frame == {0: "en", 1: "en", 2: "de", 3: "fr", 4: "es", 5: "en"}


def test_quality_score_component_weights(spark):
    """Mutation screen M67 (survived batch 11 unmutated: quality_score had
    no unit test — only the driver oracle pinned it).  Pin the composite
    0.5*stopword_ratio + 0.3*min(n_tokens/100, 1) + 0.2*(1 - punct_ratio)
    at inputs where the length and noise terms DIFFER, so any weight swap
    moves the score; includes the capped length prior and the all-noise
    floor."""
    from remote_tsdb_clickhouse_spark.functions.textfuncs import quality_score

    df = spark.createDataFrame(
        [(0, 50, 0.4, 0.1), (1, 200, 0.4, 0.1), (2, 0, 0.0, 1.0)],
        "i LONG, n_tokens LONG, sw DOUBLE, punct DOUBLE",
    )
    got = {
        r.i: r.q
        for r in df.select(
            "i",
            quality_score(F.col("n_tokens"), F.col("sw"), F.col("punct")).alias("q"),
        ).collect()
    }
    # 0.5*0.4 + 0.3*0.5 + 0.2*0.9 = 0.53 ; capped: 0.2 + 0.3 + 0.18 = 0.68
    assert got[0] == pytest.approx(0.53)
    assert got[1] == pytest.approx(0.68)
    assert got[2] == pytest.approx(0.0)


def test_langid_zh_threshold_is_strictly_above_30_percent(spark):
    """Mutation screen M102: the zh cutover fires only STRICTLY above 30%
    non-ascii — a doc at exactly 0.3 falls through to the stopword
    cascade.  "the to ééé" is 10 chars with 3 non-ascii (ratio 0.300
    exactly) and two en stopwords, so it must label en; one more é tips
    it to zh both ways (sanity)."""
    from remote_tsdb_clickhouse_spark.functions.textfuncs import langid_frame

    rows = [(0, "the to ééé"), (1, "the to éééé")]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {r.doc_id: r.pred_lang for r in langid_frame(df).collect()}
    assert got == {0: "en", 1: "zh"}, got
