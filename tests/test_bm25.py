"""BM25 math checked against hand-computed Okapi/Lucene values."""

import math

from mcp_local_rag_spark.operators import bm25


def test_bm25_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            ("/a", 0, "spark spark fast"),
            ("/a", 1, "slow words only"),
            ("/b", 0, "spark appears once here"),
        ],
        "filePath string, chunkIndex int, text string",
    )
    postings = bm25.build_postings(docs)
    scores = {
        (r.filePath, r.chunkIndex): r._score
        for r in bm25.bm25_scores(postings, ["spark"], materialize=False).collect()
    }
    # N=3, df(spark)=2 -> idf = ln(1 + (3-2+0.5)/(2+0.5)) = ln(1.6)
    idf = math.log(1.6)
    avgdl = (3 + 3 + 4) / 3
    # doc (/a,0): tf=2, dl=3
    expected_a0 = idf * (2 * 2.2) / (2 + 1.2 * (1 - 0.75 + 0.75 * 3 / avgdl))
    # doc (/b,0): tf=1, dl=4
    expected_b0 = idf * (1 * 2.2) / (1 + 1.2 * (1 - 0.75 + 0.75 * 4 / avgdl))
    assert abs(scores[("/a", 0)] - expected_a0) < 1e-9
    assert abs(scores[("/b", 0)] - expected_b0) < 1e-9
    assert ("/a", 1) not in scores


def test_bm25_candidate_restriction_keeps_global_stats(spark):
    docs = spark.createDataFrame(
        [("/a", 0, "spark"), ("/b", 0, "spark"), ("/c", 0, "spark")],
        "filePath string, chunkIndex int, text string",
    )
    postings = bm25.build_postings(docs)
    cands = docs.select("filePath", "chunkIndex").filter("filePath = '/a'")
    out = bm25.bm25_scores(postings, ["spark"], candidates=cands, materialize=False).collect()
    assert len(out) == 1 and out[0].filePath == "/a"
    # idf uses the GLOBAL df=3, N=3: ln(1 + 0.5/3.5)
    idf = math.log(1 + 0.5 / 3.5)
    expected = idf * 2.2 / (1 + 1.2 * (1 - 0.75 + 0.75))
    assert abs(out[0]._score - expected) < 1e-9


def test_scan_stats_exclude_zero_token_docs(spark):
    """Docs that tokenize to nothing (punctuation-only) produce no postings
    rows, so the index-free scan path must exclude them from N/avgdl too —
    both paths score identically."""
    docs = spark.createDataFrame(
        [
            ("/a", 0, "spark spark fast"),
            ("/a", 1, "!!! ???"),          # zero tokens under unigram
            ("/b", 0, "spark appears once here"),
        ],
        "filePath string, chunkIndex int, text string",
    )
    postings = bm25.build_postings(docs)
    via_postings = {
        (r.filePath, r.chunkIndex): r._score
        for r in bm25.bm25_scores(postings, ["spark"], materialize=False).collect()
    }
    via_scan = {
        (r.filePath, r.chunkIndex): r._score
        for r in bm25.bm25_scores_scan(docs, ["spark"]).collect()
    }
    assert via_postings.keys() == via_scan.keys()
    for k in via_postings:
        assert abs(via_postings[k] - via_scan[k]) < 1e-9


def test_precomputed_stats_skip_per_query_job(spark):
    """corpus_stats_scan computed once feeds bm25_scores_scan via stats=
    with identical scores to the self-computed path."""
    docs = spark.createDataFrame(
        [("/a", 0, "spark spark fast"), ("/b", 0, "spark appears once here")],
        "filePath string, chunkIndex int, text string",
    )
    stats = bm25.corpus_stats_scan(docs, ["spark", "absent"])
    assert stats["n"] == 2 and stats["df"] == {"spark": 2, "absent": 0}
    a = {(r.filePath, r.chunkIndex): r._score
         for r in bm25.bm25_scores_scan(docs, ["spark"]).collect()}
    b = {(r.filePath, r.chunkIndex): r._score
         for r in bm25.bm25_scores_scan(docs, ["spark"], stats=stats).collect()}
    assert a == b


def test_ngram23_tokenizer(spark):
    docs = spark.createDataFrame([("/a", 0, "ab")], "filePath string, chunkIndex int, text string")
    postings = bm25.build_postings(docs, tokenizer="ngram23")
    terms = {r.term for r in postings.collect()}
    assert terms == {"ab"}  # len 2 -> one 2-gram, no 3-grams


def test_ngram_scan_matches_postings_path(spark):
    """bm25_scores_ngram_scan (map-only, r15 optimization) must score
    byte-identically to build_postings(ngram23) + bm25_scores across the
    tokenizer's edge cases: overlapping repeats, 1-char / empty docs (no
    tokens -> excluded from N/avgdl), uppercase folding, punctuation and
    regex metacharacters in both text and terms, unicode, and terms
    outside the 2..3-gram length band."""
    docs = spark.createDataFrame(
        [
            ("/a", 0, "aaaa"),              # overlapping tf("aa")=3, tf("aaa")=2
            ("/a", 1, "x"),                 # 1 char: zero tokens
            ("/a", 2, ""),                  # empty: zero tokens
            ("/b", 0, "Spark JOINs spark"), # case folding
            ("/b", 1, "a.b a.b"),           # regex metachar in text
            ("/c", 0, "héllo wörld"),       # unicode
            ("/c", 1, "ab"),                # exactly one 2-gram
        ],
        "filePath string, chunkIndex int, text string",
    )
    terms = ["aa", "aaa", "ar", ".b", "a.", "él", "x", "abcd", "AB"]
    postings = bm25.build_postings(docs, tokenizer="ngram23")
    via_postings = {
        (r.filePath, r.chunkIndex): r._score
        for r in bm25.bm25_scores(postings, terms, materialize=False).collect()
    }
    via_scan = {
        (r.filePath, r.chunkIndex): r._score
        for r in bm25.bm25_scores_ngram_scan(docs, terms).collect()
    }
    assert via_postings.keys() == via_scan.keys()
    for k in via_postings:
        assert abs(via_postings[k] - via_scan[k]) < 1e-9
    # empty term list mirrors the postings path's empty frame
    assert bm25.bm25_scores_ngram_scan(docs, []).count() == 0


def test_empty_query_returns_empty_scores(spark):
    """Whitespace-only query -> no terms: the scan path must return an
    empty scores frame (the postings path's behavior), not raise from
    filter(None) (ADVICE r4)."""
    docs = spark.createDataFrame(
        [("/a", 0, "spark is fast")],
        "filePath string, chunkIndex int, text string",
    )
    out = bm25.bm25_scores_scan(docs, [])
    assert out.columns == ["filePath", "chunkIndex", "_score"]
    assert out.count() == 0
    # and with a candidate set carrying text
    out2 = bm25.bm25_scores_scan(docs, [], candidates=docs)
    assert out2.count() == 0
