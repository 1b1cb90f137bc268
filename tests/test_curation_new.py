"""Semantic invariants for the round-6 curation additions: DSIR importance
weights, exact repeated-span coverage, and Bloom-filter join pruning.
(Cross-engine value equality is covered by the duckdb oracle pairs; these
tests pin the properties the oracle can't express — directionality,
coverage bounds, and the Bloom superset guarantee.)"""

import os

from pyspark.sql import functions as F

from mcp_local_rag_spark.queries.curation import (
    q_corpus_dsir_weights,
    q_text_dedup_spans,
)
from mcp_local_rag_spark.queries.events import q_events_bloom_prune
from mcp_local_rag_spark.session import load

SF = "/root/testdata/sf0.001"


def test_dsir_weights_prefer_target_language(spark):
    """The whole point of importance weighting: documents drawn from the
    target distribution (lang='en') must average a higher log-ratio score
    than the rest of the corpus."""
    w = q_corpus_dsir_weights(spark, SF)
    docs = load(spark, SF, "documents").select("doc_id", "lang")
    by_side = (
        w.join(docs, "doc_id")
        .groupBy((F.col("lang") == "en").alias("is_target"))
        .agg(F.avg("dsir_w").alias("mean_w"))
        .collect()
    )
    means = {r.is_target: r.mean_w for r in by_side}
    assert means[True] > means[False]


def test_dsir_weights_cover_every_doc_once(spark):
    w = q_corpus_dsir_weights(spark, SF)
    n_docs = load(spark, SF, "documents").count()
    assert w.count() == n_docs
    assert w.filter(F.col("n_tokens") <= 0).count() == 0


def _write_docs(spark, tmp_path, rows):
    p = os.path.join(str(tmp_path), "documents.parquet")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(p)
    return str(tmp_path)


def test_dedup_spans_full_copy_and_partial_overlap(spark, tmp_path):
    base = " ".join(f"tok{i}" for i in range(40))
    shared = " ".join(f"common{i}" for i in range(12))  # 12-token shared run
    rows = [
        (1, base, "en", "s", len(base)),
        (2, base, "en", "s", len(base)),  # exact copy: coverage 1.0
        (3, shared + " " + " ".join(f"uniq{i}" for i in range(30)), "en", "s", 0),
        (4, " ".join(f"other{i}" for i in range(30)) + " " + shared, "en", "s", 0),
        (5, " ".join(f"alone{i}" for i in range(40)), "en", "s", 0),
    ]
    sf_dir = _write_docs(spark, tmp_path, rows)
    out = {r.doc_id: r for r in q_text_dedup_spans(spark, sf_dir).collect()}
    assert out[1].dup_frac == 1.0 and out[2].dup_frac == 1.0
    # partial overlap: exactly the 12 shared tokens are covered (runs sit at
    # the document edge, so every shared token is inside some dup 8-gram)
    assert out[3].n_dup_tokens == 12 and out[4].n_dup_tokens == 12
    assert out[5].n_dup_tokens == 0 and out[5].dup_frac == 0.0
    # bounds hold everywhere
    for r in out.values():
        assert 0 <= r.n_dup_tokens <= r.n_tokens


def test_dedup_spans_ignores_within_doc_repeats(spark, tmp_path):
    """A span repeated only WITHIN one document is not cross-doc duplication
    (count(DISTINCT doc_id) >= 2 gate)."""
    loop = " ".join(f"w{i % 8}" for i in range(32))  # 8-token cycle, one doc
    rows = [
        (1, loop, "en", "s", 0),
        (2, " ".join(f"x{i}" for i in range(30)), "en", "s", 0),
    ]
    sf_dir = _write_docs(spark, tmp_path, rows)
    out = {r.doc_id: r for r in q_text_dedup_spans(spark, sf_dir).collect()}
    assert out[1].n_dup_tokens == 0


def test_bloom_prune_is_a_superset_prefilter(spark):
    """Bloom guarantee: no false negatives (candidates >= true matches),
    bounded false positives (candidates <= probe keys), and the filter is
    not saturated (some probe key fails it) at this SF."""
    r = q_events_bloom_prune(spark, SF).first()
    assert r.n_true_matches <= r.n_candidates <= r.n_probe_keys
    assert r.n_false_positives == r.n_candidates - r.n_true_matches
    assert r.n_bits_set < 8192  # filter not fully saturated
    assert r.n_candidates < r.n_probe_keys  # it actually prunes something


def test_bloom_prune_probe_side_joins_broadcast(spark):
    """The scale contract: the probe side must meet the bit table through a
    broadcast hash join — never a sort-merge shuffle of the big side."""
    plan = q_events_bloom_prune(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_hard_negatives_picks_cross_label_top1(spark, tmp_path):
    from mcp_local_rag_spark.queries.ext import q_knn_hard_negatives

    rows = [
        (0, [1.0, 0.0], 1),    # anchor
        (1, [0.9, 0.1], 1),    # same label, closest -> positive
        (2, [0.5, 0.5], 1),    # same label, farther
        (3, [0.8, 0.2], 2),    # different label, closest -> hard negative
        (4, [0.0, 1.0], 2),    # different label, far
    ]
    p = os.path.join(str(tmp_path), "embeddings.parquet")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(p)
    out = {r.query_id: r for r in q_knn_hard_negatives(spark, str(tmp_path)).collect()}
    a = out[0]
    assert a.pos_id == 1 and a.neg_id == 3
    assert a.pos_cos > a.neg_cos > 0
    assert abs(a.margin - round(a.pos_cos - a.neg_cos, 6)) < 1e-9
    # anchor 3's hardest negative is the label-1 vector nearest to it
    assert out[3].neg_id == 1


def test_curation_pipeline_dispositions_are_consistent(spark):
    from mcp_local_rag_spark.queries.curation import (
        q_corpus_curation_pipeline,
        q_text_gopher_filter,
    )

    out = q_corpus_curation_pipeline(spark, SF).collect()
    n_docs = load(spark, SF, "documents").count()
    assert len(out) == n_docs  # exactly one disposition per doc
    by = {}
    for r in out:
        by.setdefault(r.disposition, []).append(r)
        # split present iff kept
        assert (r.split is not None) == (r.disposition == "keep")
    # the held-out slice is exactly the doc_id % 97 == 0 docs
    assert sorted(r.doc_id for r in by.get("benchmark", [])) == [
        i for i in range(n_docs) if i % 97 == 0
    ]
    # every 'quality' doc does fail the standalone gopher filter
    gopher = {r.doc_id: r.keep for r in q_text_gopher_filter(spark, SF).collect()}
    for r in by.get("quality", []):
        assert gopher[r.doc_id] == 0
    # kept docs pass it
    for r in by.get("keep", []):
        assert gopher[r.doc_id] == 1


def test_semantic_keep_list_structure(spark):
    from mcp_local_rag_spark.queries.ext import q_dedup_semantic_keep_list

    out = {r.vec_id: r for r in q_dedup_semantic_keep_list(spark, SF).collect()}
    emb = load(spark, SF, "embeddings")
    assert len(out) == emb.count()
    for r in out.values():
        assert r.representative <= r.vec_id
        assert r.keep == (r.representative == r.vec_id)


def test_semantic_keep_list_planted_clusters(spark, tmp_path):
    """Planted geometry: two tight semantic clusters plus a loner — each
    cluster keeps exactly its min-id representative."""
    from mcp_local_rag_spark.queries.ext import q_dedup_semantic_keep_list

    rows = [
        (0, [1.0, 0.0], 1),
        (1, [0.999, 0.01], 1),   # near-dup of 0
        (2, [0.0, 1.0], 1),
        (3, [0.01, 0.999], 1),   # near-dup of 2
        (4, [0.7, 0.7], 1),      # loner (cos ~0.71 to both axes)
    ]
    p = os.path.join(str(tmp_path), "embeddings.parquet")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(p)
    out = {
        r.vec_id: (r.representative, r.keep)
        for r in q_dedup_semantic_keep_list(spark, str(tmp_path)).collect()
    }
    assert out == {
        0: (0, True),
        1: (0, False),
        2: (2, True),
        3: (2, False),
        4: (4, True),
    }


def test_hard_negatives_drops_zero_norm_vectors(spark, tmp_path):
    """A zero-norm corpus vector has NaN cosine to everything; it must not
    surface as positive or negative (both engines drop it — oracle parity
    is guarded by the isfinite filter in the SQL twin)."""
    from mcp_local_rag_spark.queries.ext import q_knn_hard_negatives

    rows = [
        (0, [1.0, 0.0], 1),
        (1, [0.9, 0.1], 1),
        (2, [0.0, 0.0], 1),    # zero-norm: NaN cosine, same label
        (3, [0.5, 0.5], 2),
    ]
    p = os.path.join(str(tmp_path), "embeddings.parquet")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(p)
    out = {r.query_id: r for r in q_knn_hard_negatives(spark, str(tmp_path)).collect()}
    assert out[0].pos_id == 1 and out[0].neg_id == 3
    # the zero-norm vector contributes no row of its own either
    assert 2 not in out


def test_bpe_merges_hand_computed(spark, tmp_path):
    """4-round BPE on a corpus small enough to trace by hand. Words:
    'aaab' x3, 'ab' x2 (greedy leftmost non-overlapping pair counts).
    Round 1: (a,b)=3+2=5 beats (a,a)=3 -> 'ab'. Round 2: (a,a)=3 ties
    (a,ab)=3, tiebreak on the pair -> 'aa'. Round 3: (aa,ab)=3 ->
    'aaab'. Round 4: every word is one symbol -> no pairs, lane stops
    at 3 rows (the oracle's empty w4 cascades identically)."""
    from mcp_local_rag_spark.queries.curation import q_text_bpe_merges

    rows = [
        (1, "aaab aaab", "en", "s", 9),
        (2, "aaab ab", "en", "s", 7),
        (3, "ab", "en", "s", 2),
    ]
    sf_dir = _write_docs(spark, tmp_path, rows)
    out = [tuple(r) for r in q_text_bpe_merges(spark, sf_dir).collect()]
    assert out == [
        (1, "a", "b", "ab", 5),
        (2, "a", "a", "aa", 3),
        (3, "aa", "ab", "aaab", 3),
    ]


def test_bpe_greedy_run_counting(spark, tmp_path):
    """A same-symbol run counts pairs greedily (floor(k/2) for a run of
    k), matching what the merge application actually performs: 'aaaa'
    yields (a,a)=2 per word, then one (aa,aa) per word."""
    from mcp_local_rag_spark.queries.curation import q_text_bpe_merges

    sf_dir = _write_docs(spark, tmp_path, [(1, "aaaa aaaa aaaa", "en", "s", 14)])
    out = [tuple(r) for r in q_text_bpe_merges(spark, sf_dir).collect()]
    assert out == [(1, "a", "a", "aa", 6), (2, "aa", "aa", "aaaa", 3)]


def test_domain_cap_caps_and_rebalances(spark, tmp_path):
    """Cap keeps the 30 LONGEST docs per source (doc_id tiebreak) and the
    after-shares rebalance toward the uncapped source and sum to ~1."""
    from mcp_local_rag_spark.queries.curation import q_corpus_domain_cap

    rows = [(i, "x" * (10 + i), "en", "big", 100 + i) for i in range(50)]
    rows += [(100 + i, "y" * 10, "en", "small", 50) for i in range(5)]
    sf_dir = _write_docs(spark, tmp_path, rows)
    out = {r.source: r for r in q_corpus_domain_cap(spark, sf_dir).collect()}
    assert out["big"].n_docs == 50 and out["big"].n_kept == 30
    assert out["small"].n_docs == 5 and out["small"].n_kept == 5
    assert out["small"].share_after > out["small"].share_before
    assert out["big"].share_after < out["big"].share_before
    total_after = sum(r.share_after for r in out.values())
    assert 0.999 <= total_after <= 1.0  # floor-division undershoot only


def test_bpe_encode_accounting(spark, tmp_path):
    """Token accounting under the learned merges: with words 'aaab' x3 /
    'ab' x2 the trainer learns ab, aa, aaab (see the merges test), so
    'aaab' encodes to ONE token and 'ab' to one token. Char counts and
    compression follow exactly."""
    from mcp_local_rag_spark.queries.curation import q_text_bpe_encode

    rows = [
        (1, "aaab aaab", "en", "s", 9),
        (2, "aaab ab", "en", "s", 7),
        (3, "ab", "en", "s", 2),
    ]
    sf_dir = _write_docs(spark, tmp_path, rows)
    out = {r.doc_id: r for r in q_text_bpe_encode(spark, sf_dir).collect()}
    assert (out[1].n_words, out[1].n_chars, out[1].n_tokens) == (2, 8, 2)
    assert (out[2].n_words, out[2].n_chars, out[2].n_tokens) == (2, 6, 2)
    assert (out[3].n_words, out[3].n_chars, out[3].n_tokens) == (1, 2, 1)
    assert out[1].chars_per_token == 4.0
    assert out[3].chars_per_token == 2.0


def test_dedup_span_removal_first_wins_semantics(spark, tmp_path):
    """The removal transform's contract, pinned independently of the
    DuckDB oracle (which only proves cross-engine agreement): the
    corpus-wide FIRST occurrence of a duplicated 8-token span survives,
    every later occurrence — cross-doc AND within-doc — is removed."""
    import hashlib

    from mcp_local_rag_spark.queries.curation import (
        q_text_dedup_span_removal,
    )

    base = " ".join(f"tok{i}" for i in range(16))
    selfrep = " ".join(f"u{i}" for i in range(8))
    rows = [
        (1, base, "en", "s", len(base)),                    # owns its spans
        (2, base, "en", "s", len(base)),                    # exact copy
        (3, selfrep + " " + selfrep, "en", "s", 2 * len(selfrep) + 1),
        (4, "short text only", "en", "s", 15),              # < 8 tokens
    ]
    sf_dir = _write_docs(spark, tmp_path, rows)
    out = {
        r.doc_id: r for r in q_text_dedup_span_removal(spark, sf_dir).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731

    # doc 1 wins every gram it shares with doc 2: untouched
    assert out[1].n_removed == 0 and out[1].cleaned_md5 == md5(base)
    # doc 2 is a full copy: every position covered, cleaned to empty
    assert out[2].n_removed == 16 and out[2].cleaned_md5 == md5("")
    # doc 3 repeats its own 8-gram: the SECOND occurrence (positions
    # 9-16) is removed, the first survives — within-doc dedup included
    assert out[3].n_removed == 8 and out[3].cleaned_md5 == md5(selfrep)
    # sub-gram-length docs pass through untouched
    assert out[4].n_removed == 0 and out[4].cleaned_md5 == md5(
        "short text only"
    )
