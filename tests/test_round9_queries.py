"""Invariant tests for the round-9 pipeline queries: seeded shuffle
manifest, duplication attribution, unrolled k-means, perplexity split."""

from pyspark.sql import functions as F

from mcp_local_rag_spark.queries import queries

SF = "/root/testdata/sf0.001"


def test_shuffle_shards_is_a_permutation_manifest(spark):
    out = queries()["corpus_shuffle_shards"](spark, SF).toPandas()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    # every document appears exactly once
    assert len(out) == n_docs
    assert out["doc_id"].nunique() == n_docs
    # positions are dense 0..n-1 within each shard
    for _, g in out.groupby("shard"):
        assert sorted(g["pos"]) == list(range(len(g)))
        # offsets are the running sum of earlier docs' n_chars: start at 0
        # and strictly increase (all docs are non-empty)
        off = g.sort_values("pos")["offset_chars"].tolist()
        assert off[0] == 0
        assert all(b > a for a, b in zip(off, off[1:]))


def test_shuffle_shards_is_seed_deterministic(spark):
    a = queries()["corpus_shuffle_shards"](spark, SF).toPandas()
    b = queries()["corpus_shuffle_shards"](spark, SF).toPandas()
    assert a.equals(b)


def test_shuffle_order_decorrelates_doc_id(spark):
    """The within-shard order must not be doc_id order (that's the whole
    point of the shuffle): Spearman-ish check via inversions."""
    out = queries()["corpus_shuffle_shards"](spark, SF).toPandas()
    g = out[out["shard"] == out["shard"].iloc[0]].sort_values("pos")
    ids = g["doc_id"].tolist()
    assert ids != sorted(ids)


def test_dedup_rate_by_source_totals_match_pair_set(spark):
    pairs = queries()["dedup_minhash_lsh"](spark, SF)
    by_src = queries()["dedup_rate_by_source"](spark, SF).toPandas()
    assert int(by_src["n_pairs"].sum()) == pairs.count()
    # planted duplicates (same text, same origin source) guarantee
    # within-source pairs exist
    diag = by_src[by_src["source_a"] == by_src["source_b"]]
    assert len(diag) > 0 and diag["n_pairs"].sum() > 0


def test_embedding_kmeans_partitions_the_corpus(spark):
    out = queries()["embedding_kmeans"](spark, SF).toPandas()
    n_vecs = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert sorted(out["cluster"]) == list(range(len(out)))
    assert int(out["n_members"].sum()) == n_vecs
    # exemplar is a member id; distances are rounded cosine distances
    assert (out["avg_dist"] >= -1e-9).all() and (out["avg_dist"] <= 2.0).all()


def test_perplexity_buckets_are_per_lang_terciles(spark):
    out = queries()["corpus_perplexity_buckets"](spark, SF).toPandas()
    for lang, g in out.groupby("lang"):
        counts = g["ppl_bucket"].value_counts()
        assert set(counts.index) <= {"head", "middle", "tail"}
        # ntile keeps bucket sizes within 1 of each other
        assert counts.max() - counts.min() <= 1
        # head really is the low-perplexity (high avg_logprob) end
        assert (
            g[g["ppl_bucket"] == "head"]["avg_logprob"].min()
            >= g[g["ppl_bucket"] == "tail"]["avg_logprob"].max()
        )
