from pyspark.sql import functions as F

from mcp_local_rag_spark.operators import dedup


def _docs(spark):
    text_a = "the quick brown fox jumps over the lazy dog again and again"
    text_b = "completely different words about spark dataframes and shuffles here"
    return spark.createDataFrame(
        [(1, text_a), (2, text_a), (3, text_b)], "doc_id long, text string"
    )


def test_exact_duplicates(spark):
    out = dedup.exact_duplicates(_docs(spark)).collect()
    assert len(out) == 1
    assert out[0].dup_count == 2 and out[0].representative == 1


def test_minhash_lsh_finds_identical_pair(spark):
    shingles = dedup.shingle_sets(_docs(spark))
    sigs = dedup.minhash_signatures(shingles)
    pairs = dedup.lsh_candidate_pairs(sigs).collect()
    assert (1, 2) in {(r.id1, r.id2) for r in pairs}


def test_jaccard_verify_scores_identical_as_one(spark):
    shingles = dedup.shingle_sets(_docs(spark)).persist()
    pairs = dedup.lsh_candidate_pairs(dedup.minhash_signatures(shingles))
    out = dedup.jaccard_verify(pairs, shingles, threshold=0.5).collect()
    exact = [r for r in out if (r.id1, r.id2) == (1, 2)]
    assert exact and exact[0].jaccard == 1.0


def test_simhash_identical_docs_equal_signatures(spark):
    out = {r.doc_id: r.simhash for r in dedup.simhash(_docs(spark)).collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]
    assert dedup.hamming_distance(F.lit(out[1]), F.lit(out[3])) is not None


def test_hamming_distance(spark):
    row = spark.range(1).select(
        dedup.hamming_distance(F.lit(0b1011), F.lit(0b0010)).alias("d")
    ).first()
    assert row.d == 2
