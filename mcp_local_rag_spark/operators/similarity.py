"""Similarity search over embedding columns.

Baseline: brute-force cosine top-k (exact — matches the reference's stance
of never building a vector index, src/vectordb/index.ts:346). Scale path:
cluster-pruned (IVF-style) top-k using a precomputed assignment column —
probing one cluster turns the cross join into a co-partitioned equi-join,
cutting the scanned fraction to ~1/n_clusters. An MLlib
BucketedRandomProjectionLSH variant is a drop-in alternative behind the
same signature when no assignment exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine


def cosine_knn(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    *,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    block_col: str | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """Top-k corpus rows per query by cosine similarity.

    ``block_col`` (present on both sides) restricts the search to matching
    blocks — the IVF probe. Without it the join is a broadcast cross join
    (queries are few); with it, an equi-join on the block key that
    co-partitions at scale. Ranking is on (round(cos, 6) desc, corpus_id)
    — a total order, oracle-stable.
    """
    q = queries.select(
        F.col(query_id).alias("_qid"),
        F.col(query_vec).alias("_qvec"),
        *([F.col(block_col).alias("_qblock")] if block_col else []),
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(corpus_vec).alias("_cvec"),
        *([F.col(block_col).alias("_cblock")] if block_col else []),
    )
    if block_col:
        joined = c.join(F.broadcast(q), F.col("_cblock") == F.col("_qblock"))
    else:
        joined = c.crossJoin(F.broadcast(q))
    if exclude_self:
        joined = joined.filter(F.col("neighbor_id") != F.col("_qid"))
    scored = joined.withColumn(
        "cos", F.round(cosine(F.col("_cvec"), F.col("_qvec")), 6) + F.lit(0.0)
    )
    w = Window.partitionBy("_qid").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(F.col("_qid").alias(query_id), "neighbor_id", "cos")
    )


def ivf_assign(
    emb: DataFrame,
    n_clusters: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> tuple[DataFrame, "object"]:
    """Build real IVF cluster assignments with MLlib KMeans.

    Returns (emb + 'label' column, fitted model). The probe path is then
    ``cosine_knn(..., block_col='label')`` — the same signature used with
    pre-supplied assignments. At 100 TB: fit on a sample, assign with the
    broadcast model (transform is a map-only stage, no shuffle)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array  # noqa: F401

    feat = emb.withColumn("_features", array_to_vector(F.col(vec_col)))
    model = KMeans(k=n_clusters, seed=seed, featuresCol="_features", predictionCol="label").fit(feat)
    assigned = model.transform(feat).drop("_features")
    return assigned, model


def embedding_near_dups(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    threshold: float = 0.9,
) -> DataFrame:
    """Near-duplicate pairs by cosine within a blocking key (id1 < id2).

    Blocking (cluster id / LSH bucket) keeps the pair join equi-keyed; an
    unblocked variant would be a full cross join — never do that at scale.
    Threshold compares the ROUNDED cosine so the cut is oracle-stable.
    """
    a = emb.select(
        F.col(id_col).alias("id1"), F.col(vec_col).alias("_v1"), F.col(block_col).alias("_b")
    )
    b = emb.select(
        F.col(id_col).alias("id2"), F.col(vec_col).alias("_v2"), F.col(block_col).alias("_b")
    )
    pairs = a.join(b, "_b").filter(F.col("id1") < F.col("id2"))
    scored = pairs.withColumn(
        "cos", F.round(cosine(F.col("_v1"), F.col("_v2")), 6) + F.lit(0.0)
    )
    return scored.filter(F.col("cos") >= threshold).select("id1", "id2", "cos")
