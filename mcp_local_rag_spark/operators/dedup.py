"""Deduplication operators for large-scale training-data pipelines.

Not in the reference's surface (it has U1-U5 key-level dedup only — see
operators for those in queries/relational.py); these are the corpus-scale
extensions: exact hashing, MinHash+LSH banding, SimHash, n-gram Jaccard.

Scale posture (100 TB): everything is linear in corpus size — shingle
explode -> per-(doc, seed) min -> band keys -> self-join on band buckets.
The only quadratic step (exact Jaccard) runs on LSH candidate pairs, never
all pairs. All hashing is md5 of deterministic strings so results are
engine-independent (the duckdb oracle reproduces them bit-for-bit;
lexicographic MIN over hex digests is a valid min-hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens, word_shingles

N_HASHES = 16
BAND_SIZE = 4


def exact_duplicates(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: group by content hash; emit groups with >1 member."""
    h = docs.select(F.col(id_col), F.md5(text_col).alias("content_hash"))
    return (
        h.groupBy("content_hash")
        .agg(F.count("*").alias("dup_count"), F.min(id_col).alias("representative"))
        .filter(F.col("dup_count") > 1)
    )


def shingle_sets(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text", k: int = 3) -> DataFrame:
    """Distinct word k-shingles per document: (id, shingle)."""
    return docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_shingles(F.col(text_col), k))).alias("shingle"),
    )


def minhash_signatures(shingles: DataFrame, *, id_col: str = "doc_id", n_hashes: int = N_HASHES) -> DataFrame:
    """(id, seed, sig): sig = lexicographic min of md5('<seed>|<shingle>').

    One shuffle keyed by (id, seed); the seed fan-out is a cheap array
    explode, not a join.
    """
    seeds = F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("seed")
    fanned = shingles.select(id_col, "shingle", seeds)
    return (
        fanned.withColumn(
            "h",
            F.md5(F.concat_ws("", F.col("seed").cast("string"), F.lit("|"), F.col("shingle"))),
        )
        .groupBy(id_col, "seed")
        .agg(F.min("h").alias("sig"))
    )


def lsh_candidate_pairs(
    sigs: DataFrame, *, id_col: str = "doc_id", band_size: int = BAND_SIZE
) -> DataFrame:
    """Band the signatures and emit distinct candidate pairs (id1 < id2).

    band_key = md5 of the band's sigs joined in seed order. The pair join is
    an equi-join on (band, band_key) — bucket-local at scale.
    """
    parts = [
        F.max(F.when(F.col("seed") % band_size == j, F.col("sig"))) for j in range(band_size)
    ]
    bands = (
        sigs.groupBy(id_col, (F.col("seed") / band_size).cast("int").alias("band"))
        .agg(F.md5(F.concat_ws("|", *parts)).alias("band_key"))
    )
    a = bands.select(F.col(id_col).alias("id1"), "band", "band_key")
    b = bands.select(F.col(id_col).alias("id2"), "band", "band_key")
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame,
    shingles: DataFrame,
    *,
    id_col: str = "doc_id",
    threshold: float = 0.7,
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs; keep pairs >= threshold.

    |A ∩ B| via a shingle equi-join restricted to the pairs; |A ∪ B| from
    per-doc set sizes. Quadratic work only on LSH candidates.
    """
    sizes = shingles.groupBy(id_col).agg(F.count("*").alias("n"))
    s1 = shingles.select(F.col(id_col).alias("id1"), "shingle")
    s2 = shingles.select(F.col(id_col).alias("id2"), "shingle")
    inter = (
        pairs.join(s1, "id1")
        .join(s2, ["id2", "shingle"])
        .groupBy("id1", "id2")
        .agg(F.count("*").alias("c"))
    )
    jac = (
        inter.join(sizes.select(F.col(id_col).alias("id1"), F.col("n").alias("n1")), "id1")
        .join(sizes.select(F.col(id_col).alias("id2"), F.col("n").alias("n2")), "id2")
        .withColumn(
            "jaccard",
            F.round(F.col("c").cast("double") / (F.col("n1") + F.col("n2") - F.col("c")), 6),
        )
    )
    return jac.filter(F.col("jaccard") >= threshold).select("id1", "id2", "jaccard")


# ---------------------------------------------------------------------------
# SimHash: 32-bit signature from unigram term frequencies. The bit math is
# generated as SQL expression text so the Spark and DuckDB sides share one
# generator (dialect differences: instr vs strpos, integer division).

SIMHASH_BITS = 32


def _bit_exprs(dialect: str) -> list[str]:
    """Per-bit expressions over columns (h: md5 hex of token, tf: count)."""
    pos_fn = {"spark": "instr", "duckdb": "strpos"}[dialect]
    exprs = []
    for j in range(SIMHASH_BITS):
        hexpos = j // 4 + 1
        shift = 2 ** (j % 4)
        digit = f"({pos_fn}('0123456789abcdef', substring(h, {hexpos}, 1)) - 1)"
        if dialect == "spark":
            bit = f"(({digit} div {shift}) % 2)"
        else:
            bit = f"(({digit} // {shift}) % 2)"
        exprs.append(f"(tf * (2 * {bit} - 1))")
    return exprs


def simhash_sum_sql(dialect: str) -> str:
    """SELECT-list fragment: sum signed bit contributions, assemble the
    signature as a BIGINT. Expects a relation (id, h, tf)."""
    parts = _bit_exprs(dialect)
    bits = [
        f"(CASE WHEN sum({parts[j]}) > 0 THEN {2**j} ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    ]
    return " + ".join(f"CAST({b} AS BIGINT)" for b in bits)


def simhash(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash): 32-bit simhash over unigram tf weights."""
    tf = (
        docs.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count("*").alias("tf"))
        .withColumn("h", F.md5("tok"))
    )
    return tf.groupBy(id_col).agg(F.expr(simhash_sum_sql("spark")).alias("simhash"))


def hamming_distance(a, b):
    """Hamming distance between two simhash BIGINT columns (JVM-side)."""
    x = a.bitwiseXOR(b)
    return F.bit_count(x)
