import math

from pyspark.sql import functions as F

from mcp_local_rag_spark.functions.vector import (
    cosine,
    dot,
    dot_distance,
    l2_norm,
    l2_normalize,
    vec_lit,
)


def test_dot_and_distance(spark):
    df = spark.createDataFrame([([1.0, 0.0, 0.0],), ([0.6, 0.8, 0.0],)], "v array<float>")
    q = vec_lit([1.0, 0.0, 0.0])
    rows = df.select(
        dot(F.col("v"), q).alias("d"), dot_distance(F.col("v"), q).alias("dist")
    ).collect()
    assert rows[0]["d"] == 1.0 and rows[0]["dist"] == 0.0
    assert abs(rows[1]["d"] - 0.6) < 1e-6 and abs(rows[1]["dist"] - 0.4) < 1e-6


def test_cosine_and_norm(spark):
    df = spark.createDataFrame([([3.0, 4.0],)], "v array<float>")
    row = df.select(
        l2_norm(F.col("v")).alias("n"),
        cosine(F.col("v"), vec_lit([3.0, 4.0])).alias("c"),
        l2_normalize(F.col("v")).alias("u"),
    ).first()
    assert row["n"] == 5.0
    assert abs(row["c"] - 1.0) < 1e-12
    assert abs(math.hypot(*row["u"]) - 1.0) < 1e-12


def test_normalize_zero_vector(spark):
    df = spark.createDataFrame([([0.0, 0.0],)], "v array<float>")
    assert df.select(l2_normalize(F.col("v")).alias("u")).first()["u"] == [0.0, 0.0]
