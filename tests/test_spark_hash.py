"""functions/spark_hash: the pure-Python xxHash64 must be bit-exact with
Spark's F.xxhash64 on strings — the serving sidecars route point reads by
it, so a single mismatch opens the wrong bucket directory."""

from __future__ import annotations

import os

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mcp_local_rag_spark.functions.spark_hash import bucket_of, xxhash64

# each hypothesis example is a full 1-row Spark job (~0.5 s); the
# deterministic edge-length test above the property already covers every
# xxHash64 code path, so the default randomized depth stays small
_EXAMPLES = 30 if os.environ.get("SPARK_GRAFT_FULL_TESTS") else 8


def _spark_hashes(spark, samples: list[str]) -> dict[str, int]:
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    return {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}


def test_matches_spark_on_edge_lengths_and_unicode(spark):
    """Every xxHash64 code path: empty, <4, 4-7, 8-31 (tail loops), 32+
    (vectorized body), exact block boundaries, and multi-byte UTF-8."""
    samples = (
        ["", "a", "ab", "abc", "abcd", "abcdefg", "abcdefgh"]
        + ["x" * n for n in (15, 16, 31, 32, 33, 63, 64, 100)]
        + ["/corpus/src3/doc42.md", "näïve", "日本語テキスト", "🚀" * 9]
    )
    got = _spark_hashes(spark, samples)
    for s in samples:
        assert xxhash64(s.encode("utf-8")) == got[s], repr(s)


@settings(max_examples=_EXAMPLES, deadline=None)
@given(st.text(min_size=0, max_size=120))
def test_matches_spark_property(spark, s):
    df = spark.createDataFrame([(s,)], "s string")
    expected = df.select(F.xxhash64("s").alias("h")).first()["h"]
    assert xxhash64(s.encode("utf-8")) == expected


def test_bucket_of_matches_layout_routing(spark):
    """bucket_of must equal pmod(xxhash64(key), n) — the expression the
    bucketed writers route rows with."""
    keys = [f"/d/doc{i}.md" for i in range(50)]
    df = spark.createDataFrame([(k,) for k in keys], "k string").select(
        "k", F.pmod(F.xxhash64("k"), F.lit(64)).cast("int").alias("b")
    )
    got = {r["k"]: r["b"] for r in df.collect()}
    for k in keys:
        assert bucket_of(k, 64) == got[k]
