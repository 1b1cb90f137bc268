"""Declarative expectations (plans/expectations): clean/quarantine split,
metrics consistency, NULL-as-violation, duplicate-name guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mcp_local_rag_spark.plans.expectations import apply_expectations
from mcp_local_rag_spark.session import load

SF = "/root/testdata/sf0.001"


def test_split_and_metrics_are_consistent(spark):
    ev = load(spark, SF, "events")
    rules = [
        ("core_type", "event_type IN ('view', 'click', 'purchase')"),
        ("value_cap", "value <= 300.0"),
    ]
    clean, quar, metrics = apply_expectations(ev, rules)
    n = ev.count()
    nc = clean.count()
    m = metrics.first()
    assert m["rows"] == n
    # quarantine rows = one per (row, rule) violation; distinct rows
    # failing >= 1 rule + clean rows = total
    viol_rows = quar.select("event_id").distinct().count()
    assert nc + viol_rows == n
    per_rule = {r["rule"]: r["cnt"] for r in
                quar.groupBy("rule").agg(F.count("*").alias("cnt")).collect()}
    assert per_rule.get("core_type", 0) == m["viol_core_type"]
    assert per_rule.get("value_cap", 0) == m["viol_value_cap"]
    # clean rows actually satisfy every rule
    assert clean.filter("value > 300.0").count() == 0
    assert clean.filter(
        "event_type NOT IN ('view', 'click', 'purchase')"
    ).count() == 0


def test_null_predicate_counts_as_violation(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, -1.0)], "id long, v double"
    )
    clean, quar, metrics = apply_expectations(df, [("pos", "v > 0")])
    assert {r.id for r in clean.collect()} == {1}
    assert {r.id for r in quar.collect()} == {2, 3}
    assert metrics.first()["viol_pos"] == 2


def test_duplicate_rule_names_rejected(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        apply_expectations(df, [("a", "id > 0"), ("a", "id < 5")])


def test_expectations_apply_to_streams(spark, tmp_path):
    """The rule pass is stateless column logic, so the SAME
    apply_expectations call runs on a streaming frame — clean and
    quarantine are stream-safe (filter + explode, no state store), and
    the drained result matches the batch twin row-for-row."""
    import pandas as pd

    src = tmp_path / "stream_src"
    src.mkdir()
    rows = [(1, "view", 10.0), (2, "error", 10.0), (3, "view", 999.0),
            (4, "signup", 500.0)]
    pd.DataFrame(rows, columns=["id", "event_type", "value"]).to_parquet(
        src / "b1.parquet"
    )
    rules = [
        ("core_type", "event_type IN ('view', 'click', 'purchase')"),
        ("value_cap", "value <= 300.0"),
    ]
    schema = "id long, event_type string, value double"
    stream = spark.readStream.schema(schema).parquet(str(src))
    _, quar_s, _ = apply_expectations(stream, rules)
    q = (
        quar_s.select("id", "rule")
        .writeStream.format("memory")
        .queryName("quar_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r.id, r.rule) for r in spark.sql("SELECT * FROM quar_out").collect()}
    batch = spark.read.schema(schema).parquet(str(src))
    _, quar_b, _ = apply_expectations(batch, rules)
    want = {(r.id, r.rule) for r in quar_b.select("id", "rule").collect()}
    assert got == want == {
        (2, "core_type"), (3, "value_cap"),
        (4, "core_type"), (4, "value_cap"),
    }
