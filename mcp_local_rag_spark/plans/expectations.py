"""Data-quality expectations — declarative row rules with quarantine.

The Delta Live Tables idea (`EXPECT ... ON VIOLATION`) in engine-native
form: a rule is (name, SQL predicate a GOOD row satisfies); one scan
tags every row with the array of rule names it fails, the clean stream
keeps rows failing nothing, and the quarantine stream explodes one row
per (row, rule) violation so downstream triage can group by rule. All
pure column expressions — the rule pass runs at scan speed, no UDFs, no
extra shuffle (the metrics aggregate is map-side partial to one row).

Reference has a fixed schema type-guard at ingest (SURVEY §2.2 P7,
src/vectordb/schema.ts); this generalizes it to caller-defined
predicates for pipeline use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

FAILED_COL = "_failed_rules"


def _failed_array(rules: list[tuple[str, str]]):
    # NULL predicate results count as failures: an expectation that
    # cannot be evaluated did not pass (the conservative reading)
    return F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.coalesce(F.expr(pred), F.lit(False)), F.lit(name)
                )
                for name, pred in rules
            ]
        )
    )


def apply_expectations(
    df: DataFrame, rules: list[tuple[str, str]]
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(clean, quarantine, metrics) for ``rules`` = [(name, predicate)].

    clean      — rows satisfying every rule (original schema).
    quarantine — one row per violated (row, rule): original columns plus
                 ``rule`` (string).
    metrics    — one row: ``rows`` (total), ``clean_rows``, and a
                 per-rule violation count ``viol_<rule>`` — a single
                 map-side-combinable aggregate over the SAME tagged
                 frame the split uses (one definition of 'violation'),
                 zero-filled on empty input.
    """
    names = [n for n, _ in rules]
    if len(set(names)) != len(names):
        raise ValueError("duplicate rule names")
    for taken in (FAILED_COL, "rule"):
        if taken in df.columns:
            raise ValueError(f"input already has a {taken!r} column")
    tagged = df.withColumn(FAILED_COL, _failed_array(rules))
    clean = tagged.filter(F.size(FAILED_COL) == 0).drop(FAILED_COL)
    quarantine = (
        tagged.filter(F.size(FAILED_COL) > 0)
        .withColumn("rule", F.explode(FAILED_COL))
        .drop(FAILED_COL)
    )

    def _cnt(cond):
        return F.coalesce(
            F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0))), F.lit(0)
        )

    metrics = tagged.agg(
        F.count(F.lit(1)).alias("rows"),
        _cnt(F.size(FAILED_COL) == 0).alias("clean_rows"),
        *[
            _cnt(F.array_contains(FAILED_COL, name)).alias(f"viol_{name}")
            for name in names
        ],
    )
    return clean, quarantine, metrics
