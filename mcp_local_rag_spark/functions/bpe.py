"""Frozen-vocabulary BPE application — the 100 TB tokenizer HOT PATH.

Production tokenizers ship as an ARTIFACT: training happens once (hours,
bounded corpus sample), then every downstream job applies the frozen
merge list to petabytes of text. This module is that split for the
Spark engine:

  * ``tools/train_vocab.py`` runs the batched greedy trainer
    (queries/curation._bpe_train_batched) at production depth over the
    bench corpus and commits the learned merges to
    ``assets/vocab_deep.json`` — the repo's vocab.bpe analogue;
  * ``apply_merges_col`` applies a frozen merge list to a symbol-state
    column as ONE higher-order ``aggregate`` fold over a literal merge
    array — a single JVM-side projection, zero shuffles, zero Python.
    Per-row cost is O(merges x |doc|) string replaces and completely
    map-parallel: the exact shape a 1000-executor encode job wants.

Vocabulary form: SentencePiece-style. Units are whole documents with the
word-boundary MARKER ``_`` (the corpus alphabet is [a-z], so ``_`` is
free): ``lower(text)`` split on ``[^a-z]+``, joined and prefixed with
``_``. Merges may therefore cross word boundaries (``_the`` and
``_spark_table`` are learnable tokens), which is what gives the
synthetic 31-word corpus a genuinely deep (>=256-merge) vocabulary —
word-local BPE saturates at ~107 merges on it (sum of len(w)-1).

Training/encode agreement: encoding applies the merges IN LEARNED ORDER
via left-to-right non-overlapping ``replace`` — bit-identical to what
the trainer's own state chain performs, so ``apply_merges_col`` over the
base units reproduces the trainer's final state exactly (pinned in
tests/test_bpe_deep.py at full depth, where merge interactions occur).
Both Spark's and DuckDB's ``replace`` scan left-to-right non-overlapping,
so the oracle twin (``merges_sql_literal`` + ``list_reduce``) is exact.

No reference counterpart (the reference has no tokenizer-training
surface); this extends the corpus-serving role of src/server/index.ts
to the training-data side, per the build brief.
"""

from __future__ import annotations

import json
import os
from functools import lru_cache

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MARKER = "_"
_ASSET_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "assets")
DEEP_VOCAB_PATH = os.path.join(_ASSET_DIR, "vocab_deep.json")


# ---------------------------------------------------------------------------
# unit construction (Spark + the SQL twin, kept in lockstep)

def sp_unit_col(text_col: str = "text") -> Column:
    """The SentencePiece-style unit string: marker-joined lowercase words,
    leading marker. ``'the spark table'`` -> ``'_the_spark_table'``."""
    return F.concat(
        F.lit(MARKER),
        F.array_join(
            F.expr(f"filter(split(lower({text_col}), '[^a-z]+'), x -> x <> '')"),
            MARKER,
        ),
    )


def sp_unit_sql(text_col: str = "text") -> str:
    """DuckDB twin of ``sp_unit_col`` (same marker, same split)."""
    return (
        f"'{MARKER}' || array_to_string(list_filter("
        f"string_split_regex(lower({text_col}), '[^a-z]+'), x -> x <> ''), "
        f"'{MARKER}')"
    )


def pad_symbols_col(unit_col: Column) -> Column:
    """Initial symbol state: every char double-space-delimited with a
    leading pad — the state form the whole BPE family shares
    (queries/curation._bpe_words)."""
    return F.concat(F.lit("  "), F.regexp_replace(unit_col, "(.)", "$1  "))


PAD_SYMBOLS_SQL = "'  ' || regexp_replace({unit}, '(.)', '\\1  ', 'g')"


def sp_units(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct-unit frequency frame (w, s, wcnt) over a documents frame —
    the trainer's state base at the SentencePiece grain. At production
    scale the trainer runs over a bounded SAMPLE of this frame (the
    SentencePiece convention); encode never needs it (apply_merges_col
    is per-row)."""
    return (
        docs.select(sp_unit_col(text_col).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("wcnt"))
        .select("w", pad_symbols_col(F.col("w")).alias("s"), "wcnt")
    )


# ---------------------------------------------------------------------------
# frozen-merge application

def _merge_elems(merges: list) -> list[str]:
    """One literal string per merge, ``' l  r | lr '`` — pattern and
    replacement pre-joined with ``|`` (symbols are [a-z_], so ``|`` can
    never occur in one)."""
    out = []
    for l, r in merges:
        if "|" in l or "|" in r or " " in l or " " in r:
            raise ValueError(f"merge symbols must be space/pipe-free: {(l, r)!r}")
        out.append(f" {l}  {r} | {l}{r} ")
    return out


def apply_merges_col(state_col: Column, merges: list) -> Column:
    """Fold the frozen merge list over a padded symbol-state column: ONE
    ``aggregate`` higher-order expression over a literal array — the
    expression tree stays merge-count-INDEPENDENT in depth (no 300-deep
    replace chain for codegen to choke on), and execution is a tight
    per-row loop in the JVM.

    The array elements are (pattern, replacement) STRUCTS, not joined
    strings: HOF lambdas evaluate per (row x element), so a
    ``substring_index`` re-split inside the lambda would re-parse every
    merge for every row — measured 25% of the whole fold's cost at 50k
    docs x 320 merges. Struct field access is free.

    The literal array is built as ONE ``F.expr`` parse, not 320
    ``F.struct(F.lit, F.lit)`` calls: each functions.* call is a py4j
    round trip, and ~1,300 of them cost ~1.9 s of DRIVER time per query
    at clean ambient (tens of seconds when the container degrades) —
    measured as the whole fixed-cost floor of the deep-encode lanes.
    One parse of the equivalent SQL text is <50 ms and yields the same
    resolved expression."""
    for l, r in merges:  # same symbol hygiene _merge_elems enforces
        if " " in l or " " in r or "'" in l or "'" in r or "\\" in l or "\\" in r:
            raise ValueError(
                f"merge symbols must be space/quote/backslash-free: {(l, r)!r}"
            )
    elems = ", ".join(
        f"struct(' {l}  {r} ' as p, ' {l}{r} ' as q)" for l, r in merges
    )
    pairs = F.expr(f"array({elems})")
    return F.aggregate(
        pairs, state_col, lambda acc, m: F.replace(acc, m["p"], m["q"])
    )


def token_count_col(state_col: Column) -> Column:
    """Token count of a (post-merge) symbol state."""
    return F.size(
        F.filter(F.split(state_col, "  "), lambda x: x != F.lit(""))
    ).cast("long")


def merges_sql_literal(merges: list) -> str:
    """The frozen merge list as a DuckDB LIST literal of the same
    ``pattern|replacement`` elements ``apply_merges_col`` folds over."""
    return "[" + ", ".join(f"'{e}'" for e in _merge_elems(merges)) + "]"


def apply_merges_sql(state_expr: str, merges: list) -> str:
    """DuckDB twin of ``apply_merges_col``: list_reduce over the literal
    merge array, same left-to-right non-overlapping replace."""
    return (
        f"list_reduce(list_prepend({state_expr}, {merges_sql_literal(merges)}), "
        "(acc, x) -> replace(acc, split_part(x, '|', 1), "
        "split_part(x, '|', 2)))"
    )


TOKEN_COUNT_SQL = (
    "len(list_filter(string_split({state}, '  '), x -> x <> ''))::BIGINT"
)


# ---------------------------------------------------------------------------
# the committed artifact

@lru_cache(maxsize=4)
def load_vocab(path: str = DEEP_VOCAB_PATH) -> dict:
    """Load a committed vocabulary artifact. Shape:
    {"version", "unit", "marker", "trained_on", "params", "merges":
    [[l, r], ...]}. Merges are ordered by learned priority — application
    order IS this order."""
    with open(path) as f:
        v = json.load(f)
    v["merges"] = [tuple(m) for m in v["merges"]]
    return v


def save_vocab(path: str, merges: list, *, trained_on: str, params: dict) -> dict:
    art = {
        "version": 1,
        "unit": "sentencepiece-doc",
        "marker": MARKER,
        "trained_on": trained_on,
        "params": params,
        "n_merges": len(merges),
        "merges": [[l, r] for l, r, *_ in merges],
    }
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(art, f, indent=1)
    return art
