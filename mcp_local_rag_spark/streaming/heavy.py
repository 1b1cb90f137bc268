"""Streaming heavy-hitter candidates: sharded Misra-Gries in keyed state.

The streaming half of operators/skew.heavy_hitters_exact. Items hash into
``n_shards`` state shards; each shard's state is one Misra-Gries summary
with ``k`` counters (O(k) bytes per shard FOREVER, independent of stream
length — the whole point). Every micro-batch emits the shard's current
candidate set in update mode.

Guarantee carried over from the batch operator: a key whose true count
exceeds (stream total)/k survives in its shard's summary — MG decrements
cost every key equally, and a shard only sees its own key's full count.
So the union of shard candidates is a SUPERSET of the true heavy hitters
at any point in time; the consumer turns candidates into exact answers
with a keyed recount over the stored events (the batch operator's pass 2),
typically on a schedule.

State is serialized as one JSON string column — the summary is a tiny
dict (<= k entries) and JSON keeps the state schema trivial and stable
across restarts.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

OUT_SCHEMA = StructType(
    [
        StructField("shard", LongType()),
        StructField("key", StringType()),
        StructField("est_count", LongType()),
    ]
)
STATE_SCHEMA = StructType([StructField("summary_json", StringType())])


def _mg_fn(k: int, key_col: str):
    def fn(key, pdf_iter, state):
        shard = int(key[0])
        counters: dict[str, int] = (
            json.loads(state.get[0]) if state.exists else {}
        )
        for pdf in pdf_iter:
            vc = pdf[key_col].dropna().astype(str).value_counts()
            for kk, c in vc.items():
                counters[kk] = counters.get(kk, 0) + int(c)
            if len(counters) > k:
                d = sorted(counters.values(), reverse=True)[k]
                counters = {kk: c - d for kk, c in counters.items() if c - d > 0}
        state.update((json.dumps(counters),))
        yield pd.DataFrame(
            {
                "shard": [shard] * len(counters),
                "key": list(counters.keys()),
                "est_count": [int(c) for c in counters.values()],
            }
        )

    return fn


def heavy_hitter_candidates_stream(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    k: int = 50,
    n_shards: int = 8,
) -> DataFrame:
    """Per-micro-batch Misra-Gries candidate sets over a keyed stream.

    Works on a batch DataFrame too (same sharded MG via mapInPandas-style
    grouping), so backfill and stream share the call site; the batch path
    simply runs one "micro-batch" per shard.
    """
    sharded = events.select(
        F.pmod(F.hash(F.col(key_col)), F.lit(n_shards)).cast("long").alias("shard"),
        F.col(key_col),
    )
    if not events.isStreaming:
        # mapInPandas over shard-clustered partitions, NOT applyInPandas:
        # the latter materializes a whole shard (1/n_shards of the input)
        # as one pandas frame. Here each Arrow batch streams through the
        # same MG merge, with one summary dict per shard in the partition
        # — O(k * shards_per_partition) memory at any input size.
        def batch_fn(batches):
            summaries: dict[int, dict[str, int]] = {}
            for pdf in batches:
                for shard, grp in pdf.groupby("shard"):
                    counters = summaries.setdefault(int(shard), {})
                    vc = grp[key_col].dropna().astype(str).value_counts()
                    for kk, c in vc.items():
                        counters[kk] = counters.get(kk, 0) + int(c)
                    if len(counters) > k:
                        d = sorted(counters.values(), reverse=True)[k]
                        summaries[int(shard)] = {
                            kk: c - d for kk, c in counters.items() if c - d > 0
                        }
            rows = [
                (shard, kk, int(c))
                for shard, counters in summaries.items()
                for kk, c in counters.items()
            ]
            yield pd.DataFrame(rows, columns=["shard", "key", "est_count"])

        return sharded.repartition(n_shards, "shard").mapInPandas(
            batch_fn, OUT_SCHEMA
        )
    return sharded.groupBy("shard").applyInPandasWithState(
        _mg_fn(k, key_col),
        OUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
