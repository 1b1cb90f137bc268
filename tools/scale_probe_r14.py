"""Round-14 scaling probe: the standing heavy lanes (continuity with
BENCH_SCALE_r12/r13) plus the round's new operators — batched BPE
training and the training-epoch reader/packing lanes — at 10x and 100x
the bench corpus (tools/make_scaled_sf.py replicas).

Interpretation notes recorded with the artifact:
  * text_bpe_merges_batched trains over the DISTINCT-word table, which is
    invariant under replication (the synthetic corpus has 31 words), so
    its exponent measures only the corpus word-count scan — near-flat is
    the correct result, same as r13's sequential BPE line. The batched
    trainer's real scale axis is JOB WAVES per merge (merges/sweep),
    reported separately from the lane run.
  * corpus_epoch_order / corpus_pack_sequences are corpus-sized by
    nature (every sample gets an epoch position / pack slot); the scale
    question is per-row cost, not total time. The shard axis here is the
    20 synthetic sources — at production scale it is millions of tar
    shards, and both plans parallelize BY shard (partitioned windows),
    so task counts grow with the corpus.

Usage: python tools/scale_probe_r14.py <dir10> <dir100> [out.json]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "hybrid_search_indexed",
    "dedup_minhash_lsh",
    "dedup_minhash_banded",
    "text_bpe_merges_batched",
    "corpus_epoch_order",
    "corpus_pack_sequences",
]
PASSES = 3


def time_query(spark, fn, sf_dir: str) -> tuple[float, int]:
    best, n = None, 0
    for _ in range(PASSES):
        spark.catalog.clearCache()
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3), n


def main(dir10: str, dir100: str, out_path: str | None) -> None:
    from mcp_local_rag_spark.queries import queries
    from mcp_local_rag_spark.session import get_spark

    spark = get_spark("scale-probe-r14")
    spark.range(1000).selectExpr("sum(id)").collect()
    qs = queries()

    result: dict = {"metric": "scale_probe_r14", "unit": "sec", "queries": {}}
    for name in QUERIES:
        t10, n10 = time_query(spark, qs[name], dir10)
        t100, n100 = time_query(spark, qs[name], dir100)
        alpha = math.log(t100 / t10) / math.log(10.0)
        entry = {
            "t_10x_sec": t10,
            "t_100x_sec": t100,
            "ratio": round(t100 / t10, 3),
            "exponent": round(alpha, 3),
            "rows_10x": n10,
            "rows_100x": n100,
        }
        if n100:
            entry["us_per_row_10x"] = round(t10 / max(n10, 1) * 1e6, 3)
            entry["us_per_row_100x"] = round(t100 / n100 * 1e6, 3)
        result["queries"][name] = entry
        print(f"# {name}: 10x {t10}s ({n10} rows)  100x {t100}s ({n100} rows)"
              f"  exponent {entry['exponent']}", file=sys.stderr)

    # batched-BPE wave arithmetic: merges per distributed sweep on the
    # greedy depth fixture (the production strategy) — the number that
    # turns a 32k-merge vocabulary from 32k job waves into ~vocab/batch
    import itertools

    from mcp_local_rag_spark.queries.curation import _bpe_train_batched

    syll = ["ba", "ke", "lo", "mi", "ru", "ta", "zu", "en", "po", "qi",
            "vy", "wa"]
    vocab = ["".join(c) for c in itertools.product(syll, repeat=3)]
    words = spark.createDataFrame(
        [(w, "  " + "  ".join(w) + "  ", 1 + (i * 7) % 37)
         for i, w in enumerate(vocab)],
        "w string, s string, wcnt long",
    )
    t0 = time.time()
    merges, _, base = _bpe_train_batched(
        spark, None, sweeps=32, batch_cap=32, max_merges=256, words=words,
        select="greedy",
    )
    dt = round(time.time() - t0, 3)
    base.unpersist()
    sweeps_used = max(s for s, *_ in merges)
    result["bpe_batched_depth"] = {
        "merges": len(merges),
        "sweeps": sweeps_used,
        "merges_per_sweep": round(len(merges) / sweeps_used, 2),
        "wall_sec": dt,
        "sequential_equivalent_waves": len(merges),
    }
    print(f"# bpe_batched_depth: {len(merges)} merges in {sweeps_used} sweeps"
          f" ({dt}s)", file=sys.stderr)

    result["provenance"] = (
        "Round 14: 10x/100x corpus replicas of /root/testdata/sf0.1 "
        "(tools/make_scaled_sf.py, documents+embeddings), min-of-3 per "
        "point, fresh cache per pass, local[32]. BPE depth fixture: 1728 "
        "3-syllable words, greedy selection, cap 32."
    )
    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None)
