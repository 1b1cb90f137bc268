"""Round-15 scaling probe: continuity heavy lanes (BENCH_SCALE_r12-r14
lineage) plus the round's new operators at 10x and 100x the bench corpus
(tools/make_scaled_sf.py replicas).

Round-15 additions and how to read them:
  * text_bpe_encode_deep / corpus_pack_deep_vocab — the frozen 320-merge
    vocabulary hot path. Encode is ONE map-only projection (a per-row
    fold of the literal merge list), so the scale question is per-row
    cost staying flat across the input decade; the pack lane adds the
    shard-partitioned epoch/packing windows on top.
  * dedup_skew_storm — the adversarial boilerplate storm (4% identical +
    4% near-identical text, salted candidate join, bucket_cap=8). The
    storm CLIQUE grows quadratically with corpus size by construction
    (4% of 100x = a 20k-document identical group), so total time is
    output-bound; the honest numbers are us_per_pair and the
    skew_vs_uniform wall ratio against dedup_minhash_lsh over the SAME
    replica (uniform text, same pipeline) — salting keeps the storm's
    quadratic bucket spread across tasks instead of one straggler.
  * corpus_epoch_resume — the mid-epoch resume predicate; driver-side
    shard cut + one windowed lookup, expected ~epoch_order cost.

Usage: python tools/scale_probe_r15.py <dir10> <dir100> [out.json]
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
    "dedup_skew_storm",
    "text_bpe_encode_deep",
    "corpus_pack_deep_vocab",
    "corpus_epoch_order",
    "corpus_epoch_resume",
    "corpus_pack_sequences",
]
PASSES = 3
# the storm lane's 100x output is ~4e8 pair rows (the 20k-doc clique is
# quadratic BY CONSTRUCTION) — one pass is minutes; min-of-1 there, the
# ratio vs the uniform lane is the signal, not the absolute
PASS_OVERRIDE = {("dedup_skew_storm", "100x"): 1}


# count() lets Catalyst PRUNE unreferenced projection work — on a pure
# map-only lane like the deep encode, a bare count never evaluates the
# fold and the timing is vacuous (caught in r15: 0.4s for what is
# actually ~20 s of single-task fold). Lanes here force full evaluation
# through a checksum aggregate over their value columns.
FORCE_EVAL = {
    "text_bpe_encode_deep": lambda df: df.selectExpr(
        "count(*) AS n", "sum(n_tokens)"
    ),
}


def time_query(spark, name, fn, sf_dir: str, passes: int = PASSES) -> tuple[float, int]:
    best, n = None, 0
    force = FORCE_EVAL.get(name)
    for _ in range(passes):
        spark.catalog.clearCache()
        t0 = time.time()
        if force:
            n = int(force(fn(spark, sf_dir)).first()["n"])
        else:
            n = fn(spark, sf_dir).count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3), n


def main(dir10: str, dir100: str, out_path: str | None) -> None:
    from mcp_local_rag_spark.queries import queries
    from mcp_local_rag_spark.session import get_spark

    spark = get_spark("scale-probe-r15")
    spark.range(1000).selectExpr("sum(id)").collect()
    qs = queries()

    result: dict = {"metric": "scale_probe_r15", "unit": "sec", "queries": {}}
    for name in QUERIES:
        t10, n10 = time_query(
            spark, name, qs[name], dir10,
            PASS_OVERRIDE.get((name, "10x"), PASSES),
        )
        t100, n100 = time_query(
            spark, name, qs[name], dir100,
            PASS_OVERRIDE.get((name, "100x"), PASSES),
        )
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
        print(
            f"# {name}: 10x {t10}s ({n10} rows)  100x {t100}s ({n100} rows)"
            f"  exponent {entry['exponent']}",
            file=sys.stderr,
        )

    # the skew line: storm wall vs the uniform pipeline on the SAME
    # replica — bounded-straggler evidence at scale
    q = result["queries"]
    if "dedup_skew_storm" in q and "dedup_minhash_lsh" in q:
        result["skew_vs_uniform"] = {
            "wall_ratio_10x": round(
                q["dedup_skew_storm"]["t_10x_sec"]
                / q["dedup_minhash_lsh"]["t_10x_sec"],
                3,
            ),
            "wall_ratio_100x": round(
                q["dedup_skew_storm"]["t_100x_sec"]
                / q["dedup_minhash_lsh"]["t_100x_sec"],
                3,
            ),
            "note": (
                "storm pair output grows ~quadratically in the storm "
                "group by construction; a bounded wall ratio means the "
                "salted join spread the mega-bucket instead of serializing "
                "it on one task"
            ),
        }

    result["provenance"] = (
        "Round 15: 10x/100x corpus replicas of /root/testdata/sf0.1 "
        "(tools/make_scaled_sf.py, documents+embeddings), min-of-3 per "
        "point, fresh cache per pass, local[32]. Deep-vocab lanes apply "
        "the committed 320-merge artifact (assets/vocab_deep.json); the "
        "encode lane is forced through a checksum aggregate (count alone "
        "prunes a map-only projection). Parallelism caveat: each replica "
        "is ONE parquet file, so map-only lanes run 1-2 tasks here — "
        "their absolute walls are single-core throughput; the plans are "
        "partition-parallel (explain-audited in PLANS.md r15)."
    )
    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None)
