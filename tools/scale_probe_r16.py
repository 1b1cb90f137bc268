"""Round-16 scaling probe: the r15 continuity lanes plus the lanes this
round's optimizations touched, at 10x and 100x the bench corpus
(tools/make_scaled_sf.py replicas of documents+embeddings).

Round-16 additions and how to read them:
  * dedup_jaccard / dedup_clusters / dedup_containment /
    corpus_decontaminate_fuzzy — the verify-tier family rebuilt this
    round on dedup.doc_profiles (ONE map-side-combined shuffle builds
    the packed shingle set + MinHash signature) and
    jaccard_verify_sets' per-pair array_intersect (the pair-expanded
    shingle equi-join and its re-aggregate are gone). The scale claim
    is that the removed exchanges were corpus-stream-sized: the
    exponents should sit at/below the banded/LSH lanes' (the prefix is
    now the same one shuffle) with the verify tail linear in candidate
    pairs.
  * corpus_ngram_novelty — per-doc rollups of the first-occurrence
    aggregate replaced the stream re-join; exponent should track the
    distinct+vocab aggregates.
  * dedup_skew_storm keeps r15's min-of-1 override at 100x (the storm
    clique is quadratic BY CONSTRUCTION; the honest signal is
    skew_vs_uniform, not the absolute).

Usage: python tools/scale_probe_r16.py <dir10> <dir100> [out.json]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    # r12-r15 continuity
    "hybrid_search_indexed",
    "dedup_minhash_lsh",
    "dedup_minhash_banded",
    "dedup_skew_storm",
    "corpus_epoch_order",
    "corpus_pack_sequences",
    # r16-touched lanes
    "dedup_jaccard",
    "dedup_clusters",
    "dedup_containment",
    "corpus_decontaminate_fuzzy",
    "corpus_ngram_novelty",
]
PASSES = 3
PASS_OVERRIDE = {
    ("dedup_skew_storm", "100x"): 1,
    # graph/verify lanes at 100x run minutes-scale pipelines; min-of-2
    # bounds probe wall while keeping a re-run to shave cold-JVM noise
    ("dedup_jaccard", "100x"): 2,
    ("dedup_clusters", "100x"): 2,
    ("dedup_containment", "100x"): 2,
    ("corpus_decontaminate_fuzzy", "100x"): 2,
}


def time_query(spark, name, fn, sf_dir: str, passes: int = PASSES) -> tuple[float, int]:
    best, n = None, 0
    for _ in range(passes):
        spark.catalog.clearCache()
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3), n


def main(dir10: str, dir100: str, out_path: str | None) -> None:
    from mcp_local_rag_spark.queries import queries
    from mcp_local_rag_spark.session import get_spark

    spark = get_spark("scale-probe-r16")
    spark.range(1000).selectExpr("sum(id)").collect()
    qs = queries()

    result: dict = {"metric": "scale_probe_r16", "unit": "sec", "queries": {}}
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

    q = result["queries"]
    if "dedup_skew_storm" in q and "dedup_minhash_lsh" in q:
        result["skew_vs_uniform"] = {
            "wall_ratio_10x": round(
                q["dedup_skew_storm"]["t_10x_sec"]
                / q["dedup_minhash_lsh"]["t_10x_sec"], 3,
            ),
            "wall_ratio_100x": round(
                q["dedup_skew_storm"]["t_100x_sec"]
                / q["dedup_minhash_lsh"]["t_100x_sec"], 3,
            ),
        }
    out = json.dumps(result)
    print(out)
    if out_path:
        with open(out_path, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None)
