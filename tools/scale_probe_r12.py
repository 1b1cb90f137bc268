"""Round-12 scale probe: settle the flagship exponent the way round 11
settled dedup's — and decompose WHY a two-point exponent moves at all.

Round-11 question: hybrid_search_indexed read exponent 0.105/0.115 on
the r9/r10 replica sets but 0.206/0.287 on r11's two new sets. The
artifacts already contain the answer in raw seconds: the 100x point
BARELY moved across rounds (r10 3.461 s; r11 3.374/3.526 s) while the
10x point FELL from 2.656 s to 1.82-2.10 s — round 11's flagship
optimizations (-18% in AB_DRIFT_r11) lowered the fixed per-query floor,
and a two-point log-ratio exponent rises when its DENOMINATOR improves.
This probe makes that decomposition measurable instead of argued:

  * three scale points per set (1x = sf0.1 itself, 10x, 100x), min-of-3
    warmed passes, one session, both replica sets interleaved;
  * a least-squares fit t(N) = floor + marginal * N over the three
    points, reporting the floor (driver/planning cost, scale-free) and
    the marginal per-1x-of-corpus cost (the number that projects to
    100 TB) alongside the raw two-point exponent;
  * the dedup lanes ride along (10x/100x) so the round-12 adaptive
    banded expansion (plans/dedup_index pair_volume_cap routing) is
    measured in the same artifact that flagged it.

Usage:
    python tools/scale_probe_r12.py <a10> <a100> <b10> <b100> [out.json]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PASSES = 3
BASE = "/root/testdata/sf0.1"
DEDUP_QUERIES = ["dedup_minhash_lsh", "dedup_minhash_banded"]


def time_query(spark, fn, sf_dir: str) -> tuple[float, int]:
    best, n = None, 0
    for _ in range(PASSES):
        spark.catalog.clearCache()
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3), n


def fit_floor_marginal(points: list[tuple[float, float]]) -> tuple[float, float]:
    """Least-squares t = floor + marginal * N over (N, t) points."""
    n = len(points)
    sx = sum(p[0] for p in points)
    sy = sum(p[1] for p in points)
    sxx = sum(p[0] * p[0] for p in points)
    sxy = sum(p[0] * p[1] for p in points)
    marginal = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    floor = (sy - marginal * sx) / n
    return floor, marginal


def main(a10: str, a100: str, b10: str, b100: str, out_path: str | None) -> None:
    from mcp_local_rag_spark.queries import queries
    from mcp_local_rag_spark.session import get_spark

    spark = get_spark("scale-probe-r12")
    spark.range(1000).selectExpr("sum(id)").collect()
    qs = queries()
    flag = qs["hybrid_search_indexed"]

    result: dict = {"metric": "scale_probe_r12", "unit": "sec"}
    for set_name, d10, d100 in (("set_a", a10, a100), ("set_b", b10, b100)):
        t1, _ = time_query(spark, flag, BASE)
        t10, _ = time_query(spark, flag, d10)
        t100, _ = time_query(spark, flag, d100)
        floor, marginal = fit_floor_marginal(
            [(1.0, t1), (10.0, t10), (100.0, t100)]
        )
        entry: dict = {
            "hybrid_search_indexed": {
                "t_1x_sec": t1,
                "t_10x_sec": t10,
                "t_100x_sec": t100,
                "exponent_10_100": round(
                    math.log(t100 / t10) / math.log(10.0), 3
                ),
                "fit_floor_sec": round(floor, 3),
                "fit_marginal_sec_per_1x": round(marginal, 4),
                "marginal_10_to_100_sec": round(t100 - t10, 3),
            }
        }
        for name in DEDUP_QUERIES:
            q10, n10 = time_query(spark, qs[name], d10)
            q100, n100 = time_query(spark, qs[name], d100)
            e: dict = {
                "t_10x_sec": q10,
                "t_100x_sec": q100,
                "ratio": round(q100 / q10, 3),
                "exponent": round(math.log(q100 / q10) / math.log(10.0), 3),
                "pairs_10x": n10,
                "pairs_100x": n100,
            }
            if n10 and n100:
                e["us_per_pair_10x"] = round(q10 / n10 * 1e6, 3)
                e["us_per_pair_100x"] = round(q100 / n100 * 1e6, 3)
            entry[name] = e
        result[set_name] = entry
        print(f"# {set_name}: {json.dumps(entry)}", file=sys.stderr)

    result["provenance"] = (
        "Round 12: flagship probed at THREE scale points (sf0.1 base, "
        "10x, 100x replicas) on BOTH of round 11's replica sets "
        "(byte-identical /tmp dirs), one session, min-of-3 warmed "
        "passes, local[32]; linear fit t = floor + marginal*N decomposes "
        "the two-point exponent into a scale-free floor and a marginal "
        "per-corpus cost. Dedup lanes measured on the same sets; "
        "dedup_minhash_banded now routes its small-bucket expansion "
        "through the equi-join when estimated pair volume exceeds "
        "pair_volume_cap (round-12 adaptive expansion)."
    )
    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main(
        sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4],
        sys.argv[5] if len(sys.argv) > 5 else None,
    )
