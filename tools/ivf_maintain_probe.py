"""Scale probe for the IVF maintenance loop (round 12): what does ONE
ivf_maintain() pass cost against a 10x and a 100x index, when a
proportional drift (a foreign blob = 10% of the corpus, appended into
one cell) needs fixing?

Designed decomposition: the STATS half (ivf_cell_stats) is one scan of
the whole index — linear in index size, embarrassingly parallel, cheap
per row; the REPAIR half (split_ivf_cell) rides the sick cell only
(~2/10 of the index here: base cell + blob). So the pass is expected
LINEAR with a small constant — the honest posture for a maintenance
scan — and the reported metric is us_per_row plus the split/stats
decomposition. The recall-restoration BEHAVIOR of maintenance is pinned
at unit-test level (tests/test_ivf_serve.py); this probe asserts only
that the drift triggers, the split lands, and a blob query finds blob
members afterwards.

Usage:
    python tools/ivf_maintain_probe.py <dir10> <dir100> [out.json]

Appends/updates an "ivf_maintain" entry if out.json already exists
(BENCH_SCALE_r12.json convention). TIMING data only.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _probe(spark, sf_dir: str, scratch: str) -> dict:
    from mcp_local_rag_spark.operators.ivf_serve import IvfVectorServer
    from mcp_local_rag_spark.plans.ann_index import (
        append_to_ivf_index,
        ivf_cell_stats,
        ivf_maintain,
        write_ivf_index,
    )
    from mcp_local_rag_spark.session import load

    shutil.rmtree(scratch, ignore_errors=True)
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", F.col("label").cast("int").alias("cell")
    )
    n_rows = emb.count()
    dim = len(emb.select("embedding").first()[0])
    t0 = time.time()
    write_ivf_index(emb, scratch, sort_cols=("vec_id",))
    t_build = time.time() - t0

    # proportional foreign blob (10% of corpus) into cell 0: unit
    # vectors near the normalized all-ones direction (tiny per-id jitter
    # in dim 0), ids above the corpus range
    blob_n = max(n_rows // 10, 1000)
    base = 1.0 / math.sqrt(dim)
    jit = F.col("id").cast("double") / F.lit(float(blob_n)) * 0.001
    blob = spark.range(blob_n).select(
        (F.col("id") + F.lit(10_000_000_000)).alias("vec_id"),
        F.array(
            F.lit(base) + jit, *[F.lit(base) for _ in range(dim - 1)]
        ).alias("embedding"),
        F.lit(0).cast("int").alias("cell"),
    )
    append_to_ivf_index(blob, scratch, sort_cols=("vec_id",))

    t0 = time.time()
    stats = ivf_cell_stats(spark, scratch, vec_col="embedding").collect()
    t_stats = time.time() - t0
    t0 = time.time()
    report = ivf_maintain(
        spark, scratch, split_fill_ratio=1.5, seed_col="vec_id",
    )
    t_maintain = time.time() - t0
    assert report["split"], f"drift did not trigger: {report}"
    # sanity: a blob-direction query finds blob members post-split
    server = IvfVectorServer(scratch)
    q = [base] * dim
    top = [h["neighbor_id"] for h in server.query(q, 10, nprobe=1)]
    assert all(i >= 10_000_000_000 for i in top), top[:3]
    return {
        "rows": int(n_rows + blob_n),
        "t_build_sec": round(t_build, 3),
        "t_stats_sec": round(t_stats, 3),
        "t_maintain_sec": round(t_maintain, 3),
        "us_per_row_maintain": round(
            t_maintain / (n_rows + blob_n) * 1e6, 3
        ),
        "cells_split": len(report["split"]),
        "n_cells": report["n_cells"],
    }


def main(d10: str, d100: str, out_path: str | None) -> None:
    from mcp_local_rag_spark.session import get_spark

    spark = get_spark("ivf-maintain-probe")
    spark.range(1000).selectExpr("sum(id)").collect()
    r10 = _probe(spark, d10, "/tmp/ivfm_10x")
    print(f"# 10x: {json.dumps(r10)}", file=sys.stderr)
    r100 = _probe(spark, d100, "/tmp/ivfm_100x")
    print(f"# 100x: {json.dumps(r100)}", file=sys.stderr)
    entry = {
        "x10": r10,
        "x100": r100,
        "exponent": round(
            math.log(r100["t_maintain_sec"] / r10["t_maintain_sec"])
            / math.log(10.0),
            3,
        ),
        "provenance": (
            "one ivf_maintain() pass against a label-partitioned IVF "
            "index over the 10x/100x embeddings replicas, after a "
            "proportional (10%-of-corpus) foreign blob drifted ONE "
            "cell; stats half scans the index once (linear, parallel), "
            "repair half splits only the sick cell (~2/10 of rows "
            "here); us_per_row is the scale metric. Recall restoration "
            "is pinned in tests/test_ivf_serve.py; the probe asserts "
            "the drift triggers, the split lands, and a blob query "
            "finds blob members afterwards."
        ),
    }
    print(json.dumps({"ivf_maintain": entry}))
    if out_path:
        merged = {}
        if os.path.exists(out_path):
            with open(out_path) as f:
                merged = json.load(f)
        merged["ivf_maintain"] = entry
        with open(out_path, "w") as f:
            f.write(json.dumps(merged) + "\n")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None)
