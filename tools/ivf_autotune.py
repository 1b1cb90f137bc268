"""IVF nprobe/recall autotune report — the serving tier's 1B-row sizing
exercise (VERDICT r8 item 6): build a KMeans IVF index with standard
~sqrt(N) cell sizing over a (replicated) embeddings corpus, then sweep
nprobe and report the recall@10 vs latency frontier so an operator can
pick the probe width that meets a recall target at the lowest p95.

Recall ground truth is the exact cosine top-10 (numpy over the full
matrix — fine on a probe host; the point of the IVF tier is that the
SERVER never does this). Usage:

    python tools/make_scaled_sf.py /root/testdata/sf0.1 <dir> 100 documents,embeddings
    python tools/ivf_autotune.py <dir> [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NPROBES = [1, 2, 4, 8, 16, 32]
N_QUERIES = 40
K = 10


def main(sf_dir: str, out_path: str | None) -> None:
    import numpy as np
    from pyspark.sql import functions as F

    from mcp_local_rag_spark.operators.ivf_serve import IvfVectorServer
    from mcp_local_rag_spark.operators.similarity import ivf_assign
    from mcp_local_rag_spark.plans.ann_index import write_ivf_index
    from mcp_local_rag_spark.session import get_spark, load

    from mcp_local_rag_spark.queries.rag import _scratch_path

    spark = get_spark("ivf-autotune")
    emb = load(spark, sf_dir, "embeddings")
    n_rows = emb.count()
    n_cells = max(4, min(4096, int(n_rows**0.5)))
    # repo-local .scratch keyed by corpus generation — NEVER inside the
    # (read-only) testdata dir
    path = _scratch_path(sf_dir, "ann_autotune", tables=("embeddings",))
    if not os.path.isdir(path):
        # drop the table's own 'label' column first: ivf_assign appends a
        # KMeans 'label' and the rename to 'cell' must be unambiguous
        assigned, _ = ivf_assign(
            emb.select("vec_id", "embedding"), n_cells, id_col="vec_id", seed=42
        )
        write_ivf_index(
            assigned.withColumnRenamed("label", "cell"), path,
            sort_cols=("vec_id",), meta={"n_cells": n_cells},
        )

    # exact ground truth for the query sample, numpy over the full matrix
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    q_rows = sorted(rows, key=lambda r: r.vec_id)[:N_QUERIES]
    truth = {}
    for r in q_rows:
        qv = np.array(r.embedding, dtype=np.float64)
        qv /= np.linalg.norm(qv)
        cos = mat @ qv
        # the serving total order: (round(cos,6) desc, id asc), self excluded
        keyed = sorted(
            ((round(float(c), 6), int(i)) for c, i in zip(cos, ids) if i != r.vec_id),
            key=lambda t: (-t[0], t[1]),
        )
        truth[r.vec_id] = {i for _, i in keyed[:K]}

    server = IvfVectorServer(path)
    report = {
        "metric": "ivf_autotune",
        "sf_dir": sf_dir,
        "n_vectors": int(n_rows),
        "n_cells": int(n_cells),
        "k": K,
        "n_queries": len(q_rows),
        "frontier": [],
    }
    for nprobe in NPROBES:
        if nprobe > n_cells:
            break
        server.invalidate()  # cold cache per config: honest I/O story
        server.query(list(q_rows[0].embedding), K, nprobe=nprobe)  # warm process
        hits = total = 0
        times = []
        for r in q_rows:
            t0 = time.time()
            res = server.query(
                list(r.embedding), K, nprobe=nprobe, exclude_id=r.vec_id
            )
            times.append((time.time() - t0) * 1000)
            got = {int(h["neighbor_id"]) for h in res}
            hits += len(got & truth[r.vec_id])
            total += K
        times.sort()
        entry = {
            "nprobe": nprobe,
            "recall_at_10": round(hits / total, 4),
            "p50_ms": round(times[len(times) // 2], 2),
            "p95_ms": round(times[max(0, int(len(times) * 0.95) - 1)], 2),
            "cells_cached": len(server._cells),
        }
        report["frontier"].append(entry)
        print(f"# nprobe={nprobe}: recall@10={entry['recall_at_10']} "
              f"p50={entry['p50_ms']}ms p95={entry['p95_ms']}ms",
              file=sys.stderr)

    # quantization ladder at the frontier knee (nprobe=2): resident
    # bytes vs recall vs latency for exact / int8 / residual-PQ+refine /
    # pure-ADC — the 1B-row memory-sizing table
    from mcp_local_rag_spark.operators.pq import (
        PQ_CODEBOOKS_FILE, train_pq_for_index,
    )

    if not os.path.isfile(os.path.join(path, PQ_CODEBOOKS_FILE)):
        train_pq_for_index(path, m=8, k=256, seed=0)
    from mcp_local_rag_spark.operators.pq import PQ_CODES_DIR, encode_index_codes

    if not os.path.isdir(os.path.join(path, PQ_CODES_DIR)):
        encode_index_codes(spark, path)
    ladder = []
    for label, kw, qkw in (
        ("exact", {}, {}),
        ("int8", {"quantization": "int8"}, {}),
        ("pq_refine8", {"quantization": "pq"}, {"refine": 8}),
        ("pq_adc_only", {"quantization": "pq"}, {"refine": 0}),
    ):
        srv = IvfVectorServer(path, **kw)
        srv.query(list(q_rows[0].embedding), K, nprobe=2, **qkw)  # warm
        hits = total = 0
        times = []
        for r in q_rows:
            t0 = time.time()
            res = srv.query(
                list(r.embedding), K, nprobe=2, exclude_id=r.vec_id, **qkw
            )
            times.append((time.time() - t0) * 1000)
            hits += len({int(h["neighbor_id"]) for h in res} & truth[r.vec_id])
            total += K
        times.sort()
        ladder.append({
            "mode": label,
            "recall_at_10": round(hits / total, 4),
            "p50_ms": round(times[len(times) // 2], 2),
            "p95_ms": round(times[max(0, int(len(times) * 0.95) - 1)], 2),
            "resident_cache_bytes": int(srv.cached_bytes()),
            "refine_reads": int(srv.refine_reads),
            "code_loads": int(srv.code_loads),
        })
        print(f"# quant={label}: recall@10={ladder[-1]['recall_at_10']} "
              f"p95={ladder[-1]['p95_ms']}ms "
              f"resident={ladder[-1]['resident_cache_bytes']}B",
              file=sys.stderr)
    report["quantization_ladder_nprobe2"] = ladder

    line = json.dumps(report)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else None)
