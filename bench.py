"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "hybrid_search",       # flagship: vector top-k + grouping + BM25 + boost
    "hybrid_search_indexed",  # steady-state: same pipeline over the persisted FTS index
    "hybrid_search_batch",    # 3 concurrent queries, full pipeline, one corpus scan
    "vector_topk",         # flat KNN over the corpus
    "bm25_unigram",        # keyword index build + score
    "tpch_q1_pricing",     # wide aggregation over lineitem
    "tpch_q3_topk",        # 3-way join + top-k
    "sync_plan",           # full-outer reconcile planner
    "dedup_minhash_lsh",   # shingle -> minhash -> band -> pair join
    "knn_bruteforce",      # brute-force cosine top-k
    "events_sessionize",   # stateful-shaped window pipeline
    "text_quality",        # per-doc analytics scan
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    from mcp_local_rag_spark.queries import queries
    from mcp_local_rag_spark.session import get_spark

    spark = get_spark("bench")
    qs = queries()
    # warm the JVM/codegen path once so per-query numbers measure the plan,
    # not session startup
    spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        best, n = None, 0
        # three passes, keep the min: smooths JIT/codegen warmup and the
        # sporadic multi-second scheduler stalls seen in this container
        # (observed: a 30 s stall on an otherwise ~1 s warm query)
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.time()
            n = qs[name](spark, sf_dir).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        print(f"# {name}: {n} rows in {timings[name]:.2f}s", file=sys.stderr)

    # BASELINE.md's one true latency SLO: read_chunk_neighbors P95 < 100 ms
    # on a 10,000-chunk document (warmed). Two shapes over the same
    # bucketed+sorted layout: the serving-path point reader (the SLO
    # analogue — BASELINE.json: "serving requires external system") and the
    # in-plan Spark read (pays Catalyst planning per query).
    serve_p95_ms, spark_p95_ms, warm_p95_ms, pinned_p95_ms = _neighbor_bench(spark)
    anchors = _derived_anchors(spark, qs, sf_dir)
    ambient = _ambient_control(spark)

    total = round(sum(timings.values()), 3)
    # the config stamp makes any two runs verifiably same-config: the
    # round-11 "9.94 s builder vs 10.65 s driver" confusion was two runs
    # of identical HEAD+config at different container moments — the
    # stamp proves the config half so notes can attribute the rest to
    # temporal drift (and BENCH_NOTES must quote BOTH numbers)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "n_registry_queries": len(qs),
                "sf": sf,
                "config": {
                    "sf_dir": sf_dir,
                    "master": f"local[{cpus}]",
                    "cpus_env": cpus,
                    "passes": "min-of-3",
                },
                "neighbor_read_p95_ms": serve_p95_ms,
                "neighbor_read_sparkplan_p95_ms": spark_p95_ms,
                "neighbor_read_warm_p95_ms": warm_p95_ms,
                "neighbor_read_pinned_p95_ms": pinned_p95_ms,
                "ambient_control": ambient,
                **anchors,
            }
        )
    )


def _ambient_control(spark) -> dict:
    """Container-speed denominators recorded INSIDE every bench artifact,
    so cross-round comparisons normalize against the machine's speed AT
    RECORDING TIME instead of a narrative ("the +23% was ambient"). Three
    probes, none touching any package code path:

      * numpy_matmul_ms — fixed 512x512 matmul median: pure-CPU speed
        (no Spark, no disk, no JVM). The round-13 evidence lane: when
        this degrades together with the Spark numbers, the swing is the
        box, not the code.
      * spark_jobfloor_p95_ms — re-collect of ONE pre-planned 100-row
        frame: scheduler + task-launch + result-fetch floor with ZERO
        per-query planning. The lower bound any cold in-plan read pays.
      * spark_coldplan_p95_ms — a fresh trivial plan per pass (new
        literal each time, so analysis/optimization/codegen re-run):
        the planning-path ambient that dominates the neighbor SLO lane.
    """
    import numpy as np

    rng = np.random.default_rng(7)
    a = rng.standard_normal((512, 512))
    (a @ a).sum()  # warm (BLAS thread pool spin-up)
    ts = []
    for _ in range(20):
        t0 = time.time()
        (a @ a).sum()
        ts.append((time.time() - t0) * 1000)
    ts.sort()
    numpy_ms = round(ts[len(ts) // 2], 2)

    fixed = spark.range(100).filter("id % 7 = 3")
    fixed.collect()  # warm: plan once
    ts = []
    for _ in range(30):
        t0 = time.time()
        fixed.collect()
        ts.append((time.time() - t0) * 1000)
    ts.sort()
    jobfloor_p95 = round(ts[int(len(ts) * 0.95) - 1], 1)

    spark.range(100).where("id = 0").collect()  # warm the shape
    ts = []
    for i in range(30):
        t0 = time.time()
        spark.range(100).where(f"id = {i}").collect()
        ts.append((time.time() - t0) * 1000)
    ts.sort()
    coldplan_p95 = round(ts[int(len(ts) * 0.95) - 1], 1)

    print(
        f"# ambient: numpy {numpy_ms}ms  jobfloor p95 {jobfloor_p95}ms"
        f"  coldplan p95 {coldplan_p95}ms",
        file=sys.stderr,
    )
    return {
        "numpy_matmul_ms": numpy_ms,
        "spark_jobfloor_p95_ms": jobfloor_p95,
        "spark_coldplan_p95_ms": coldplan_p95,
    }


def _derived_anchors(spark, qs, sf_dir) -> dict:
    """BASELINE.md 'throughput anchors to derive during bench':
    chunks-embedded/sec through the full split+embed+chunk pipeline, and
    warmed query p50/p95 for the flat KNN and the indexed hybrid."""
    from pyspark.sql import functions as F

    from mcp_local_rag_spark.plans.ingest import build_chunks
    from mcp_local_rag_spark.session import load

    docs = (
        load(spark, sf_dir, "documents")
        .limit(1000)
        .select(
            F.concat(F.lit("/bench/doc"), F.col("doc_id").cast("string"), F.lit(".md")).alias("path"),
            F.col("text"),
            F.col("text").substr(1, 40).alias("title"),
            F.md5("text").alias("contentHash"),
            F.length("text").cast("long").alias("length"),
        )
    )
    t0 = time.time()
    n_chunks = build_chunks(docs, dim=64, backend="pseudo").count()
    ingest_sec = time.time() - t0
    chunks_per_sec = round(n_chunks / ingest_sec, 1) if ingest_sec > 0 else None

    # bulk anchor: the SAME pipeline over the whole sf's documents table.
    # The 1000-doc anchor above is fixed-cost dominated (Python-stage
    # startup + one shuffle ~3 s) and measures the small-batch latency
    # floor; this one measures marginal throughput, the number that
    # projects to a bulk backfill (50k replicated docs run ~3.6k chunks/s
    # on local[32]).
    bulk = (
        load(spark, sf_dir, "documents")
        .select(
            F.concat(F.lit("/bench/bulk"), F.col("doc_id").cast("string"), F.lit(".md")).alias("path"),
            F.col("text"),
            F.col("text").substr(1, 40).alias("title"),
            F.md5("text").alias("contentHash"),
            F.length("text").cast("long").alias("length"),
        )
    )
    t0 = time.time()
    n_bulk = build_chunks(bulk, dim=64, backend="pseudo").count()
    bulk_sec = time.time() - t0
    bulk_per_sec = round(n_bulk / bulk_sec, 1) if bulk_sec > 0 else None

    def _latency(name, reps):
        q = qs[name]
        q(spark, sf_dir).count()  # warm
        times = []
        for _ in range(reps):
            t0 = time.time()
            q(spark, sf_dir).count()
            times.append(time.time() - t0)
        times.sort()
        return (
            round(times[len(times) // 2] * 1000, 1),
            round(times[max(0, int(len(times) * 0.95) - 1)] * 1000, 1),
        )

    v50, v95 = _latency("vector_topk", 10)
    h50, h95 = _latency("hybrid_search_indexed", 6)
    sv50, sv95 = _vector_serve_bench(spark, sf_dir)
    hs50, hs95 = _hybrid_serve_bench(spark, sf_dir)
    iv50, iv95 = _ivf_serve_bench(spark, sf_dir)
    wp50, wp95 = _warehouse_point_bench(spark, sf_dir)
    print(
        f"# anchors: ingest {chunks_per_sec} chunks/s (bulk {bulk_per_sec}); vector_topk p50/p95 "
        f"{v50}/{v95} ms; hybrid_indexed p50/p95 {h50}/{h95} ms",
        file=sys.stderr,
    )
    return {
        "ingest_chunks_per_sec": chunks_per_sec,
        "ingest_bulk_chunks_per_sec": bulk_per_sec,
        "vector_topk_p50_ms": v50,
        "vector_topk_p95_ms": v95,
        "hybrid_indexed_p50_ms": h50,
        "hybrid_indexed_p95_ms": h95,
        "vector_serve_p50_ms": sv50,
        "vector_serve_p95_ms": sv95,
        "hybrid_serve_p50_ms": hs50,
        "hybrid_serve_p95_ms": hs95,
        "ivf_serve_p50_ms": iv50,
        "ivf_serve_p95_ms": iv95,
        "warehouse_point_p50_ms": wp50,
        "warehouse_point_p95_ms": wp95,
    }


def _warehouse_point_bench(spark, sf_dir) -> tuple[float, float]:
    """Serving-path snapshot-table point read (plans/point_read
    SnapshotReader): manifest resolved driver-locally, bucket routed via
    the xxhash64 mirror, one pyarrow dataset filter — the NeighborServer
    pattern over the warehouse layer. Reads the CDC-merged documents
    table the warehouse lanes build."""
    import time

    from mcp_local_rag_spark.plans.point_read import SnapshotReader
    from mcp_local_rag_spark.queries.warehouse import _merged_docs_table

    table = _merged_docs_table(spark, sf_dir)
    reader = SnapshotReader(table)
    reader.lookup(3)  # warm: manifest + dataset handle + footer
    times = []
    for i in range(400):
        t0 = time.time()
        rows = reader.lookup(3 + i * 7)
        times.append((time.time() - t0) * 1000)
        assert isinstance(rows, list)
    times.sort()
    return (
        round(times[len(times) // 2], 2),
        round(times[max(0, int(len(times) * 0.95) - 1)], 2),
    )


def _hybrid_serve_bench(spark, sf_dir) -> tuple[float, float]:
    """Serving-path FULL hybrid query (operators/hybrid_serve): the
    complete query_documents pipeline — vector top-k, grouping, BM25 over
    the persisted postings, boost, file filter — per-query from pyarrow +
    numpy, against the same persisted tables the indexed Spark path
    reads. Parity with the Spark pipeline is pinned in tests."""
    from mcp_local_rag_spark.operators.hybrid_serve import HybridSearchServer
    from mcp_local_rag_spark.queries.rag import _indexed_corpus, _scratch_path

    _indexed_corpus(spark, sf_dir)
    server = HybridSearchServer(
        _scratch_path(sf_dir, "chunks"), _scratch_path(sf_dir, "fts")
    )
    server.query("spark join filter merge", limit=10, grouping="related",
                 max_files=3)  # load + warm
    times = []
    for i in range(20):
        t0 = time.time()
        server.query(f"spark join filter merge {i}", limit=10,
                     grouping="related", max_files=3)
        times.append((time.time() - t0) * 1000)
    times.sort()
    return (
        round(times[len(times) // 2], 2),
        round(times[int(len(times) * 0.95) - 1], 2),
    )


def _ivf_serve_bench(spark, sf_dir) -> tuple[float, float]:
    """Serving-path IVF top-k (operators/ivf_serve): warmed per-query
    latency against the persisted cell-partitioned index — the serving
    tier's 100 TB scale path (per-query I/O = probed cells only)."""
    import os

    from pyspark.sql import functions as F

    from mcp_local_rag_spark.operators.ivf_serve import IvfVectorServer
    from mcp_local_rag_spark.plans.ann_index import write_ivf_index
    from mcp_local_rag_spark.queries.rag import _scratch_path
    from mcp_local_rag_spark.session import load

    path = _scratch_path(sf_dir, "ann_ivf_serve", tables=("embeddings",))
    emb = load(spark, sf_dir, "embeddings")
    if not os.path.isdir(path):
        write_ivf_index(
            emb.withColumn("cell", F.col("label")), path,
            sort_cols=("vec_id",), meta={"source": "label"},
        )
    qvecs = [r.embedding for r in emb.filter(F.col("vec_id") < 25).collect()]
    server = IvfVectorServer(path)
    for qv in qvecs:  # warm every probed cell: the lane measures the
        server.query(qv, 10, nprobe=2)  # steady state, not first-touch IO
    times = []
    for i in range(40):
        qv = qvecs[i % len(qvecs)]
        t0 = time.time()
        server.query(qv, 10, nprobe=2)
        times.append((time.time() - t0) * 1000)
    times.sort()
    return (
        round(times[len(times) // 2], 2),
        round(times[int(len(times) * 0.95) - 1], 2),
    )


def _vector_serve_bench(spark, sf_dir) -> tuple[float, float]:
    """Serving-path vector top-k (operators/vector_serve): warmed per-query
    latency over the SAME persisted chunks table the indexed hybrid reads
    — the query-side twin of the NeighborServer SLO anchor."""
    from mcp_local_rag_spark.embedder import pseudo_embed
    from mcp_local_rag_spark.operators.vector_serve import VectorSearchServer
    from mcp_local_rag_spark.queries.rag import _indexed_corpus, _scratch_path

    _indexed_corpus(spark, sf_dir)  # ensure the persisted table exists
    server = VectorSearchServer(_scratch_path(sf_dir, "chunks"))
    server.query(pseudo_embed("warm", 64), 10)  # load + warm
    times = []
    for i in range(20):
        t0 = time.time()
        server.query(pseudo_embed(f"bench query {i}", 64), 10)
        times.append((time.time() - t0) * 1000)
    times.sort()
    return (
        round(times[len(times) // 2], 2),
        round(times[int(len(times) * 0.95) - 1], 2),
    )


def _neighbor_bench(spark) -> tuple[float, float, float, float]:
    import tempfile

    from pyspark.sql import functions as F

    from mcp_local_rag_spark.operators.neighbors import NeighborServer, read_neighbors
    from mcp_local_rag_spark.plans.ingest import write_chunks

    table = tempfile.mkdtemp() + "/chunks"
    doc = "/bench/doc10k.md"
    rows = spark.range(10_000).select(
        F.lit(doc).alias("filePath"),
        F.col("id").cast("int").alias("chunkIndex"),
        F.concat(F.lit("chunk text number "), F.col("id").cast("string")).alias("text"),
    )
    write_chunks(rows, table)

    # 50 reps per lane (was 20): the SLO gate is a P95, and the p95 of a
    # 20-sample set is the second-worst sample — one scheduler stall
    # flips the verdict. 50 samples put 3 above the p95 cut, which is
    # what the reference's perf test effectively measures (repeated
    # warmed reads, rag-server.read-neighbors.perf.test.ts:68-89).
    server = NeighborServer(spark, table)
    server.read(doc, 5000)  # warm (resolves + caches the hash bucket)
    serve = []
    for i in range(50):
        t0 = time.time()
        server.read(doc, 100 + (i % 20) * 400)
        serve.append((time.time() - t0) * 1000)
    serve.sort()
    serve_p95 = serve[int(len(serve) * 0.95) - 1]

    chunks = spark.read.parquet(table)
    # SLO lane: replicate the REFERENCE perf test's exact shape
    # (rag-server.read-neighbors.perf.test.ts:68-89) — warm indices
    # [100, 5000, 9500], then time [50, 2500, 5000, 7500, 9950] x 4.
    # 4 of the 5 timed positions are FIRST-SIGHT, so the reference's own
    # p95 (2nd-worst of 20) includes cold planning/compile cost; timing a
    # fully-pre-warmed set here would exclude exactly the per-shape
    # Janino-compile cost this repo pays and the reference doesn't
    # (round-14 advice). This lane is the SLO-comparable number.
    for idx in (100, 5000, 9500):
        read_neighbors(chunks, doc, idx).collect()
    times = []
    for _round in range(4):
        for idx in (50, 2500, 5000, 7500, 9950):
            t0 = time.time()
            read_neighbors(chunks, doc, idx).collect()
            times.append((time.time() - t0) * 1000)
    times.sort()
    p95 = times[int(len(times) * 0.95) - 1]

    # steady-state lane (NOT the SLO gate): every target shape pre-warmed,
    # 50 reps — what a server re-reading hot documents sees. Reported
    # separately so the warm number never masquerades as the SLO.
    for i in range(20):
        read_neighbors(chunks, doc, 100 + i * 400).collect()
    wtimes = []
    for i in range(50):
        t0 = time.time()
        read_neighbors(chunks, doc, 100 + (i % 20) * 400).collect()
        wtimes.append((time.time() - t0) * 1000)
    wtimes.sort()
    warm_p95 = wtimes[int(len(wtimes) * 0.95) - 1]

    # the pinned in-plan variant: repeated reads of one document against a
    # persisted single-bucket frame (operators/neighbors.pin_document_frame)
    # — removes per-read parquet re-planning; what remains is Spark's
    # job-submission floor
    from mcp_local_rag_spark.operators.neighbors import pin_document_frame
    from mcp_local_rag_spark.plans.ingest import table_n_buckets

    pinned = pin_document_frame(chunks, doc, n_buckets=table_n_buckets(table))
    for i in range(20):  # warm every target shape + materialize the cache
        read_neighbors(pinned, doc, 100 + i * 400).collect()
    ptimes = []
    for i in range(50):
        t0 = time.time()
        read_neighbors(pinned, doc, 100 + (i % 20) * 400).collect()
        ptimes.append((time.time() - t0) * 1000)
    pinned.unpersist()
    ptimes.sort()
    pinned_p95 = ptimes[int(len(ptimes) * 0.95) - 1]
    print(
        f"# neighbor_read serve p95={serve_p95:.1f}ms  spark-plan p95={p95:.1f}ms"
        f" (reference protocol: 4/5 timed shapes first-sight)"
        f"  warm p95={warm_p95:.1f}ms  pinned p95={pinned_p95:.1f}ms",
        file=sys.stderr,
    )
    return round(serve_p95, 1), round(p95, 1), round(warm_p95, 1), round(pinned_p95, 1)


if __name__ == "__main__":
    main()
