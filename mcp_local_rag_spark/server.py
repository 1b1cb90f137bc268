"""Stdio JSON-RPC serving adapter over RagEngine + NeighborServer.

The reference exposes its engine as tools over stdio JSON-RPC
(src/server/index.ts:1269-1272) behind a central dispatcher switch
(src/server/index.ts:389-444) with a single-writer mutation guard that
read-only tools bypass (:396-403) and async sync jobs that return a jobId
immediately (:1075-1103). This module is that surface re-expressed over
the Spark engine: the BATCH plans stay DataFrame DAGs inside RagEngine;
the adapter is the thin external-system seam BASELINE.json prescribes
("batch index build via DataFrame ops, serving requires external
system"), with neighbor point-reads routed through the pyarrow
NeighborServer so the hot read path never pays a Spark job submission.

Protocol: one JSON-RPC 2.0 object per line on stdin, one response per
line on stdout. Methods are the reference tool names; params are the
tool arguments. Errors use -32601 (unknown method), -32602 (invalid
params), -32000 (execution failure) — the dispatcher never crashes the
loop on a bad request.
"""

from __future__ import annotations

import json
import threading
import uuid
from typing import Any, Callable

from .engine import RagEngine
from .operators.neighbors import NeighborServer


class RpcError(Exception):
    def __init__(self, code: int, message: str):
        super().__init__(message)
        self.code = code


def _require_query(params: dict) -> str:
    q = params.get("query")
    if not isinstance(q, str) or not q.strip():
        raise RpcError(-32602, "query must be a non-empty string")
    return q


def _limit(params: dict, default: int = 10) -> int:
    lim = params.get("limit", default)
    if not isinstance(lim, int) or isinstance(lim, bool) or not (1 <= lim <= 20):
        raise RpcError(-32602, "limit must be an integer in [1, 20]")
    return lim


def _max_distance(params: dict) -> float | None:
    md = params.get("maxDistance")
    if md is None:
        return None
    if isinstance(md, bool) or not isinstance(md, (int, float)) or md < 0:
        raise RpcError(-32602, "maxDistance must be a non-negative number")
    return float(md)


def _grouping(params: dict) -> str | None:
    g = params.get("grouping")
    if g is not None and g not in ("similar", "related"):
        raise RpcError(-32602, "grouping must be 'similar' or 'related'")
    return g


def _scope(params: dict) -> list[str] | None:
    scope = params.get("scope")
    if scope is None:
        return None
    if not isinstance(scope, list) or not all(isinstance(s, str) for s in scope):
        raise RpcError(-32602, "scope must be a list of strings")
    trimmed = [s.strip() for s in scope if s.strip()]
    return trimmed or None


class RagRpcServer:
    """Dispatcher + method handlers. ``handle`` serves one request dict;
    ``serve`` runs the line-delimited stdio loop."""

    MAX_JOB_RECORDS = 100  # terminal sync records kept for sync_status
    MAX_BATCH_QUERIES = 50  # width cap for query_documents_batch

    def __init__(self, engine: RagEngine, neighbors: NeighborServer | None = None):
        self.engine = engine
        self.neighbors = neighbors or NeighborServer(engine.spark, engine.table_path)
        # serving fast path: the pyarrow+numpy hybrid sidecar answers
        # query_documents in ~10 ms (row-identical to the Spark pipeline,
        # operators/hybrid_serve) — used ONLY while the engine reports the
        # postings index fresh; pending mutations route back through the
        # Spark path, whose scan fallback stays correct on a stale index
        from .operators.hybrid_serve import HybridSearchServer

        self._hybrid = (
            HybridSearchServer(
                engine.table_path, engine.postings_path, db_path=engine.db_path
            )
            if engine.postings_path is not None
            else None
        )
        # the reference's single-writer mutation guard: one mutating tool
        # at a time; read-only tools bypass it (src/server/index.ts:396-403)
        self._write_guard = threading.Lock()
        self._sync_jobs: dict[str, dict] = {}
        self._methods: dict[str, tuple[Callable[[dict], Any], bool]] = {
            # name -> (handler, mutates)
            "query_documents": (self._query_documents, False),
            "query_documents_batch": (self._query_documents_batch, False),
            "read_chunk_neighbors": (self._read_chunk_neighbors, False),
            "list_documents": (self._list_documents, False),
            "get_status": (self._get_status, False),
            "sync_status": (self._sync_status, False),
            "ingest_file": (self._ingest_file, True),
            "ingest_data": (self._ingest_data, True),
            "delete_document": (self._delete_document, True),
            "sync_start": (self._sync_start, True),
        }

    def _invalidate_hybrid(self) -> None:
        if self._hybrid is not None:
            self._hybrid.invalidate()

    # -- read-only tools --------------------------------------------------

    def _query_documents(self, params: dict) -> dict:
        q = _require_query(params)
        kw = dict(
            limit=_limit(params),
            scope=_scope(params),
            max_distance=_max_distance(params),
            grouping=_grouping(params),
        )
        if self._hybrid is not None and self.engine.index_is_fresh():
            return {"results": self._hybrid.query(q, **kw)}
        rows = self.engine.query_documents(q, **kw).collect()
        return {"results": [r.asDict() for r in rows]}

    def _query_documents_batch(self, params: dict) -> dict:
        """N concurrent queries amortized over one corpus scan (the
        serving consolidation shape — engine.query_documents_batch).
        Results arrive grouped per query_index in input order."""
        queries = params.get("queries")
        if (
            not isinstance(queries, list)
            or not queries
            or not all(isinstance(s, str) and s.strip() for s in queries)
        ):
            raise RpcError(-32602, "queries must be a non-empty list of strings")
        if len(queries) > self.MAX_BATCH_QUERIES:
            # the per-query limit is clamped to [1,20]; the batch width is
            # bounded for the same reason — one request must not broadcast
            # an unbounded query matrix into the corpus kernel
            raise RpcError(
                -32602, f"at most {self.MAX_BATCH_QUERIES} queries per batch"
            )
        kw = dict(
            limit=_limit(params),
            scope=_scope(params),
            max_distance=_max_distance(params),
            grouping=_grouping(params),
        )
        if self._hybrid is not None and self.engine.index_is_fresh():
            # the batch contract IS "row-identical to N single calls"
            # (engine.query_documents_batch docstring), so the sidecar
            # serves each query in ~10 ms — N small matmuls against the
            # one loaded snapshot beat one amortized Spark job by ~50x
            # at RPC batch widths (<= 50)
            return {
                "results": [
                    # the Spark branch's rows carry query_index (the wire
                    # shape must not depend on which path answered)
                    [{"query_index": str(i), **r} for r in self._hybrid.query(q, **kw)]
                    for i, q in enumerate(queries)
                ]
            }
        rows = self.engine.query_documents_batch(queries, **kw).collect()
        grouped: list[list] = [[] for _ in queries]
        for r in rows:
            grouped[int(r["query_index"])].append(r.asDict())
        for g in grouped:
            # pin the per-query row order (the DataFrame collect order is
            # partition-dependent) to the ranking order both paths share
            g.sort(key=lambda r: (r["score"], r["filePath"], r["chunkIndex"]))
        return {"results": grouped}

    def _read_chunk_neighbors(self, params: dict) -> dict:
        fp, idx = params.get("filePath"), params.get("chunkIndex")
        if not isinstance(fp, str) or not isinstance(idx, int) or isinstance(idx, bool):
            raise RpcError(-32602, "filePath (string) and chunkIndex (int) required")
        before, after = params.get("before", 2), params.get("after", 2)
        for name, v in (("before", before), ("after", after)):
            if not isinstance(v, int) or isinstance(v, bool) or v < 0:
                raise RpcError(-32602, f"{name} must be a non-negative integer")
        rows = self.neighbors.read(fp, idx, before=before, after=after)
        keep = ("filePath", "chunkIndex", "text")
        return {"chunks": [{k: r[k] for k in keep if k in r} for r in rows]}

    def _list_documents(self, params: dict) -> dict:
        return {"documents": [r.asDict() for r in self.engine.list_documents().collect()]}

    def _get_status(self, params: dict) -> dict:
        return self.engine.get_status()

    # -- mutating tools (guarded) ----------------------------------------

    def _ingest_file(self, params: dict) -> dict:
        fp = params.get("filePath")
        if not isinstance(fp, str) or not fp:
            raise RpcError(-32602, "filePath must be a non-empty string")
        res = self.engine.ingest_file(fp)
        self.engine.optimize()
        self.neighbors.invalidate()
        self._invalidate_hybrid()
        return res

    def _ingest_data(self, params: dict) -> dict:
        content, source = params.get("content"), params.get("source")
        if not isinstance(content, str) or not isinstance(source, str) or not source:
            raise RpcError(-32602, "content (string) and source (string) required")
        n = self.engine.ingest_data(
            content, source, format=params.get("format", "markdown")
        )
        self.engine.optimize()
        self.neighbors.invalidate()
        self._invalidate_hybrid()
        return {"source": source, "chunkCount": n}

    def _delete_document(self, params: dict) -> dict:
        fp = params.get("filePath")
        if not isinstance(fp, str) or not fp:
            raise RpcError(-32602, "filePath must be a non-empty string")
        n = self.engine.delete_document(fp)
        self.engine.optimize()
        self.neighbors.invalidate()
        self._invalidate_hybrid()
        return {"filePath": fp, "deletedChunks": n}

    def _sync_start(self, params: dict) -> dict:
        """Register the job record and return the jobId IMMEDIATELY; the
        run is a background thread that releases the guard on terminal
        state (reference :1075-1103). The guard is handed over to the
        thread — dispatch acquires it, the worker releases it."""
        root = params.get("path")
        if not isinstance(root, str) or not root:
            raise RpcError(-32602, "path must be a non-empty string")
        job_id = str(uuid.uuid4())
        record = {"jobId": job_id, "state": "running", "counters": None, "error": None}
        # bounded job history: evict the oldest TERMINAL records beyond the
        # cap (a long-lived session running periodic syncs must not grow
        # its record map forever; running jobs are never evicted)
        terminal = [
            jid for jid, r in self._sync_jobs.items() if r["state"] != "running"
        ]
        for jid in terminal[: max(0, len(terminal) - self.MAX_JOB_RECORDS + 1)]:
            del self._sync_jobs[jid]
        self._sync_jobs[job_id] = record

        def _run():
            try:
                rep = self.engine.sync(root)
                record["counters"] = rep.counters
                record["warnings"] = rep.warnings
                record["state"] = "completed"
            except Exception as e:  # terminal state, never crash the loop
                record["error"] = f"{type(e).__name__}: {e}"
                record["state"] = "failed"
            finally:
                self.neighbors.invalidate()
                self._invalidate_hybrid()
                self._write_guard.release()

        threading.Thread(target=_run, daemon=True).start()
        return {"jobId": job_id}

    def _sync_status(self, params: dict) -> dict:
        job_id = params.get("jobId")
        rec = self._sync_jobs.get(job_id)
        if rec is None:
            raise RpcError(-32602, f"unknown jobId: {job_id}")
        return rec

    # -- dispatch ---------------------------------------------------------

    def handle(self, request: dict) -> dict:
        rid = request.get("id")
        method = request.get("method")
        entry = self._methods.get(method)
        if entry is None:
            return _err(rid, -32601, f"unknown method: {method}")
        handler, mutates = entry
        params = request.get("params") or {}
        if not isinstance(params, dict):
            return _err(rid, -32602, "params must be an object")
        holding = False
        try:
            if mutates:
                # one mutating tool at a time; a running sync holds the
                # guard until its terminal state. NON-BLOCKING, like the
                # reference's acquireMutation (src/server/index.ts:397-399,
                # returns an overlap response immediately): a blocking
                # acquire here would freeze the single-threaded serve loop
                # — no reads, no sync_status — for as long as a running
                # sync holds the guard.
                if not self._write_guard.acquire(blocking=False):
                    return _err(
                        rid, -32000,
                        "another mutation is in progress; retry after it completes",
                    )
                holding = True
            try:
                result = handler(params)
            except RpcError:
                raise
            except Exception:
                if mutates:
                    raise
                # read-during-mutation race: a background sync's bucket
                # rewrite can invalidate the file listing under a running
                # Spark scan ("underlying files have been updated"). The
                # parquet layout has no snapshot isolation (the reference
                # tolerates this only because LanceDB is versioned), so
                # reads self-heal the same way NeighborServer does:
                # refresh the file index once and retry.
                self.engine.spark.catalog.refreshByPath(self.engine.table_path)
                self.neighbors.invalidate()
                self._invalidate_hybrid()
                result = handler(params)
            if method == "sync_start":
                holding = False  # guard handed to the sync worker thread
            return {"jsonrpc": "2.0", "id": rid, "result": result}
        except RpcError as e:
            return _err(rid, e.code, str(e))
        except Exception as e:
            return _err(rid, -32000, f"{type(e).__name__}: {e}")
        finally:
            if holding:
                self._write_guard.release()
            # the per-query pipelines persist intermediates (candidate
            # sets, postings builds); CacheManager entries are NOT freed
            # by GC, so a long-running server would accumulate one set per
            # request until executors hit storage pressure. Results are
            # already collected by this point; dropping the cache only
            # costs a recompute if something re-reads a stale handle.
            try:
                self.engine.spark.catalog.clearCache()
            except Exception:
                pass

    def serve(self, stdin, stdout) -> None:
        """Line-delimited stdio loop: EOF ends the session; malformed JSON
        answers with a -32700 parse error instead of crashing."""
        for line in stdin:
            line = line.strip()
            if not line:
                continue
            try:
                request = json.loads(line)
            except ValueError:
                response = _err(None, -32700, "parse error")
            else:
                response = self.handle(request)
            stdout.write(json.dumps(response) + "\n")
            stdout.flush()


def _err(rid, code: int, message: str) -> dict:
    return {"jsonrpc": "2.0", "id": rid, "error": {"code": code, "message": message}}


def main() -> None:  # pragma: no cover - manual entry point
    import sys

    from .session import get_spark

    table_path = sys.argv[1]
    engine = RagEngine(get_spark("rag-server"), table_path)
    RagRpcServer(engine).serve(sys.stdin, sys.stdout)


if __name__ == "__main__":  # pragma: no cover
    main()
