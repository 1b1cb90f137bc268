"""MCP protocol envelope (mcp_local_rag_spark/server.McpServer): the
server driven through initialize / tools/list / tools/call the way a real
MCP client would — the protocol twin of the reference's in-memory
transport suite (src/server/__tests__/)."""

from __future__ import annotations

import json
import time

import pytest

from mcp_local_rag_spark.engine import RagEngine
from mcp_local_rag_spark.server import McpServer, RagRpcServer
from mcp_local_rag_spark.tool_definitions import TOOL_DEFINITIONS

DOC = (
    "# MCP Doc\n\n"
    "Spark shuffles data between executors during wide transformations. "
    "Broadcast joins avoid that shuffle for small dimension tables. "
    "Caching hot tables reduces repeated scans across queries."
)

REFERENCE_TOOL_NAMES = {
    # src/server/tool-definitions.ts:12-188 — the drop-in contract
    "query_documents", "ingest_file", "ingest_data", "delete_file",
    "list_files", "status", "read_chunk_neighbors", "sync_start",
    "sync_status",
}


@pytest.fixture()
def mcp(spark, tmp_path):
    d = tmp_path / "docs"
    d.mkdir()
    (d / "mcp.md").write_text(DOC)
    eng = RagEngine(spark, str(tmp_path / "chunks_mcp"), db_path=str(tmp_path / "db"))
    eng.ingest_directory(str(d))
    return McpServer(RagRpcServer(eng, base_dirs=[str(d)])), d


def _req(server, method, params=None, rid=1):
    return server.handle(
        {"jsonrpc": "2.0", "id": rid, "method": method, "params": params or {}}
    )


def _tool(server, name, arguments=None, rid=2):
    return _req(server, "tools/call", {"name": name, "arguments": arguments or {}}, rid)


def _payload(resp):
    """Decode the single text content block every tool result carries."""
    assert "result" in resp, resp
    blocks = resp["result"]["content"]
    assert blocks and blocks[0]["type"] == "text"
    return json.loads(blocks[0]["text"])


def test_initialize_handshake(mcp):
    server, _ = mcp
    res = _req(server, "initialize", {
        "protocolVersion": "2025-06-18",
        "capabilities": {},
        "clientInfo": {"name": "pytest", "version": "0"},
    })["result"]
    assert res["protocolVersion"] == "2025-06-18"
    assert "tools" in res["capabilities"]
    assert res["serverInfo"]["name"] == "rag-mcp-server"
    # the initialized notification gets NO response line
    assert server.handle({"jsonrpc": "2.0", "method": "notifications/initialized"}) is None
    assert _req(server, "ping")["result"] == {}


def test_tools_list_serves_reference_surface(mcp):
    server, _ = mcp
    tools = _req(server, "tools/list")["result"]["tools"]
    assert tools is TOOL_DEFINITIONS or tools == TOOL_DEFINITIONS
    names = {t["name"] for t in tools}
    assert REFERENCE_TOOL_NAMES <= names
    for t in tools:
        assert t["inputSchema"]["type"] == "object"
        # required args match the reference schemas
        if t["name"] == "query_documents":
            assert t["inputSchema"]["required"] == ["query"]
        if t["name"] == "ingest_data":
            assert t["inputSchema"]["required"] == ["content", "metadata"]
        if t["name"] == "read_chunk_neighbors":
            assert t["inputSchema"]["required"] == ["chunkIndex"]


def test_query_documents_over_envelope(mcp):
    server, _ = mcp
    results = _payload(_tool(server, "query_documents",
                             {"query": "broadcast joins", "limit": 3}))
    assert results and results[0]["filePath"].endswith("mcp.md")
    assert all("text" in r and "score" in r for r in results)
    # scope as ONE STRING (the oneOf branch the bare RPC never accepted)
    scoped = _payload(_tool(server, "query_documents",
                            {"query": "broadcast joins", "scope": "/nowhere"}))
    assert scoped == []


def test_ingest_data_reference_wire_shape_and_delete_by_source(mcp):
    server, _ = mcp
    res = _payload(_tool(server, "ingest_data", {
        "content": "A raw note about shuffle behavior during join stages.",
        "metadata": {"source": "note://2026-08-14/mcp", "format": "markdown"},
    }))
    assert res["chunkCount"] >= 1 and res["source"] == "note://2026-08-14/mcp"
    assert "/raw-data/" in res["filePath"]

    # query surfaces the restored source field
    hits = _payload(_tool(server, "query_documents",
                          {"query": "raw note shuffle join stages"}))
    assert any(h.get("source") == "note://2026-08-14/mcp" for h in hits)

    # read_chunk_neighbors by source: target marked, source restored
    chunks = _payload(_tool(server, "read_chunk_neighbors",
                            {"source": "note://2026-08-14/mcp", "chunkIndex": 0}))
    assert chunks and chunks[0]["isTarget"] is True
    assert chunks[0]["source"] == "note://2026-08-14/mcp"

    # delete_file by source — the reference dual-input contract
    res = _payload(_tool(server, "delete_file",
                         {"source": "note://2026-08-14/mcp"}))
    assert res["deleted"] is True and res["existed"] is True
    assert res["removedChunks"] >= 1
    # second delete: succeeds, nothing existed
    res = _payload(_tool(server, "delete_file",
                         {"source": "note://2026-08-14/mcp"}))
    assert res["deleted"] is True and res["existed"] is False


def test_list_files_and_status(mcp):
    server, d = mcp
    res = _payload(_tool(server, "list_files"))
    assert res["baseDirs"] == [str(d)]
    assert [f["filePath"] for f in res["files"]] == [str(d / "mcp.md")]
    entry = res["files"][0]
    assert entry["ingested"] is True and entry["chunkCount"] >= 1
    # a not-yet-ingested file shows up as ingested: false
    (d / "new.md").write_text("# New\n\nNot ingested yet, enough text to list.")
    res = _payload(_tool(server, "list_files"))
    by_path = {f["filePath"]: f for f in res["files"]}
    assert by_path[str(d / "new.md")]["ingested"] is False
    # scope filters files but would keep sources
    res = _payload(_tool(server, "list_files", {"scope": str(d / "new.md")}))
    assert [f["filePath"] for f in res["files"]] == [str(d / "new.md")]

    status = _payload(_tool(server, "status"))
    assert status["documentCount"] == 1 and status["chunkCount"] >= 1
    assert status["ftsIndexEnabled"] is True and status["searchMode"] == "hybrid"
    assert status["memoryUsage"] > 0 and status["uptime"] >= 0


def test_read_chunk_neighbors_contract(mcp):
    server, d = mcp
    fp = str(d / "mcp.md")
    chunks = _payload(_tool(server, "read_chunk_neighbors",
                            {"filePath": fp, "chunkIndex": 0, "before": 1, "after": 2}))
    assert chunks and sum(1 for c in chunks if c["isTarget"]) == 1
    assert [c["chunkIndex"] for c in chunks] == sorted(c["chunkIndex"] for c in chunks)
    assert all(c["filePath"] == fp for c in chunks)
    # out-of-range target returns [] (reference contract)
    assert _payload(_tool(server, "read_chunk_neighbors",
                          {"filePath": fp, "chunkIndex": 9999})) == []
    # XOR validation: both or neither -> invalid params
    for bad in ({"chunkIndex": 0},
                {"filePath": fp, "source": "note://x", "chunkIndex": 0},
                {"filePath": fp, "chunkIndex": 0, "before": 51}):
        resp = _tool(server, "read_chunk_neighbors", bad)
        assert resp["error"]["code"] == -32602, bad


def test_sync_lifecycle_reference_record(mcp):
    server, d = mcp
    (d / "late.md").write_text(
        "# Late\n\nA second document that arrives between syncs with enough text."
    )
    job = _payload(_tool(server, "sync_start", {"path": str(d)}))
    assert "jobId" in job
    deadline = time.time() + 120
    while time.time() < deadline:
        rec = _payload(_tool(server, "sync_status", {"jobId": job["jobId"]}))
        if rec["state"] != "running":
            break
        time.sleep(0.5)
    # reference state vocabulary: succeeded, not completed
    assert rec["state"] == "succeeded", rec
    assert rec["summary"]["upserted"] >= 1 and rec["summary"]["pruned"] == 0
    assert rec["completed"] == rec["total"] >= 1
    assert rec["error"] is None
    status = _payload(_tool(server, "status"))
    assert status["documentCount"] >= 2


def _await_sync(server, job_id):
    deadline = time.time() + 120
    while time.time() < deadline:
        rec = _payload(_tool(server, "sync_status", {"jobId": job_id}))
        if rec["state"] != "running":
            return rec
        time.sleep(0.5)
    raise AssertionError("sync did not terminate")


def test_sync_start_path_optional_covers_base_dirs(mcp, tmp_path):
    """tool_definitions advertises path as optional ('Omit it to
    synchronize every configured base directory') — an omitted path must
    run one job over self.base_dirs, not raise -32602."""
    server, d = mcp
    (d / "extra.md").write_text(
        "# Extra\n\nAnother document with enough words to pass the length filter."
    )
    job = _payload(_tool(server, "sync_start", {}))
    rec = _await_sync(server, job["jobId"])
    assert rec["state"] == "succeeded", rec
    assert rec["summary"]["upserted"] >= 1

    # a path OUTSIDE every configured root is refused (reference
    # outsideConfiguredRootsMessage, src/features/sync.ts:365-366)
    outside = tmp_path / "elsewhere"
    outside.mkdir()
    resp = _tool(server, "sync_start", {"path": str(outside)})
    assert resp["error"]["code"] == -32602
    assert "outside every configured root" in resp["error"]["message"]


def test_sync_start_no_path_no_base_dirs_rejected(spark, tmp_path):
    eng = RagEngine(spark, str(tmp_path / "chunks_nb"), db_path=str(tmp_path / "dbnb"))
    server = McpServer(RagRpcServer(eng))  # no base dirs configured
    resp = _tool(server, "sync_start", {})
    assert resp["error"]["code"] == -32602
    assert "no base directories" in resp["error"]["message"]


def test_idless_messages_are_notifications(mcp):
    """JSON-RPC 2.0: any message without an id is a notification and gets
    no response — regardless of method prefix. An 'id': null response to
    one is a spec violation."""
    server, _ = mcp
    assert server.handle({"jsonrpc": "2.0", "method": "ping"}) is None
    assert server.handle({"jsonrpc": "2.0", "method": "tools/list"}) is None
    assert server.handle({"jsonrpc": "2.0", "method": "no/such"}) is None
    # with an id, the same methods answer
    assert _req(server, "ping")["result"] == {}


def test_unknown_method_metrics_bounded(mcp):
    """Junk method names must not grow the metrics map: all -32601 paths
    share one 'unknown' bucket."""
    server, _ = mcp
    rpc = server.rpc
    for i in range(50):
        resp = _tool(server, f"junk_method_{i}")
        assert resp["error"]["code"] == -32602  # MCP maps unknown tool
    keys = set(rpc._metrics)
    assert "unknown" in keys
    assert not any(k.startswith("junk_method_") for k in keys)
    assert rpc._metrics["unknown"]["errors"] >= 50


def test_protocol_errors_and_overlap(mcp):
    server, _ = mcp
    # unknown tool -> InvalidParams protocol error, not a crash
    resp = _tool(server, "no_such_tool")
    assert resp["error"]["code"] == -32602
    assert "Unknown tool" in resp["error"]["message"]
    # unknown protocol method -> MethodNotFound
    assert _req(server, "resources/list")["error"]["code"] == -32601
    # bad tool args -> InvalidParams
    assert _tool(server, "query_documents", {"query": "  "})["error"]["code"] == -32602
    # execution failure -> InternalError, loop survives
    resp = _tool(server, "ingest_file", {"filePath": "/does/not/exist.md"})
    assert resp["error"]["code"] == -32603
    # mutation overlap -> isError tool RESULT (reference acquireMutation)
    assert server.rpc._write_guard.acquire(blocking=False)
    try:
        resp = _tool(server, "delete_file", {"filePath": "/x.md"})
        assert resp["result"]["isError"] is True
        assert "in progress" in resp["result"]["content"][0]["text"]
        # reads still answer while the guard is held
        assert _payload(_tool(server, "status"))["documentCount"] == 1
    finally:
        server.rpc._write_guard.release()


def test_mcp_serve_loop_over_real_pipe(mcp):
    """Full client session over an OS pipe: initialize -> initialized
    notification (no response line) -> tools/list -> tools/call."""
    import os
    import threading

    server, _ = mcp
    in_r, in_w = os.pipe()
    out_r, out_w = os.pipe()
    stdin = os.fdopen(in_r, "r")
    stdout = os.fdopen(out_w, "w")
    t = threading.Thread(target=server.serve, args=(stdin, stdout), daemon=True)
    t.start()
    writer = os.fdopen(in_w, "w")
    reader = os.fdopen(out_r, "r")
    for msg in (
        {"jsonrpc": "2.0", "id": 0, "method": "initialize",
         "params": {"protocolVersion": "2025-06-18", "capabilities": {},
                    "clientInfo": {"name": "t", "version": "0"}}},
        {"jsonrpc": "2.0", "method": "notifications/initialized"},
        {"jsonrpc": "2.0", "id": 1, "method": "tools/list"},
        {"jsonrpc": "2.0", "id": 2, "method": "tools/call",
         "params": {"name": "query_documents",
                    "arguments": {"query": "shuffle", "limit": 2}}},
    ):
        writer.write(json.dumps(msg) + "\n")
    writer.flush()
    init = json.loads(reader.readline())
    assert init["id"] == 0 and init["result"]["serverInfo"]["name"] == "rag-mcp-server"
    # the notification produced no line: the NEXT line answers id 1
    listed = json.loads(reader.readline())
    assert listed["id"] == 1 and {t["name"] for t in listed["result"]["tools"]} >= REFERENCE_TOOL_NAMES
    called = json.loads(reader.readline())
    assert called["id"] == 2
    rows = json.loads(called["result"]["content"][0]["text"])
    assert rows and rows[0]["filePath"].endswith("mcp.md")
    writer.close()
    t.join(timeout=30)
    assert not t.is_alive()


def test_list_files_warning_blocks(mcp):
    """Coverage facts and relative-scope misses ride as separate Warning
    text blocks after the primary JSON (reference index.ts:855-874)."""
    server, d = mcp
    resp = _tool(server, "list_files", {"scope": "relative/prefix"})
    blocks = resp["result"]["content"]
    primary = json.loads(blocks[0]["text"])
    assert "warnings" not in primary  # ListFilesResult shape, no warnings key
    assert primary["files"] == []  # relative prefix matches nothing
    warn_texts = [b["text"] for b in blocks[1:]]
    assert any("not absolute" in t for t in warn_texts)
    # a skipped symlink surfaces as a per-root coverage warning block
    # (chmod-based unreadable dirs don't apply: tests may run as root)
    import os
    os.symlink(str(d / "mcp.md"), str(d / "alias.md"))
    try:
        resp = _tool(server, "list_files")
        warn_texts = [b["text"] for b in resp["result"]["content"][1:]]
        assert any("skipped symlink" in t and "alias.md" in t for t in warn_texts)
    finally:
        os.unlink(str(d / "alias.md"))


def test_batch_tool_over_envelope(mcp):
    """The batch extension tool is discoverable via tools/list and
    callable via tools/call."""
    server, _ = mcp
    names = {t["name"] for t in _req(server, "tools/list")["result"]["tools"]}
    assert "query_documents_batch" in names
    groups = _payload(_tool(server, "query_documents_batch",
                            {"queries": ["broadcast joins", "caching"], "limit": 2}))
    assert len(groups) == 2 and all(g for g in groups)
    singles = _payload(_tool(server, "query_documents",
                             {"query": "broadcast joins", "limit": 2}))
    assert [(r["filePath"], r["chunkIndex"], r["score"]) for r in singles] == \
           [(r["filePath"], r["chunkIndex"], r["score"]) for r in groups[0]]


def test_dispatcher_never_crashes_on_arbitrary_requests(mcp):
    """Protocol-robustness fuzz: arbitrary JSON values as requests and
    arbitrary params on every method must always yield a JSON-RPC
    response (or None for notifications) — never an exception out of
    handle(). Generated WITHOUT Spark per example, so the sweep is fast."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    server, _ = mcp
    json_scalars = st.one_of(
        st.none(), st.booleans(), st.integers(), st.floats(allow_nan=False),
        st.text(max_size=20),
    )
    json_values = st.recursive(
        json_scalars,
        lambda inner: st.one_of(
            st.lists(inner, max_size=4),
            st.dictionaries(st.text(max_size=10), inner, max_size=4),
        ),
        max_leaves=10,
    )
    methods = st.one_of(
        st.sampled_from([
            "initialize", "ping", "tools/list", "tools/call",
            "notifications/initialized", "resources/list", "", "query_documents",
        ]),
        st.text(max_size=20),
    )

    @given(method=methods, params=json_values, rid=json_scalars)
    @settings(max_examples=150, deadline=None)
    def _fuzz(method, params, rid):
        req = {"jsonrpc": "2.0", "method": method}
        if rid is not None:
            req["id"] = rid
        if params is not None:
            req["params"] = params
        resp = server.handle(req)
        if resp is not None:
            assert resp.get("jsonrpc") == "2.0"
            assert ("result" in resp) != ("error" in resp)
        # non-dict requests at the top level
        resp2 = server.handle({"method": params} if isinstance(params, dict) else {"method": method, "params": {"name": params}})
        assert resp2 is None or ("result" in resp2) != ("error" in resp2)

    _fuzz()


def test_initialize_version_negotiation(mcp):
    """Supported client versions echo back; unknown ones answer the
    server's latest (the client then decides whether to proceed)."""
    server, _ = mcp
    for v in ("2024-11-05", "2025-06-18"):
        res = _req(server, "initialize", {"protocolVersion": v,
                                          "capabilities": {}, "clientInfo": {}})
        assert res["result"]["protocolVersion"] == v
    res = _req(server, "initialize", {"protocolVersion": "1999-01-01",
                                      "capabilities": {}, "clientInfo": {}})
    assert res["result"]["protocolVersion"] == "2025-06-18"
