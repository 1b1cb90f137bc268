"""Declarative MCP tool schemas for the RAG server.

Mirrors the reference's tool surface (src/server/tool-definitions.ts:
12-188): same nine tool names, same argument names/types/required sets,
so an MCP client configured against the reference can point at this
server unchanged. Purely data — the dispatch lives in server.py.
"""

from __future__ import annotations

_SCOPE = {
    "oneOf": [{"type": "string"}, {"type": "array", "items": {"type": "string"}}],
    "description": (
        "Optional absolute path prefix(es) — one string or a list "
        "(unioned) — restricting results to paths equal to or under a "
        "prefix. '/docs/api' matches '/docs/api/auth.md' but not "
        "'/docs/apiv2'. A relative prefix matches nothing."
    ),
}

TOOL_DEFINITIONS: list[dict] = [
    {
        "name": "query_documents",
        "description": (
            "Search ingested documents with hybrid keyword + semantic "
            "matching. Returns results sorted by relevance, each with "
            "filePath, chunkIndex, text, fileTitle, score (0 = best, "
            "higher = worse), and source (for ingest_data items)."
        ),
        "inputSchema": {
            "type": "object",
            "properties": {
                "query": {
                    "type": "string",
                    "description": (
                        "Search query. Preserve specific user terms (keyword "
                        "match); add context when the query is vague "
                        "(semantic match)."
                    ),
                },
                "limit": {
                    "type": "number",
                    "minimum": 1,
                    "maximum": 20,
                    "description": "Max results (default 10, range 1-20).",
                },
                "scope": _SCOPE,
            },
            "required": ["query"],
        },
    },
    {
        "name": "ingest_file",
        "description": (
            "Ingest a document file (PDF, DOCX, TXT, MD) into the vector "
            "database. Path must be absolute; re-ingesting the same path "
            "replaces its existing data. Returns { filePath, chunkCount, "
            "timestamp, fileTitle }."
        ),
        "inputSchema": {
            "type": "object",
            "properties": {
                "filePath": {
                    "type": "string",
                    "description": "Absolute path to the file to ingest.",
                },
                "visual": {
                    "type": "boolean",
                    "description": (
                        "Run VLM captioning on figure pages (PDF only; "
                        "default false)."
                    ),
                },
                "visualQuality": {
                    "type": "string",
                    "enum": ["fast", "quality"],
                    "default": "fast",
                    "description": (
                        "VLM profile when visual is true (default 'fast'). "
                        "Ignored when visual is false."
                    ),
                },
            },
            "required": ["filePath"],
        },
    },
    {
        "name": "ingest_data",
        "description": (
            "Ingest in-memory content as a string (use ingest_file for "
            "files on disk). The source identifier enables re-ingestion to "
            "update existing content. Returns { filePath, chunkCount, "
            "timestamp, fileTitle }."
        ),
        "inputSchema": {
            "type": "object",
            "properties": {
                "content": {
                    "type": "string",
                    "description": "The content to ingest (text, HTML, or Markdown)",
                },
                "metadata": {
                    "type": "object",
                    "properties": {
                        "source": {
                            "type": "string",
                            "description": (
                                "Source identifier. For web pages use the "
                                "URL; otherwise URL-scheme format such as "
                                "'clipboard://2024-12-30' or "
                                "'note://2024-12-30/meeting'."
                            ),
                        },
                        "format": {
                            "type": "string",
                            "enum": ["text", "html", "markdown"],
                            "description": (
                                "Content format: text, html (fetched web "
                                "pages), or markdown."
                            ),
                        },
                    },
                    "required": ["source", "format"],
                },
            },
            "required": ["content", "metadata"],
        },
    },
    {
        "name": "delete_file",
        "description": (
            "Delete a previously ingested file or data from the vector "
            "database. Use filePath for files ingested via ingest_file, or "
            "source for data ingested via ingest_data. Either filePath or "
            "source must be provided. Returns deleted, removedChunks, and "
            "existed."
        ),
        "inputSchema": {
            "type": "object",
            "properties": {
                "filePath": {
                    "type": "string",
                    "description": "Absolute path to the file (for ingest_file).",
                },
                "source": {
                    "type": "string",
                    "description": "Source identifier used in ingest_data.",
                },
            },
        },
    },
    {
        "name": "list_files",
        "description": (
            "List supported files (PDF, DOCX, TXT, MD) under the configured "
            "base directories and whether each is ingested. Returns "
            "{ baseDirs, files, sources }; sources lists ingested items "
            "reported apart from the file scan, chiefly ingest_data content."
        ),
        "inputSchema": {
            "type": "object",
            "properties": {"scope": _SCOPE},
        },
    },
    {
        "name": "status",
        "description": (
            "Get index status: { documentCount, chunkCount, memoryUsage "
            "(MB), uptime (s), ftsIndexEnabled, searchMode }."
        ),
        "inputSchema": {"type": "object", "properties": {}},
    },
    {
        "name": "read_chunk_neighbors",
        "description": (
            "Read the chunks immediately before and after a query_documents "
            "result, in the same document, for more surrounding context. "
            "Pass chunkIndex from the result plus exactly one of filePath "
            "(ingest_file) or source (ingest_data). Returns the target "
            "chunk (isTarget: true) and its neighbors, ascending by "
            "chunkIndex; an out-of-range chunkIndex returns []. Defaults: "
            "before=2, after=2 (max 50 each)."
        ),
        "inputSchema": {
            "type": "object",
            "properties": {
                "filePath": {
                    "type": "string",
                    "description": (
                        "Absolute path to the file (for ingest_file "
                        "documents). Provide exactly one of filePath or "
                        "source."
                    ),
                },
                "source": {
                    "type": "string",
                    "description": (
                        "Source identifier (for ingest_data documents). "
                        "Provide exactly one of filePath or source."
                    ),
                },
                "chunkIndex": {
                    "type": "number",
                    "description": "Zero-based target chunk index (non-negative integer).",
                },
                "before": {
                    "type": "number",
                    "description": "Chunks to retrieve before the target (0-50, default 2).",
                },
                "after": {
                    "type": "number",
                    "description": "Chunks to retrieve after the target (0-50, default 2).",
                },
            },
            "required": ["chunkIndex"],
        },
    },
    {
        "name": "sync_start",
        "description": (
            "Reconcile the index with the files on disk: ingest new and "
            "changed files, leave unchanged files alone, and remove index "
            "entries for files that are gone. Returns { jobId } without "
            "waiting; poll sync_status with that jobId. Only one job is "
            "kept, and it is lost when the server process exits."
        ),
        "inputSchema": {
            "type": "object",
            "properties": {
                "path": {
                    "type": "string",
                    "description": (
                        "Optional absolute path to a file or directory "
                        "inside a configured base directory. Omit it to "
                        "synchronize every configured base directory."
                    ),
                },
            },
        },
    },
    {
        # EXTENSION beyond the reference surface: N queries amortized over
        # one corpus pass, results grouped per query in input order.
        "name": "query_documents_batch",
        "description": (
            "Extension: run up to 50 query_documents searches in one call "
            "(amortized over a single corpus scan on the Spark path). "
            "Returns results grouped per query, in input order; rows are "
            "identical to N separate query_documents calls."
        ),
        "inputSchema": {
            "type": "object",
            "properties": {
                "queries": {
                    "type": "array",
                    "items": {"type": "string"},
                    "minItems": 1,
                    "maxItems": 50,
                    "description": "The search queries (1-50).",
                },
                "limit": {
                    "type": "number",
                    "minimum": 1,
                    "maximum": 20,
                    "description": "Max results per query (default 10).",
                },
                "scope": _SCOPE,
            },
            "required": ["queries"],
        },
    },
    {
        "name": "sync_status",
        "description": (
            "Get the current or latest sync job record: { jobId, state "
            "('running' | 'succeeded' | 'failed'), total, completed, "
            "summary { upserted, skipped, empty, pruned }, warnings, error }."
        ),
        "inputSchema": {
            "type": "object",
            "properties": {
                "jobId": {
                    "type": "string",
                    "description": "Identifier returned by sync_start.",
                },
            },
            "required": ["jobId"],
        },
    },
]
