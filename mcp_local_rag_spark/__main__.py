"""``python -m mcp_local_rag_spark`` — the CLI entry point (cli.py)."""

from .cli import main

raise SystemExit(main())
