"""``python -m mcp_local_rag_spark`` — the CLI entry point (cli.py)."""

from .cli import main

if __name__ == "__main__":
    raise SystemExit(main())
