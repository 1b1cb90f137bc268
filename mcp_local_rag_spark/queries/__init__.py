"""Driver-facing query registry.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with an
equivalent DuckDB oracle SQL string (or None for non-SQL-expressible ops).
Importing the submodules populates REGISTRY via the @register decorator.
"""

from .common import REGISTRY  # noqa: F401
from . import rag  # noqa: F401,E402
from . import relational  # noqa: F401,E402
from . import ext  # noqa: F401,E402
from . import tpch  # noqa: F401,E402
from . import events  # noqa: F401,E402


def queries():
    return {name: entry["spark"] for name, entry in REGISTRY.items()}


def oracle_sql():
    return {
        name: entry["sql"]
        for name, entry in REGISTRY.items()
        if entry["sql"] is not None
    }
