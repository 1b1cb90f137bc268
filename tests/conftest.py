import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mcp_local_rag_spark.session import get_spark  # noqa: E402

# Depth/selection contract (r16): the default run must finish inside the
# driver's verify window, so the deepest randomized sweeps run at reduced
# depth and the heaviest storm/matrix tests are SKIPPED (visible as `s`,
# never deleted). Set SPARK_GRAFT_FULL_TESTS=1 to run everything at full
# depth — the round-close discipline.
FULL_TESTS = bool(os.environ.get("SPARK_GRAFT_FULL_TESTS"))


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: deep randomized/storm coverage, skipped unless "
        "SPARK_GRAFT_FULL_TESTS=1 (kept out of the default verify window)",
    )


def pytest_collection_modifyitems(config, items):
    if FULL_TESTS:
        return
    skip = pytest.mark.skip(reason="slow: set SPARK_GRAFT_FULL_TESTS=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark("tests")
    yield s
