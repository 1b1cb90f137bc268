"""The driver-facing contract run the way the DRIVER runs it: a separate
process with a VANILLA SparkSession (default configs — 200 shuffle
partitions, no nanos conf, system timezone), not our tuned get_spark().
Catches config-coupling regressions the in-suite tests can't (one JVM per
pytest session means the tuned session wins getOrCreate)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER_SCRIPT = r"""
import json, sys
sys.path.insert(0, %r)
from pyspark.sql import SparkSession

spark = SparkSession.builder.master("local[8]").getOrCreate()
import __spark_entry__ as E

rows = E.entry(spark).collect()
qs = E.queries()
sqls = E.oracle_sql()
probe = {}
for name in ["scan_projection", "tpch_q1_pricing", "events_hourly"]:
    probe[name] = qs[name](spark, "/root/testdata/sf0.001").count()
print("DRIVER_CONTRACT " + json.dumps({
    "entry_rows": len(rows),
    "entry_cols": sorted(E.entry(spark).columns),
    "n_queries": len(qs),
    "n_oracles": len(sqls),
    "probe": probe,
}))
"""


def test_entry_contract_under_vanilla_session():
    out = subprocess.run(
        [sys.executable, "-c", DRIVER_SCRIPT % REPO],
        capture_output=True,
        text=True,
        timeout=420,
        cwd="/tmp",  # NOT the repo root — the driver's cwd is its own
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = next(
        ln for ln in out.stdout.splitlines() if ln.startswith("DRIVER_CONTRACT ")
    )
    res = json.loads(line.split(" ", 1)[1])
    assert res["entry_rows"] > 0
    assert res["entry_cols"] == ["chunkIndex", "filePath", "score"]
    assert res["n_queries"] >= 100
    # every oracle belongs to a query; exactly one rows-only entry
    assert res["n_queries"] - res["n_oracles"] == 1
    assert all(n > 0 for n in res["probe"].values()), res["probe"]
