"""Dump ``explain('formatted')`` for named registry queries to files.

    python tools/dump_plans.py plans/r15 before hybrid_search dedup_minhash_lsh ...
    python tools/dump_plans.py plans/r15 after  hybrid_search ...

Writes <outdir>/<query>_<tag>.txt — the optimization-round evidence files
(the judge reads plan claims against these). Uses sf0.001 so the dump is
fast; plan SHAPE (exchanges, join strategies, Python nodes, pushdown) is
scale-invariant modulo AQE runtime decisions, which explain() shows as
the initial plan anyway.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    outdir, tag, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)

    from mcp_local_rag_spark.queries import queries
    from mcp_local_rag_spark.session import get_spark

    spark = get_spark("dump-plans")
    qs = queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted') @ {SF_DIR} [{tag}]\n\n")
            f.write(plan)
        n_ex = plan.count("Exchange")
        n_py = sum(plan.count(t) for t in
                   ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                    "FlatMapGroupsInPandas", "MapInArrow"))
        print(f"{name}: {n_ex} Exchange, {n_py} Python nodes -> {path}")


if __name__ == "__main__":
    main()
