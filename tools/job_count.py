"""Job/stage/task composition of registry queries — the ambient-invariant
measurement (job COUNTS don't drift with container phase, seconds do).

    python tools/job_count.py [sf_dir] q1 [q2 ...]

For each query: wall seconds, number of Spark jobs, stages and tasks
submitted while the query (construction + one .count()) ran, via the
statusTracker job-group API. Job-floor-bound lanes show up as many tiny
jobs; shuffle-bound lanes as few jobs with many stages/tasks.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    names = args[1:] if args and os.path.isdir(args[0]) else args

    from mcp_local_rag_spark.queries import queries
    from mcp_local_rag_spark.session import get_spark

    spark = get_spark("job-count")
    spark.range(1000).selectExpr("sum(id)").collect()
    qs = queries()
    sc = spark.sparkContext
    st = sc.statusTracker()

    print(f"{'query':<40} {'sec':>8} {'jobs':>5} {'stages':>7} {'tasks':>7}")
    for name in names:
        spark.catalog.clearCache()
        group = f"probe-{name}"
        sc.setJobGroup(group, name)
        t0 = time.time()
        n = qs[name](spark, sf_dir).count()
        dt = time.time() - t0
        sc.setJobGroup(None, None)
        job_ids = st.getJobIdsForGroup(group)
        stages = tasks = 0
        for jid in job_ids:
            ji = st.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = st.getStageInfo(sid)
                if si is not None:
                    stages += 1
                    tasks += si.numTasks
        print(
            f"{name:<40} {dt:>8.3f} {len(job_ids):>5} {stages:>7} {tasks:>7}"
            f"   rows={n}"
        )


if __name__ == "__main__":
    main()
