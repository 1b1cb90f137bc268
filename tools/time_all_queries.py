"""Time every registry query (Spark side only): one timed pass after a
shared session warm-up, with the ambient numpy probe sampled every 20
queries so each timing can be read against the container phase it ran in.

    python tools/time_all_queries.py [sf_dir] [--out OUT.json]

Ranking tool for the optimization rounds — NOT a correctness gate (use
tools/check_correctness.py for that) and NOT the bench of record
(bench.py). Single pass keeps the sweep short; treat small deltas as
noise and re-measure candidates min-of-N before acting.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ambient_numpy_ms() -> float:
    import numpy as np

    rng = np.random.default_rng(7)
    a = rng.standard_normal((512, 512))
    ts = []
    for _ in range(5):
        t0 = time.time()
        (a @ a).sum()
        ts.append((time.time() - t0) * 1000)
    ts.sort()
    return round(ts[len(ts) // 2], 2)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out = None
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"

    from mcp_local_rag_spark.queries import queries
    from mcp_local_rag_spark.session import get_spark

    spark = get_spark("time-all")
    spark.range(1000).selectExpr("sum(id)").collect()
    qs = queries()

    rows = []
    for i, name in enumerate(sorted(qs)):
        if i % 20 == 0:
            rows.append({"ambient_numpy_ms": ambient_numpy_ms()})
        spark.catalog.clearCache()
        t0 = time.time()
        try:
            n = qs[name](spark, sf_dir).count()
            err = None
        except Exception as ex:  # keep sweeping; the gate tool owns failures
            n, err = -1, f"{type(ex).__name__}: {ex}"[:200]
        dt = round(time.time() - t0, 3)
        rows.append({"query": name, "sec": dt, "rows": n, **({"err": err} if err else {})})
        print(f"{dt:8.3f}s  {name}" + (f"  ERR {err}" if err else ""), file=sys.stderr)
    rows.append({"ambient_numpy_ms": ambient_numpy_ms()})

    doc = {"sf_dir": sf_dir, "rows": rows}
    if out:
        with open(out, "w") as f:
            json.dump(doc, f, indent=1)
    timed = [r for r in rows if "query" in r]
    timed.sort(key=lambda r: -r["sec"])
    print(json.dumps({"top": timed[:25]}, indent=1))


if __name__ == "__main__":
    main()
