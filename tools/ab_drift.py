"""Interleaved A/B bench between two git refs — the standing artifact
that separates code regressions from ambient container drift (the
AB_DRIFT_r09 method, made a tool). Cross-round BENCH absolute deltas on
this container routinely move ±15% with no code change; the ONLY
meaningful comparison is two checkouts benched in one session,
interleaved, fresh JVM per pass, min-of-passes.

    python tools/ab_drift.py <refA> <refB> [out.json] \
        [--queries q1,q2] [--passes 3] [--sf-dir DIR] [--order=fixed|swap]

``--order=swap`` alternates which ref runs FIRST each pass (A,B / B,A /
A,B ...): a fixed order lets any systematic first-runner effect (page
cache, scratch-dir reuse, CPU-governor ramp) masquerade as a code delta
— the r13 hybrid_search_indexed residual question. Default stays fixed
for continuity with the r9-r13 artifacts.

Each pass runs in a SUBPROCESS with cwd+PYTHONPATH pointed at the ref's
git worktree, so the measured code is exactly that checkout's. Queries
missing from a ref's registry record null. Worktrees land under
/tmp/ab_worktrees and are reused across invocations.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# ALL driver headline queries (bench.HEADLINE) — round 13: every
# headline gets a drift alibi, so a cross-round creep (r12's
# tpch_q3_topk) is settled by interleaved same-session data instead of
# argued from three-round history
DEFAULT_QUERIES = [
    "hybrid_search",
    "hybrid_search_indexed",
    "hybrid_search_batch",
    "vector_topk",
    "bm25_unigram",
    "tpch_q1_pricing",
    "tpch_q3_topk",
    "sync_plan",
    "dedup_minhash_lsh",
    "knn_bruteforce",
    "events_sessionize",
    "text_quality",
]

# runs inside each checkout: one timed pass per query, fresh session.
# With lanes=1 the NON-registry lanes (neighbor read x3 shapes, the
# serving sidecars, warehouse point reads) ride along via the checkout's
# own bench.py helpers — round 11's regression hid exactly there, in
# lanes the registry-only A/B never covered.
_RUNNER = r"""
import json, sys, time
sys.path.insert(0, sys.argv[1])
sf_dir, names, lanes = sys.argv[2], sys.argv[3].split(","), sys.argv[4] == "1"
from mcp_local_rag_spark.queries import queries
from mcp_local_rag_spark.session import get_spark
spark = get_spark("ab-drift")
spark.range(1000).selectExpr("sum(id)").collect()
qs = queries()
out = {}
for name in names:
    if name not in qs:
        out[name] = None
        continue
    qs[name](spark, sf_dir).count()  # warm: scratch builds + codegen
    spark.catalog.clearCache()
    t0 = time.time()
    qs[name](spark, sf_dir).count()
    out[name] = round(time.time() - t0, 3)
if lanes:
    import bench
    try:
        nb = bench._neighbor_bench(spark)
        # r15 bench returns (serve, sparkplan, warm, pinned); r14 and
        # earlier returned (serve, sparkplan, pinned) — unpack by length
        # so either side of an A/B can be an older checkout
        out["lane:neighbor_serve_p95_ms"] = nb[0]
        out["lane:neighbor_sparkplan_p95_ms"] = nb[1]
        if len(nb) >= 4:
            out["lane:neighbor_warm_p95_ms"] = nb[2]
        out["lane:neighbor_pinned_p95_ms"] = nb[-1]
    except Exception as e:
        out["lane:neighbor_err"] = str(e)[:200]
    # ambient denominators, per pass per ref: every pass carries its own
    # box-speed reading so the summary can normalize query times against
    # the machine AT MEASUREMENT TIME (older refs lack _ambient_control)
    amb_fn = getattr(bench, "_ambient_control", None)
    if amb_fn is not None:
        try:
            for k, v in amb_fn(spark).items():
                out[f"ambient:{k}"] = v
        except Exception as e:
            out["ambient:err"] = str(e)[:200]
    for fname, key in (
        ("_vector_serve_bench", "vector_serve"),
        ("_hybrid_serve_bench", "hybrid_serve"),
        ("_ivf_serve_bench", "ivf_serve"),
        ("_warehouse_point_bench", "warehouse_point"),
    ):
        fn = getattr(bench, fname, None)
        if fn is None:
            continue
        try:
            p50, p95 = fn(spark, sf_dir)
            out[f"lane:{key}_p50_ms"] = p50
            out[f"lane:{key}_p95_ms"] = p95
        except Exception as e:
            out[f"lane:{key}_err"] = str(e)[:200]
print("ABDRIFT " + json.dumps(out))
"""


def _worktree(ref: str) -> str:
    short = subprocess.check_output(
        ["git", "rev-parse", "--short", ref], cwd=REPO, text=True
    ).strip()
    path = f"/tmp/ab_worktrees/{short}"
    if not os.path.isdir(path):
        os.makedirs("/tmp/ab_worktrees", exist_ok=True)
        # a manually deleted dir leaves a registered-but-missing
        # worktree; prune first so re-adding the same ref always works
        subprocess.check_call(["git", "worktree", "prune"], cwd=REPO)
        subprocess.check_call(
            ["git", "worktree", "add", "--detach", path, ref], cwd=REPO
        )
    return path


def _one_pass(
    tree: str, sf_dir: str, names: list[str], lanes: bool
) -> dict:
    env = dict(os.environ, PYTHONPATH=tree)
    proc = subprocess.run(
        [
            sys.executable, "-c", _RUNNER, tree, sf_dir, ",".join(names),
            "1" if lanes else "0",
        ],
        cwd=tree,
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("ABDRIFT "):
            return json.loads(line[len("ABDRIFT "):])
    raise RuntimeError(
        f"runner in {tree} produced no result:\n{proc.stdout[-2000:]}"
        f"\n{proc.stderr[-2000:]}"
    )


def main(argv: list[str]) -> None:
    args = [a for a in argv if not a.startswith("--")]
    opts = {
        k.lstrip("-"): v
        for k, v in (a.split("=", 1) for a in argv if a.startswith("--"))
    }
    ref_a, ref_b = args[0], args[1]
    out_path = args[2] if len(args) > 2 else None
    names = opts.get("queries", ",".join(DEFAULT_QUERIES)).split(",")
    passes = int(opts.get("passes", 3))
    sf_dir = opts.get("sf-dir", "/root/testdata/sf0.1")
    lanes = opts.get("lanes", "1") == "1"
    order = opts.get("order", "fixed")

    trees = {ref_a: _worktree(ref_a), ref_b: _worktree(ref_b)}
    raw: dict[str, list[dict]] = {ref_a: [], ref_b: []}
    for p in range(passes):
        pair = (ref_a, ref_b)
        if order == "swap" and p % 2 == 1:
            pair = (ref_b, ref_a)
        for ref in pair:  # interleaved: drift hits both sides
            res = _one_pass(trees[ref], sf_dir, names, lanes)
            raw[ref].append(res)
            print(f"# pass {p + 1} {ref}: {res}", file=sys.stderr)

    def best(ref: str) -> dict:
        out = {}
        keys = list(names) + sorted(
            {
                k
                for r in raw[ref]
                for k in r
                if k.startswith("lane:") or k.startswith("ambient:")
            }
        )
        for n in keys:
            vals = [
                r[n]
                for r in raw[ref]
                if isinstance(r.get(n), (int, float))
            ]
            out[n] = min(vals) if vals else None
        return out

    summary = {ref_a: best(ref_a), ref_b: best(ref_b)}

    # normalized deltas (round-14 advice #5): divide each measurement by
    # the SAME ref's job-floor ambient probe, so "is +9% real?" reads off
    # the artifact — if raw moves but the job-floor-normalized ratio is
    # flat, the swing is the box; if the ratio moves too, it's the code.
    # Query times are sec, lanes ms; both become dimensionless ratios.
    def _norm(ref: str) -> dict:
        floor = summary[ref].get("ambient:spark_jobfloor_p95_ms")
        if not floor:
            return {}
        out = {}
        for k, v in summary[ref].items():
            if k.startswith("ambient:") or not isinstance(v, (int, float)):
                continue
            ms = v * 1000.0 if not k.startswith("lane:") else v
            out[k] = round(ms / floor, 3)
        return out

    norm_a, norm_b = _norm(ref_a), _norm(ref_b)
    deltas = {}
    for k in norm_a:
        va, vb = summary[ref_a].get(k), summary[ref_b].get(k)
        if k in norm_b and isinstance(va, (int, float)) and va:
            deltas[k] = {
                "raw_pct": round((vb - va) / va * 100.0, 1),
                "normalized_pct": round(
                    (norm_b[k] - norm_a[k]) / norm_a[k] * 100.0, 1
                ),
            }

    result = {
        "metric": f"ab_{ref_a}_vs_{ref_b}",
        "passes": passes,
        "order": order,
        "sf_dir": sf_dir,
        "summary": summary,
        "normalized": {ref_a: norm_a, ref_b: norm_b},
        "deltas": deltas,
        "provenance": (
            f"{ref_a} and {ref_b} git worktrees benched in ONE session on "
            f"the same container, interleaved passes x{passes}, fresh JVM "
            "per pass (subprocess), warmed then timed once per pass, "
            "min-of-passes; local[32]. normalized = value / the same "
            "ref's spark_jobfloor_p95_ms ambient probe (min-of-passes); "
            "deltas.normalized_pct flat while raw_pct moves => ambient."
        ),
    }
    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main(sys.argv[1:])
