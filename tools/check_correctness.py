"""Local stand-in for the driver's duckdb-oracle gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column names,
and order-insensitive values. Usage:

    python tools/check_correctness.py [sf_dir] [query ...]
    python tools/check_correctness.py --json OUT.json sf_dir   # full-sweep artifact
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def duck_connect(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t + '.parquet')}'"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def values_equal(a, b) -> bool:
    try:
        if pd.isna(a) and pd.isna(b):  # None/NaN/NaT on both sides
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return a == b


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        return [f"columns differ: spark={sc} duck={dc}"]
    if len(spark_pdf) != len(duck_pdf):
        return [f"row count differs: spark={len(spark_pdf)} duck={len(duck_pdf)}"]
    a, b = canon(spark_pdf), canon(duck_pdf)
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if not values_equal(x, y):
                problems.append(f"col {col} row {i}: spark={x!r} duck={y!r}")
                if len(problems) > 5:
                    return problems
    return problems


def digest_check(sdf: pd.DataFrame) -> list[str]:
    """Recompute each doc's boundary digest (md5 over the sorted
    'chunk_index:chunk_len:n_sentences' triples) from the returned rows
    and compare it with the returned boundary_digest column."""
    import hashlib

    problems = []
    for doc_id, grp in sdf.groupby("doc_id"):
        parts = sorted(
            f"{int(r.chunk_index):06d}:{int(r.chunk_len)}:{int(r.n_sentences)}"
            for r in grp.itertuples()
        )
        want = hashlib.md5(",".join(parts).encode()).hexdigest()
        got = set(grp["boundary_digest"])
        if got != {want}:
            problems.append(f"doc {doc_id}: digest {got} != recomputed {want}")
            if len(problems) > 5:
                break
    return problems


def main():
    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    records: dict[str, dict] = {}

    import __spark_entry__ as entrymod

    if os.environ.get("SPARK_GRAFT_VANILLA"):
        # driver-twin mode: a PLAIN session (default 200 shuffle
        # partitions, system timezone, no tuned confs) — catches any
        # query that silently depends on our session factory
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[32]").getOrCreate()
    else:
        from mcp_local_rag_spark.session import get_spark

        spark = get_spark("correctness-check")
    con = duck_connect(sf_dir)

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        spark.catalog.clearCache()
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failed.append(name)
            records[name] = {"status": "fail", "err": f"spark: {type(e).__name__}: {e}"}
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            continue
        t_spark = time.time() - t0
        sql = sqls.get(name)
        if sql is None:
            # no-oracle entries with a boundary_digest column get a HARD
            # self-check: recompute the per-doc digest from the returned
            # rows and compare with the returned column (the digest
            # definition lives in queries/rag.q_chunk_documents)
            if "boundary_digest" in sdf.columns:
                probs = digest_check(sdf)
                if probs:
                    failed.append(name)
                    records[name] = {"status": "fail", "err": "digest self-check"}
                    print(f"FAIL {name}: digest self-check")
                    for p in probs[:6]:
                        print(f"    {p}")
                    continue
                records[name] = {
                    "status": "ok_rows_digest", "rows": len(sdf),
                    "spark_sec": round(t_spark, 2),
                }
                print(
                    f"ok(rows+digest) {name}: {len(sdf)} rows  spark={t_spark:.1f}s"
                )
            else:
                records[name] = {
                    "status": "ok_rows_only", "rows": len(sdf),
                    "spark_sec": round(t_spark, 2),
                }
                print(f"ok(rows-only) {name}: {len(sdf)} rows  spark={t_spark:.1f}s")
            continue
        t0 = time.time()
        try:
            ddf = con.execute(sql).fetchdf()
        except Exception as e:
            failed.append(name)
            records[name] = {"status": "fail", "err": f"duckdb: {type(e).__name__}: {e}"}
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            continue
        t_duck = time.time() - t0
        problems = compare(name, sdf, ddf)
        if problems:
            failed.append(name)
            records[name] = {"status": "fail", "err": problems[:3]}
            print(f"FAIL {name}: ({len(sdf)} spark rows, {len(ddf)} duck rows)")
            for p in problems[:6]:
                print(f"    {p}")
        else:
            records[name] = {
                "status": "ok", "rows": len(sdf),
                "spark_sec": round(t_spark, 2), "duck_sec": round(t_duck, 2),
            }
            print(
                f"ok {name}: {len(sdf)} rows  spark={t_spark:.1f}s duck={t_duck:.1f}s"
            )
    if json_out:
        import json as _json

        n_ok = sum(1 for r in records.values() if r["status"].startswith("ok"))
        _json.dump(
            {
                "sf_dir": sf_dir,
                "n_queries": len(records),
                "n_ok": n_ok,
                "n_fail": len(failed),
                "queries": records,
            },
            open(json_out, "w"),
            indent=1,
        )
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
