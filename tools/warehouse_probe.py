"""Scale probe for the warehouse lanes: does a fixed-size CDC batch cost
the same against a 10x and a 100x table?

The claim under test (plans/merge, plans/ivm): per-batch cost rides the
DELTA and the touched buckets, not the rows the table has absorbed. The
probe holds the delta fixed (base-range keys, present in every replica)
and scales n_buckets with the table (the sizing rule in
plans/ingest.N_BUCKETS: buckets sized for constant bytes-per-bucket), so
a flat exponent is the designed outcome and a linear one is a regression.

    python tools/make_scaled_sf.py /root/testdata/sf0.1 <dir10> 10 documents,events
    python tools/make_scaled_sf.py /root/testdata/sf0.1 <dir100> 100 documents,events
    python tools/warehouse_probe.py <dir10> <dir100> [out.json]

TIMING data only; correctness gates on the driver's own sf dirs.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _probe_merge(spark, sf_dir: str, n_buckets: int, scratch: str) -> dict:
    from mcp_local_rag_spark.plans.merge import create_merge_table, merge_into
    from mcp_local_rag_spark.session import load

    docs = load(spark, sf_dir, "documents")
    t0 = time.time()
    create_merge_table(docs, scratch, "doc_id", n_buckets=n_buckets)
    t_build = time.time() - t0

    # fixed delta: 500 base-range updates + 100 deletes, same keys at
    # every scale factor
    src = (
        docs.filter(F.col("doc_id") < 600)
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") < 500,
                F.concat(F.lit("cdc:"), F.substring("text", 1, 20)),
            ).otherwise(F.col("text")),
        )
        .withColumn("is_delete", F.col("doc_id") >= 500)
    )
    t0 = time.time()
    merge_into(spark, scratch, src, delete_col="is_delete")
    t_merge = time.time() - t0

    # change feed over the same fixed churn: cost must ride the changed
    # buckets (manifest diff), not the table
    from mcp_local_rag_spark.plans.merge import read_changes, snapshot_rowcount

    t0 = time.time()
    n_changes = read_changes(spark, scratch, 1, 2).count()
    t_cdf = time.time() - t0
    t0 = time.time()
    rc = snapshot_rowcount(scratch)
    t_count = time.time() - t0
    return {
        "t_build_sec": round(t_build, 3),
        "t_merge_sec": round(t_merge, 3),
        "t_cdf_sec": round(t_cdf, 3),
        "n_changes": n_changes,
        "t_rowcount_ms": round(t_count * 1000, 2),
        "rowcount": rc,
    }


def _probe_ivm(spark, sf_dir: str, n_buckets: int, scratch: str) -> dict:
    from mcp_local_rag_spark.plans.ivm import ivm_apply, ivm_create
    from mcp_local_rag_spark.session import load

    keys = ["hour", "event_type"]
    measures = [("cnt", "count", None), ("sum_dec", "sum", "value_dec")]

    def delta(df):
        return df.withColumn("hour", F.date_trunc("hour", "ts")).withColumn(
            "value_dec", F.col("value").cast("decimal(18,6)")
        )

    ev = load(spark, sf_dir, "events")
    t0 = time.time()
    ivm_create(spark, scratch, delta(ev), keys, measures, n_buckets=n_buckets)
    ivm_apply(spark, scratch, delta(ev), keys, measures)  # absorb the corpus
    t_absorb = time.time() - t0

    micro = delta(ev.filter(F.col("event_id") < 10_000))  # fixed micro-batch
    t0 = time.time()
    ivm_apply(spark, scratch, micro, keys, measures)
    t_apply = time.time() - t0
    return {
        "t_absorb_sec": round(t_absorb, 3),
        "t_apply_sec": round(t_apply, 3),
    }


def _probe_ivm_sketch(spark, sf_dir: str, n_buckets: int, scratch: str) -> dict:
    """Sketch-measure fold (HLL + Misra-Gries + hist + min/max): the
    map-measure partials add delta scans but the fold must still ride
    the touched buckets — flat micro-batch cost at 10x vs 100x."""
    from mcp_local_rag_spark.plans.ivm import ivm_apply, ivm_create
    from mcp_local_rag_spark.session import load

    keys = ["event_type"]
    measures = [
        ("cnt", "count", None),
        ("vmin", "min", "value_dec"),
        ("ndv_sk", "approx_ndv", "user_id"),
        ("hot", "approx_topk:40", "dom"),
        ("vhist", "hist", "vbin"),
    ]

    def delta(df):
        return (
            df.withColumn("value_dec", F.col("value").cast("decimal(18,6)"))
            .withColumn("dom", F.dayofmonth("ts").cast("string"))
            .withColumn(
                "vbin",
                F.least(F.floor(F.col("value") / 50), F.lit(9)).cast("string"),
            )
        )

    ev = load(spark, sf_dir, "events")
    t0 = time.time()
    ivm_create(spark, scratch, delta(ev), keys, measures, n_buckets=n_buckets)
    ivm_apply(spark, scratch, delta(ev), keys, measures)
    t_absorb = time.time() - t0

    micro = delta(ev.filter(F.col("event_id") < 10_000))
    t0 = time.time()
    ivm_apply(spark, scratch, micro, keys, measures)
    t_apply = time.time() - t0

    # point-read lane: one key, one bucket — constant bytes per bucket
    # means a flat lookup at any table size
    from mcp_local_rag_spark.plans.merge import create_merge_table, key_lookup

    pt = os.path.join(scratch + "_pt")
    docs = load(spark, sf_dir, "documents")
    create_merge_table(docs, pt, "doc_id", n_buckets=n_buckets)
    times = []
    for k in (11, 97, 503):
        t0 = time.time()
        key_lookup(spark, pt, k).collect()
        times.append(time.time() - t0)
    # serving-path twin (plans/point_read): same manifests and files,
    # no Spark job — flatness AND absolute floor both matter at 100 TB
    from mcp_local_rag_spark.plans.point_read import SnapshotReader

    reader = SnapshotReader(pt)
    reader.lookup(11)  # warm: manifest + dataset handle
    stimes = []
    for i in range(60):
        t0 = time.time()
        reader.lookup(11 + i * 13)
        stimes.append(time.time() - t0)
    stimes.sort()
    return {
        "t_absorb_sec": round(t_absorb, 3),
        "t_apply_sec": round(t_apply, 3),
        "t_point_read_p50_ms": round(sorted(times)[1] * 1000, 1),
        "t_point_serve_p50_ms": round(stimes[len(stimes) // 2] * 1000, 2),
    }


def _probe_optimize(spark, sf_dir: str, n_buckets: int, scratch: str) -> dict:
    """Does clustered compaction actually prune a range scan? Build the
    events snapshot table with FEW, LARGE buckets (within-bucket
    clustering is the lever under test; at 640 tiny buckets there is
    nothing inside a bucket to skip), time a ~2%-of-range ts aggregate
    before/after optimize, and — the noise-free evidence — count from
    the parquet FOOTERS how many row groups' min/max stats intersect
    the predicate: that is exactly the set a pushed-down reader reads."""
    from mcp_local_rag_spark.plans.merge import (
        create_merge_table,
        optimize_table,
        read_manifest,
        read_snapshot,
    )
    from mcp_local_rag_spark.session import load

    ev = load(spark, sf_dir, "events").select("event_id", "ts", "value")
    create_merge_table(ev, scratch, "event_id", n_buckets=8)
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    span = (hi - lo) / 50  # ~2% of the time range

    def scan():
        t0 = time.time()
        n = (
            read_snapshot(spark, scratch)
            .filter((F.col("ts") >= lo) & (F.col("ts") < lo + span))
            .agg(F.count(F.lit(1)), F.sum("value"))
            .collect()
        )
        return time.time() - t0, n[0][0]

    def intersecting_rowgroups():
        import pyarrow.parquet as pq

        m = read_manifest(scratch)
        total = hit = 0
        for d in sorted(set(m["buckets"].values())):
            root = os.path.join(scratch, d)
            for bname in os.listdir(root):
                if not bname.startswith("bucket="):
                    continue
                bdir = os.path.join(root, bname)
                for f in os.listdir(bdir):
                    if not f.endswith(".parquet"):
                        continue
                    md = pq.ParquetFile(os.path.join(bdir, f)).metadata
                    names = [
                        md.schema.column(i).name
                        for i in range(md.num_columns)
                    ]
                    ci = names.index("ts")
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(ci).statistics
                        total += 1
                        if st is None or not st.has_min_max:
                            hit += 1  # no stats -> reader must read it
                            continue
                        # MICROS stats come back tz-aware (UTC); Spark's
                        # collected bounds are naive — compare naive
                        smin = st.min.replace(tzinfo=None)
                        smax = st.max.replace(tzinfo=None)
                        if smax >= lo and smin < lo + span:
                            hit += 1
        return hit, total

    scan()  # warm listing caches so both timings compare like-for-like
    t_before, n1 = scan()
    rg_before, rg_total_before = intersecting_rowgroups()
    t0 = time.time()
    optimize_table(spark, scratch, ["ts"], max_records_per_file=100_000)
    t_opt = time.time() - t0
    scan()
    t_after, n2 = scan()
    rg_after, rg_total_after = intersecting_rowgroups()
    assert n1 == n2, (n1, n2)
    return {
        "t_scan_unclustered_sec": round(t_before, 3),
        "t_scan_clustered_sec": round(t_after, 3),
        "t_optimize_sec": round(t_opt, 3),
        "rows_matched": n1,
        "rowgroups_intersecting_before": f"{rg_before}/{rg_total_before}",
        "rowgroups_intersecting_after": f"{rg_after}/{rg_total_after}",
        "t_apply_sec": round(t_after, 3),  # exponent keys on t_apply_sec
    }


def _probe_secondary(spark, sf_dir: str, n_buckets: int, scratch: str) -> dict:
    """Does the SHARDED secondary index survive a skewed value at scale?
    Index documents by lang; look up the most common value (the skew
    case the round-10 VERDICT flagged — previously one monolithic map
    row pulled to the driver) and a rare one. The skewed lookup must
    ride the DISTRIBUTED plan (driver state <= S counters) with cost ~
    its matched rows; the selective lookup stays a bounded point read."""
    from mcp_local_rag_spark.plans.merge import create_merge_table
    from mcp_local_rag_spark.plans.secondary import (
        create_secondary_index,
        lookup_by,
    )
    from mcp_local_rag_spark.session import load

    docs = load(spark, sf_dir, "documents")
    # plant 5 rows of a synthetic lang: a value whose cardinality is
    # FIXED across scale factors — the truly-selective lookup (replica
    # corpora scale every natural value's count with the factor, which
    # measures output volume, not the index)
    max_id = docs.agg(F.max("doc_id")).first()[0]
    planted = docs.limit(5).select(
        (F.col("doc_id") + max_id + 1).alias("doc_id"),
        "text",
        F.lit("zzprobe").alias("lang"),
        "source",
        "n_chars",
    )
    create_merge_table(
        docs.unionByName(planted), scratch, "doc_id", n_buckets=n_buckets
    )
    idx = scratch + "_idx"
    create_secondary_index(spark, scratch, idx, "lang", n_buckets=16)
    hot = (
        docs.groupBy("lang").count().orderBy(F.col("count").desc()).first()
    )["lang"]

    def timed(value):
        best, n = None, 0
        for _ in range(3):
            t0 = time.time()
            n = lookup_by(spark, idx, value).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3), n

    t_hot, n_hot = timed(hot)
    t_sel, n_sel = timed("zzprobe")
    return {
        "hot_value": hot,
        "t_skewed_lookup_sec": t_hot,
        "rows_skewed": n_hot,
        "us_per_matched_row": round(t_hot / max(n_hot, 1) * 1e6, 2),
        "t_selective_lookup_sec": t_sel,
        "rows_selective": n_sel,
        "t_apply_sec": t_sel,  # exponent keys on the fixed-size lookup
    }


def _probe_maintain_traffic(spark, sf_dir: str, n_buckets: int, scratch: str) -> dict:
    """Maintenance-under-traffic (round 13): table_maintain passes race a
    live merge-writer loop on the same table, and ivf_maintain races an
    appender on the same index. Timings report the maintenance pass cost
    under contention; the probe then QUIESCES and asserts convergence —
    no lost rows (exact declarative checksum), contiguous versions, no
    stuck split markers, vacuum never reclaimed a live dir."""
    import threading

    from mcp_local_rag_spark.plans.maintain import table_maintain
    from mcp_local_rag_spark.plans.merge import (
        _current_raw,
        create_merge_table,
        list_versions,
        merge_into,
        read_snapshot,
    )
    from mcp_local_rag_spark.session import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    table = os.path.join(scratch, "tbl")
    create_merge_table(docs, table, "doc_id", n_buckets=n_buckets)
    errors: list = []
    writer_secs: list = []
    maint_secs: list = []
    N_MERGES = 6

    def writer():
        try:
            for i in range(N_MERGES):
                # fixed 200-key base-range delta, n_chars += 1 each pass
                delta = (
                    docs.filter(F.col("doc_id") < 200)
                    .withColumn("n_chars", F.col("n_chars") + (i + 1))
                    .withColumn("is_delete", F.lit(False))
                )
                t0 = time.time()
                merge_into(
                    spark, table, delta, delete_col="is_delete",
                    max_retries=16,
                )
                writer_secs.append(time.time() - t0)
        except BaseException as e:  # noqa: BLE001
            errors.append(f"writer: {e!r}")

    writer_done = threading.Event()

    def maintainer():
        # run passes for the WHOLE writer window (not a fixed count that
        # drains before contention starts): every pass overlaps live
        # merges, and post-merge scatter makes compaction actually fire
        try:
            while not writer_done.is_set():
                t0 = time.time()
                table_maintain(
                    spark, table,
                    vacuum_keep_versions=2, vacuum_grace_seconds=3.0,
                )
                maint_secs.append(time.time() - t0)
                # cron cadence, not a busy spin: an un-paced loop runs
                # tens of thousands of metadata no-op passes that only
                # contend with the writer it is measuring against
                writer_done.wait(0.5)
        except BaseException as e:  # noqa: BLE001
            errors.append(f"maintainer: {e!r}")

    tw = threading.Thread(target=writer)
    tm = threading.Thread(target=maintainer)
    tw.start(); tm.start(); tw.join(); writer_done.set(); tm.join()
    assert not errors, errors
    # quiesced convergence: one more pass, then the exact declarative audit
    table_maintain(spark, table, vacuum_keep_versions=2,
                   vacuum_grace_seconds=3.0)
    snap = read_snapshot(spark, table)
    got = snap.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("doc_id") * 31 + F.col("n_chars")).alias("ck"),
    ).first()
    base = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("doc_id") * 31 + F.col("n_chars")).alias("ck"),
    ).first()
    # the LAST merge wins per key (delta i sets n_chars = base + i + 1),
    # so each of the 200 keys ends exactly N_MERGES above its base
    expect_ck = base["ck"] + 200 * N_MERGES
    assert got["n"] == base["n"], (got["n"], base["n"])
    assert got["ck"] == expect_ck, (got["ck"], expect_ck)
    vs = list_versions(table)
    assert _current_raw(table) == max(vs) and sorted(vs) == vs

    # IVF: appender vs ivf_maintain on one index
    from mcp_local_rag_spark.plans.ann_index import (
        append_to_ivf_index,
        ivf_maintain,
        read_ivf_cells,
        write_ivf_index,
    )

    emb = load(spark, sf_dir, "embeddings")
    idx = os.path.join(scratch, "ivf")
    base_rows = emb.filter(F.col("vec_id") % 3 == 0)
    write_ivf_index(
        base_rows.withColumn("cell", F.col("label")), idx,
        sort_cols=("vec_id",),
    )
    batches = [
        emb.filter(F.col("vec_id") % 3 == r).withColumn("cell", F.col("label"))
        for r in (1, 2)
    ]
    ivf_secs: list = []

    def appender():
        try:
            for b in batches:
                append_to_ivf_index(b, idx, sort_cols=("vec_id",))
        except BaseException as e:  # noqa: BLE001
            errors.append(f"appender: {e!r}")

    def ivf_maintainer():
        try:
            for _ in range(3):
                t0 = time.time()
                ivf_maintain(spark, idx, split_fill_ratio=3.0, max_splits=2,
                             seed_col="vec_id")
                ivf_secs.append(time.time() - t0)
        except BaseException as e:  # noqa: BLE001
            errors.append(f"ivf: {e!r}")

    ta = threading.Thread(target=appender)
    ti = threading.Thread(target=ivf_maintainer)
    ta.start(); ti.start(); ta.join(); ti.join()
    assert not errors, errors
    ivf_maintain(spark, idx, split_fill_ratio=3.0, max_splits=2,
                 seed_col="vec_id")
    spark.catalog.refreshByPath(idx)
    import glob as _glob
    n_total = emb.count()
    n_idx = read_ivf_cells(spark, idx).count()
    assert n_idx == n_total, (n_idx, n_total)  # no lost rows under the flock
    assert not _glob.glob(os.path.join(idx, "._split_*.json"))  # no stuck markers
    return {
        "t_apply_sec": round(max(maint_secs), 3),
        "t_maintain_max_sec": round(max(maint_secs), 3),
        "t_maintain_mean_sec": round(sum(maint_secs) / len(maint_secs), 3),
        "t_writer_mean_sec": round(sum(writer_secs) / len(writer_secs), 3),
        "t_ivf_maintain_max_sec": round(max(ivf_secs), 3),
        "n_writer_merges": len(writer_secs),
        "n_maintain_passes": len(maint_secs),
        "converged_rows": int(got["n"]),
        "ivf_rows": int(n_idx),
        "note": (
            "max pass = the one full compaction that fired under traffic "
            "(data-bound by design: it rewrites the bytes the concurrent "
            "merges scattered); the generic delta_exponent is not a "
            "per-batch scaling claim here — the gate is the quiesced "
            "convergence asserts"
        ),
    }


def main(dir10: str, dir100: str, out_path: str | None) -> None:
    from mcp_local_rag_spark.session import get_spark

    spark = get_spark("warehouse-probe")
    spark.range(1000).selectExpr("sum(id)").collect()

    result: dict = {"metric": "warehouse_scale_probe", "unit": "sec", "lanes": {}}
    work = os.path.join("/tmp", "warehouse_probe_scratch")
    shutil.rmtree(work, ignore_errors=True)

    for lane, fn in (
        ("merge_cdc", _probe_merge),
        ("ivm_microbatch", _probe_ivm),
        ("ivm_sketch", _probe_ivm_sketch),
        ("optimize_skipping", _probe_optimize),
        ("secondary_lookup", _probe_secondary),
        ("maintain_under_traffic", _probe_maintain_traffic),
    ):
        r10 = fn(spark, dir10, 64, os.path.join(work, f"{lane}_10"))
        r100 = fn(spark, dir100, 640, os.path.join(work, f"{lane}_100"))
        tkeys = (
            ["t_merge_sec", "t_cdf_sec"]
            if lane == "merge_cdc"
            else ["t_apply_sec"]
        )
        entry = {"x10": r10, "x100": r100}
        for tkey in tkeys:
            alpha = math.log(r100[tkey] / r10[tkey]) / math.log(10.0)
            suffix = "" if tkey == tkeys[0] else f"_{tkey.split('_')[1]}"
            entry[f"delta_ratio{suffix}"] = round(r100[tkey] / r10[tkey], 3)
            entry[f"delta_exponent{suffix}"] = round(alpha, 3)
            print(
                f"# {lane}: 10x {tkey}={r10[tkey]}s 100x={r100[tkey]}s "
                f"alpha={alpha:.2f}",
                file=sys.stderr,
            )
        result["lanes"][lane] = entry

    result["provenance"] = (
        "self-measured: sf0.1 documents/events replicated 10x and "
        "100x via make_scaled_sf.py; fixed base-range CDC delta and "
        "micro-batch; n_buckets scaled with the table (64 -> 640) per the "
        "constant-bytes-per-bucket sizing rule, so flat per-batch cost is "
        "the designed outcome being verified. Round 11: t_point_read is "
        "the in-plan key_lookup (bucket routed driver-locally — removed "
        "the one-row hash job that dominated r10's 174-188 ms readings); "
        "t_point_serve is plans/point_read.SnapshotReader (pyarrow "
        "sidecar, no Spark job) over the same files and manifests"
    )
    shutil.rmtree(work, ignore_errors=True)
    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None)
