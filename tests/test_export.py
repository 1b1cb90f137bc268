"""Training-shard export sinks (plans/export): completeness, shard
routing, file-size bounds, and pack-bin agreement with the oracle-paired
documents_pack_bins rule."""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import functions as F

from mcp_local_rag_spark.plans.export import (
    assign_pack_bins,
    export_jsonl_shards,
    export_packed_parquet,
)
from mcp_local_rag_spark.session import load

SF = "/root/testdata/sf0.001"


def test_jsonl_shards_complete_and_bounded(spark, tmp_path):
    docs = load(spark, SF, "documents").select("doc_id", "text", "lang")
    out = str(tmp_path / "shards")
    export_jsonl_shards(docs, out, max_records_per_file=50)

    files = glob.glob(os.path.join(out, "lang=*", "*.json"))
    assert files
    seen = set()
    for f in files:
        with open(f) as fh:
            lines = [json.loads(line) for line in fh if line.strip()]
        assert len(lines) <= 50  # record cap respected
        lang = f.split("lang=")[1].split(os.sep)[0]
        for rec in lines:
            seen.add(rec["doc_id"])
            assert "text" in rec and rec["text"]
        # every record in a shard dir belongs to that shard key
        back = {r.doc_id for r in docs.filter(F.col("lang") == lang).collect()}
        assert all(rec["doc_id"] in back for rec in lines)
    assert seen == {r.doc_id for r in docs.collect()}  # nothing dropped


def test_packed_parquet_matches_pack_bins_oracle(spark, tmp_path):
    """The exported (lang, bin) assignment aggregates to EXACTLY the
    documents_pack_bins result — the export is the row-level face of the
    oracle-checked rule."""
    from mcp_local_rag_spark.queries.ext import q_documents_pack_bins

    docs = load(spark, SF, "documents").select("doc_id", "text", "lang", "n_chars")
    out = str(tmp_path / "packed")
    export_packed_parquet(docs, out)

    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    agg = {
        (r.lang, r.bin): (r.n_docs, r.bin_chars)
        for r in back.groupBy("lang", "bin")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("bin_chars"))
        .collect()
    }
    expected = {
        (r.lang, r.bin): (r.n_docs, r.bin_chars)
        for r in q_documents_pack_bins(spark, SF).collect()
    }
    assert agg == expected


def test_assign_pack_bins_budget_bound(spark):
    """No bin's START offset exceeds its budget slot: doc i sits in bin
    floor(start_i / budget), so within a shard the bins are monotone and
    a bin's accumulated chars exceed the budget only via its LAST doc
    (the streaming-packing overflow rule)."""
    docs = load(spark, SF, "documents").select("doc_id", "lang", "n_chars")
    packed = assign_pack_bins(docs, budget=4096)
    rows = sorted(
        packed.collect(), key=lambda r: (r.lang, r.doc_id)
    )
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault(r.lang, []).append(r)
    for lang, rs in by_shard.items():
        start = 0
        for r in rs:
            assert r.bin == start // 4096, (lang, r.doc_id)
            start += r.n_chars


def test_materialization_run_end_to_end(spark, tmp_path):
    """The full curation-to-trainer path: run the composed pipeline, keep
    only disposition='keep' docs, export them as JSONL shards keyed by
    their train/val/test split, and verify the shards reproduce the
    pipeline's split counts exactly — nothing dropped, nothing leaked
    from the benchmark/contaminated/duplicate/quality rejects."""
    from mcp_local_rag_spark.queries.curation import q_corpus_curation_pipeline

    pipe = q_corpus_curation_pipeline(spark, SF).cache()
    keep = pipe.filter(F.col("disposition") == "keep").select("doc_id", "split")
    docs = load(spark, SF, "documents").join(keep, "doc_id")
    out = str(tmp_path / "train_shards")
    export_jsonl_shards(
        docs.select("doc_id", "text", "split"), out,
        shard_col="split", max_records_per_file=200,
    )
    back = spark.read.json(out)
    got = {
        (r.split, r.n): None
        for r in back.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    expected = {
        (r.split, r.n): None
        for r in pipe.filter(F.col("disposition") == "keep")
        .groupBy("split")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == expected
    # rejects never reach the shards
    rejects = {
        r.doc_id
        for r in pipe.filter(F.col("disposition") != "keep").collect()
    }
    exported = {r.doc_id for r in back.select("doc_id").collect()}
    assert not (rejects & exported)
    pipe.unpersist()


def test_export_manifest_roundtrip_and_drift_detection(spark, tmp_path):
    """write_export_manifest stamps per-shard counts + order-insensitive
    content checksums + file census; verify reproduces [] on an intact
    export and names the shard when a data file disappears."""
    import glob
    import os

    from mcp_local_rag_spark.plans.export import (
        export_packed_parquet,
        verify_export_manifest,
        write_export_manifest,
    )
    from mcp_local_rag_spark.session import load

    docs = load(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text", "lang", "n_chars"
    )
    path = str(tmp_path / "shards")
    export_packed_parquet(docs, path)
    manifest = write_export_manifest(spark, path, fmt="parquet")
    assert manifest["total_records"] == docs.count()
    assert manifest["shards"] and all(
        s["records"] > 0 and s["n_files"] >= 1 for s in manifest["shards"].values()
    )
    assert verify_export_manifest(spark, path) == []
    # tamper: drop one shard's data file -> verify names that shard
    victim_dir = sorted(glob.glob(os.path.join(path, "lang=*")))[0]
    victim_key = os.path.basename(victim_dir).split("=", 1)[1]
    os.remove(glob.glob(os.path.join(victim_dir, "*.parquet"))[0])
    spark.catalog.refreshByPath(path)
    problems = verify_export_manifest(spark, path)
    assert problems and any(victim_key in p for p in problems)


def test_webdataset_export_roundtrip_and_verify(spark, tmp_path):
    """Tar-shard export: deterministic shards, sha256 manifest, atomic
    writes, verify catches tampering and extra shards."""
    import json
    import os

    from mcp_local_rag_spark.plans.export import (
        WDS_MANIFEST_FILE,
        export_webdataset_shards,
        verify_webdataset_export,
    )
    from mcp_local_rag_spark.sources.webdataset import read_webdataset

    rows = []
    for i in range(7):
        lang = "en" if i % 2 == 0 else "de"
        rows.append((lang, f"{i:04d}", "txt", bytearray(f"text {i}".encode())))
        rows.append((lang, f"{i:04d}", "json", bytearray(b'{"k": 1}')))
    members = spark.createDataFrame(
        rows, "lang string, sample_key string, slot string, content binary"
    )
    out = str(tmp_path / "wds")
    manifest = export_webdataset_shards(
        members, out, shard_col="lang", samples_per_shard=2
    )
    # 4 en samples -> 2 shards, 3 de samples -> 2 shards
    assert manifest["total_samples"] == 7 and manifest["total_members"] == 14
    assert len(manifest["shards"]) == 4
    assert verify_webdataset_export(spark, out) == []

    # deterministic re-export: same bytes, same checksums
    manifest2 = export_webdataset_shards(
        members, out, shard_col="lang", samples_per_shard=2
    )
    assert {k: v["sha256"] for k, v in manifest["shards"].items()} == {
        k: v["sha256"] for k, v in manifest2["shards"].items()
    }

    # loader-side read: samples come back whole with adjacent members
    back = read_webdataset(
        spark, [os.path.join(out, n) for n in manifest["shards"]]
    )
    assert back.count() == 14
    assert back.select("sample_key").distinct().count() == 7

    # tamper -> verify reports; extra shard -> reported
    victim = sorted(manifest["shards"])[0]
    with open(os.path.join(out, victim), "r+b") as f:
        f.seek(600)
        f.write(b"X")
    problems = verify_webdataset_export(spark, out)
    assert any("checksum drifted" in p for p in problems)
    with open(os.path.join(out, WDS_MANIFEST_FILE)) as f:
        json.load(f)  # manifest itself stays valid JSON
    os.rename(
        os.path.join(out, victim), os.path.join(out, "rogue-000000.tar")
    )
    problems = verify_webdataset_export(spark, out)
    assert any("unexpected shard" in p for p in problems)
    assert any("missing shard" in p for p in problems)


def test_webdataset_export_null_and_unsafe_keys(spark, tmp_path):
    """NULL shard keys and samples still export (null-safe assignment —
    a plain column-list join would silently drop them), and path-unsafe
    shard values sanitize into out_dir with a collision-proof suffix."""
    import os

    from mcp_local_rag_spark.plans.export import (
        export_webdataset_shards,
        verify_webdataset_export,
    )

    rows = [
        (None, "a1", "txt", bytearray(b"null-lang sample")),
        ("en/US", "b1", "txt", bytearray(b"slash in key")),
        ("../evil", "c1", "txt", bytearray(b"traversal attempt")),
        ("en", "d1", "txt", bytearray(b"plain")),
    ]
    members = spark.createDataFrame(
        rows, "lang string, sample_key string, slot string, content binary"
    )
    out = str(tmp_path / "wds_nulls")
    manifest = export_webdataset_shards(
        members, out, shard_col="lang", samples_per_shard=10
    )
    assert manifest["total_samples"] == 4 and manifest["total_members"] == 4
    # every shard landed INSIDE out_dir, nothing escaped or crashed
    names = sorted(manifest["shards"])
    assert all(os.path.exists(os.path.join(out, n)) for n in names)
    assert not os.path.exists(str(tmp_path / "evil-000000.tar"))
    assert any(n.startswith("null-") for n in names)
    assert verify_webdataset_export(spark, out) == []


def test_curate_export_reingest_loop(spark, tmp_path):
    """The last mile end-to-end: a curated keep-set exports to
    WebDataset shards (manifest-verified), and a loader-side read-back
    reconstructs exactly the kept documents — the full
    curate -> export -> train-side-ingest loop."""
    import json
    import os

    from mcp_local_rag_spark.plans.export import (
        export_webdataset_shards,
        verify_webdataset_export,
    )
    from mcp_local_rag_spark.session import load
    from mcp_local_rag_spark.sources.webdataset import (
        assemble_samples,
        read_webdataset,
    )
    from pyspark.sql import functions as F

    docs = (
        load(spark, "/root/testdata/sf0.001", "documents")
        .filter(F.col("n_chars") >= 400)  # stand-in curation keep rule
        .select("doc_id", "lang", "text")
    )
    kept = {(r.doc_id, r.lang, r.text) for r in docs.collect()}
    assert kept  # rule keeps something at sf0.001

    members = docs.select(
        "lang",
        F.format_string("%08d", F.col("doc_id")).alias("sample_key"),
        F.lit("txt").alias("slot"),
        F.encode("text", "utf-8").alias("content"),
    ).union(
        docs.select(
            "lang",
            F.format_string("%08d", F.col("doc_id")).alias("sample_key"),
            F.lit("json").alias("slot"),
            F.encode(
                F.format_string('{"id": %d}', F.col("doc_id")), "utf-8"
            ).alias("content"),
        )
    )
    out = str(tmp_path / "export")
    manifest = export_webdataset_shards(
        members, out, shard_col="lang", samples_per_shard=64
    )
    assert manifest["total_samples"] == len(kept)
    assert verify_webdataset_export(spark, out) == []

    back = read_webdataset(
        spark, [os.path.join(out, n) for n in manifest["shards"]]
    )
    got = {
        (
            int(json.loads(bytes(r["slots"]["json"]).decode())["id"]),
            bytes(r["slots"]["txt"]).decode("utf-8"),
        )
        for r in assemble_samples(back).collect()
    }
    assert got == {(d, t) for d, _lang, t in kept}
