"""Structured multi-record sources (.jsonl / .csv): parser unit behavior,
the flatMap Spark expansion, and the engine's container-level replace
semantics (extension beyond the reference's one-file-one-document parser
registry, src/parser/index.ts)."""

import json

import pytest

from mcp_local_rag_spark.engine import RagEngine
from mcp_local_rag_spark.sources.structured import (
    parse_csv_bytes,
    parse_jsonl_bytes,
    parse_structured_files,
)

LONG_A = (
    "The alpha record explains shuffle partitioning strategies in enough"
    " prose to clear the minimum chunk length bar easily."
)
LONG_B = (
    "The beta record concerns broadcast joins plus adaptive execution and"
    " also comfortably exceeds fifty characters."
)
LONG_C = (
    "The gamma record describes watermarked streaming aggregation windows"
    " with a comfortable amount of descriptive prose."
)


def test_jsonl_parse_fields_and_fallbacks():
    lines = [
        json.dumps({"id": 7, "title": "Alpha", "text": LONG_A}),
        "",  # blank lines skipped, indices stay dense
        json.dumps({"content": LONG_B}),  # text fallback key, no id/title
    ]
    recs = parse_jsonl_bytes("/x/a.jsonl", "\n".join(lines).encode())
    assert [r["record_index"] for r in recs] == [0, 1]
    assert recs[0]["id"] == "7" and recs[0]["title"] == "Alpha"
    assert recs[1]["id"] is None
    # title fallback = first line of the record's own text
    assert recs[1]["title"] == LONG_B.split("\n", 1)[0][:100].strip()


def test_jsonl_bad_line_raises_with_line_number():
    with pytest.raises(ValueError, match="line 2"):
        parse_jsonl_bytes("/x/a.jsonl", b'{"text": "ok"}\nnot json')


def test_csv_parse_quoting_and_text_column():
    csv_bytes = (
        'id,note,text\n1,plain,"has, comma and ""quote"""\n2,x,' + LONG_B + "\n"
    ).encode()
    recs = parse_csv_bytes("/x/a.csv", csv_bytes)
    assert recs[0]["text"] == 'has, comma and "quote"'
    assert recs[1]["text"] == LONG_B
    assert [r["id"] for r in recs] == ["1", "2"]


def test_structured_files_flatmap_and_error_row(spark):
    good = "\n".join(
        json.dumps({"id": i, "title": f"T{i}", "text": t})
        for i, t in enumerate([LONG_A, LONG_B])
    ).encode()
    bad = b"\x00\xff not a container"
    df = spark.createDataFrame(
        [("/d/good.jsonl", bytearray(good)), ("/d/bad.jsonl", bytearray(bad))],
        "path string, content binary",
    )
    rows = parse_structured_files(df).collect()
    by_path = {}
    for r in rows:
        by_path.setdefault(r.path, []).append(r)
    assert len(by_path["/d/good.jsonl"]) == 2
    assert {r.record_index for r in by_path["/d/good.jsonl"]} == {0, 1}
    errs = by_path["/d/bad.jsonl"]
    assert len(errs) == 1 and errs[0].parse_error and errs[0].text is None


def test_engine_ingest_records_replace_semantics(spark, tmp_path):
    f = tmp_path / "corpus.jsonl"
    f.write_text(
        "\n".join(
            json.dumps({"id": i, "title": f"Rec {i}", "text": t})
            for i, t in enumerate([LONG_A, LONG_B, LONG_C])
        )
    )
    eng = RagEngine(spark, str(tmp_path / "chunks"))
    out = eng.ingest_records_file(str(f))
    assert out["recordCount"] == 3 and out["chunkCount"] >= 3

    paths = {r.filePath for r in eng.chunks().select("filePath").collect()}
    assert paths == {f"{f}#r0", f"{f}#r1", f"{f}#r2"}

    # shrink the container: record 2 disappears, record 0's text changes —
    # re-ingest must replace everything, leaving no orphan #r2 rows
    f.write_text(
        "\n".join(
            json.dumps({"id": i, "title": f"Rec {i}", "text": t})
            for i, t in enumerate([LONG_B, LONG_C])
        )
    )
    out2 = eng.ingest_records_file(str(f))
    assert out2["recordCount"] == 2
    paths2 = {r.filePath for r in eng.chunks().select("filePath").collect()}
    assert paths2 == {f"{f}#r0", f"{f}#r1"}
    texts = {
        r.filePath: r.text
        for r in eng.chunks().select("filePath", "text").collect()
    }
    assert "beta" in texts[f"{f}#r0"]


def test_engine_ingest_records_zero_chunk_guard(spark, tmp_path):
    f = tmp_path / "c.jsonl"
    f.write_text(json.dumps({"id": 0, "title": "T", "text": LONG_A}))
    eng = RagEngine(spark, str(tmp_path / "chunks"))
    eng.ingest_records_file(str(f))
    before = eng.chunks().count()

    f.write_text("not json at all")
    with pytest.raises(ValueError, match="parse failed"):
        eng.ingest_records_file(str(f))
    # stored rows survived the failed re-ingest
    assert eng.chunks().count() == before


def test_xml_parse_fields_attributes_and_fallbacks():
    from mcp_local_rag_spark.sources.structured import parse_xml_bytes

    xml = (
        "<docs>"
        f'<record id="7"><title>Alpha</title><text>{LONG_A}</text></record>'
        f"<record><content>{LONG_B}</content></record>"  # no id/title; content key
        "</docs>"
    )
    recs = parse_xml_bytes("/x/a.xml", xml.encode())
    assert [r["record_index"] for r in recs] == [0, 1]
    assert recs[0]["id"] == "7" and recs[0]["title"] == "Alpha"
    assert recs[1]["id"] is None
    assert recs[1]["title"] == LONG_B.split("\n", 1)[0][:100].strip()


def test_xml_child_elements_win_over_attributes():
    from mcp_local_rag_spark.sources.structured import parse_xml_bytes

    xml = f'<d><r title="attr title"><title>elem title</title><text>{LONG_A}</text></r></d>'
    recs = parse_xml_bytes("/x/a.xml", xml.encode())
    assert recs[0]["title"] == "elem title"


def test_xml_entity_escaping_roundtrips_text():
    from xml.sax.saxutils import escape

    from mcp_local_rag_spark.sources.structured import parse_xml_bytes

    tricky = "a < b && \"c\" > 'd' — " + LONG_A
    xml = f"<d><r><text>{escape(tricky)}</text></r></d>"
    assert parse_xml_bytes("/x/a.xml", xml.encode())[0]["text"] == tricky


def test_xml_bad_document_raises():
    import pytest as _pytest

    from mcp_local_rag_spark.sources.structured import parse_xml_bytes

    with _pytest.raises(ValueError, match="invalid XML"):
        parse_xml_bytes("/x/a.xml", b"<docs><r>unclosed</docs>")
    with _pytest.raises(ValueError, match="no text field"):
        parse_xml_bytes("/x/a.xml", b"<docs><r><title>t</title></r></docs>")


def test_engine_ingests_xml_container(spark, tmp_path):
    eng = RagEngine(spark, str(tmp_path / "db"))
    p = tmp_path / "recs.xml"
    p.write_text(
        "<docs>"
        f'<record id="1"><title>Alpha</title><text>{LONG_A}</text></record>'
        f'<record id="2"><title>Beta</title><text>{LONG_B}</text></record>'
        "</docs>"
    )
    out = eng.ingest_records_file(str(p))
    assert out["recordCount"] == 2 and out["chunkCount"] >= 2
    paths = {
        r.filePath
        for r in eng.chunks().select("filePath").distinct().collect()
    }
    assert {f"{p}#r0", f"{p}#r1"} <= paths


def test_xml_nested_markup_keeps_full_text():
    from mcp_local_rag_spark.sources.structured import parse_xml_bytes

    xml = f"<d><r><text>Hello <b>world</b>! {LONG_A}</text></r></d>"
    recs = parse_xml_bytes("/x/a.xml", xml.encode())
    assert recs[0]["text"] == f"Hello world! {LONG_A}"


def test_bom_containers_parse_cleanly():
    """Windows-exported containers open with a UTF-8 BOM; it must not
    reject the file (or corrupt the first record's first field)."""
    import json

    from mcp_local_rag_spark.sources.structured import (
        parse_csv_bytes,
        parse_jsonl_bytes,
        parse_xml_bytes,
    )

    bom = b"\xef\xbb\xbf"
    jl = parse_jsonl_bytes("/x/a.jsonl", bom + json.dumps({"text": LONG_A}).encode())
    assert jl[0]["text"] == LONG_A
    csvb = bom + f'id,text\n1,"{LONG_B}"\n'.encode()
    assert parse_csv_bytes("/x/a.csv", csvb)[0]["id"] == "1"
    xmlb = bom + f"<d><r><text>{LONG_C}</text></r></d>".encode()
    assert parse_xml_bytes("/x/a.xml", xmlb)[0]["text"] == LONG_C


def test_compression_envelopes_unwrap_transparently():
    """One compression envelope (.gz/.bz2/.xz) strips by extension; the
    INNER path drives dispatch on both the records path and the
    one-file-one-doc path, so titles and record identities match the
    uncompressed spelling exactly. Unknown inner formats still raise
    the inner path's error, and corrupt envelopes surface the codec's."""
    import bz2
    import gzip
    import lzma

    import pytest as _pytest

    from mcp_local_rag_spark.sources.parsers import parse_text_bytes
    from mcp_local_rag_spark.sources.structured import (
        maybe_decompress,
        parse_structured_bytes,
    )

    jl = b'{"id": 7, "title": "T7", "text": "alpha beta"}\n{"text": "second"}'
    for codec, comp in (("gz", gzip.compress), ("bz2", bz2.compress),
                        ("xz", lzma.compress)):
        path = f"/d/corpus.jsonl.{codec}"
        recs = parse_structured_bytes(path, comp(jl))
        assert [r["record_index"] for r in recs] == [0, 1]
        assert recs[0]["id"] == "7" and recs[0]["title"] == "T7"

    # passthrough for unwrapped input
    assert maybe_decompress("/d/a.jsonl", jl) == ("/d/a.jsonl", jl)

    # one-file-one-doc path: a.md.gz gets the md title chain
    md = b"# Gz Title\n\nBody."
    out = parse_text_bytes("/d/a.md.gz", gzip.compress(md))
    assert out["title"] == "Gz Title"

    # inner dispatch error names the INNER path's extension
    with _pytest.raises(ValueError, match="unsupported"):
        parse_structured_bytes("/d/a.tsv.gz", gzip.compress(b"x"))

    # corrupt envelope surfaces the codec error (coverage rows catch it)
    with _pytest.raises(Exception):
        parse_structured_bytes("/d/a.jsonl.gz", b"not gzip at all")


def test_decompress_output_cap_and_multimember():
    """The envelope unwrap is output-bounded: MAX_FILE_SIZE only sees the
    COMPRESSED size at scan time, so a kilobyte gzip bomb must be refused
    at the decode seam, not expanded inside an executor. Concatenated
    members (multi-stream gz — the bgzf-style shape — plus null stream
    padding) unwrap like the stdlib one-shot helpers; truncated streams
    raise instead of silently yielding a prefix."""
    import bz2
    import gzip
    import lzma

    import pytest as _pytest

    from mcp_local_rag_spark.sources.structured import maybe_decompress

    bomb = gzip.compress(b"\x00" * 100_000)  # ~100 KB -> tiny envelope
    assert len(bomb) < 2_000
    with _pytest.raises(ValueError, match="expands past"):
        maybe_decompress("/d/a.txt.gz", bomb, max_bytes=10_000)
    # at-limit passes, one byte under fails
    ok = gzip.compress(b"x" * 64)
    assert maybe_decompress("/d/a.txt.gz", ok, max_bytes=64)[1] == b"x" * 64
    with _pytest.raises(ValueError, match="expands past"):
        maybe_decompress("/d/a.txt.gz", ok, max_bytes=63)

    # concatenated members + trailing null padding (all three codecs)
    for ext, comp in (("gz", gzip.compress), ("bz2", bz2.compress),
                      ("xz", lzma.compress)):
        two = comp(b"alpha ") + comp(b"beta") + b"\x00" * 4
        path, out = maybe_decompress(f"/d/a.txt.{ext}", two, max_bytes=1024)
        assert (path, out) == ("/d/a.txt", b"alpha beta")

    # truncated stream surfaces, never a silent prefix
    whole = gzip.compress(b"y" * 500)
    with _pytest.raises(ValueError, match="gz"):
        maybe_decompress("/d/a.txt.gz", whole[: len(whole) // 2],
                         max_bytes=10_000)
    wx = lzma.compress(b"y" * 500)
    with _pytest.raises(ValueError, match="xz"):
        maybe_decompress("/d/a.txt.xz", wx[: len(wx) // 2], max_bytes=10_000)


def test_trailing_garbage_matches_stdlib_policy():
    """Per-codec stdlib one-shot policy, pinned empirically: bz2/xz
    IGNORE trailing garbage after a complete stream (return the decoded
    data), gzip raises; .tgz-family short spellings unwrap to .tar."""
    import bz2
    import gzip
    import lzma

    import pytest as _pytest

    from mcp_local_rag_spark.sources.structured import maybe_decompress

    for ext, comp in (("bz2", bz2.compress), ("xz", lzma.compress)):
        blob = comp(b"hello") + b"GARBAGE-TAIL"
        path, out = maybe_decompress(f"/d/a.md.{ext}", blob, max_bytes=1024)
        assert (path, out) == ("/d/a.md", b"hello")
    with _pytest.raises(ValueError, match="corrupt gz"):
        maybe_decompress(
            "/d/a.md.gz", gzip.compress(b"hello") + b"GARBAGE", max_bytes=1024
        )

    # short tar spellings: a.tgz -> a.tar with the gz codec
    for short, comp in (("tgz", gzip.compress), ("tbz2", bz2.compress),
                        ("txz", lzma.compress)):
        path, out = maybe_decompress(
            f"/d/shard.{short}", comp(b"tarbytes"), max_bytes=1024
        )
        assert (path, out) == ("/d/shard.tar", b"tarbytes")


def test_parse_arrow_bytes_containers():
    """Arrow IPC / feather record containers: int64 ids stringify, the
    TEXT/TITLE key chains apply, envelopes compose, corrupt files raise
    for the whole container."""
    import gzip

    import pyarrow as pa
    import pytest as _pytest
    from pyarrow import feather

    from mcp_local_rag_spark.sources.structured import (
        parse_arrow_bytes,
        parse_structured_bytes,
    )

    table = pa.table(
        {
            "id": pa.array([7, 8], pa.int64()),
            "title": ["T7", None],
            "text": ["alpha beta", "second text"],
        }
    )
    buf = pa.BufferOutputStream()
    with pa.ipc.new_file(buf, table.schema) as w:
        w.write_table(table)
    blob = buf.getvalue().to_pybytes()

    recs = parse_arrow_bytes("/d/a.arrow", blob)
    assert [r["record_index"] for r in recs] == [0, 1]
    assert recs[0]["id"] == "7" and recs[0]["title"] == "T7"
    assert recs[1]["title"] == "second text"  # first-line fallback
    # dispatch + gzip envelope
    assert parse_structured_bytes("/d/a.arrow.gz", gzip.compress(blob)) == recs

    # feather spelling (v2 = IPC; also exercises the feather reader)
    fbuf = pa.BufferOutputStream()
    feather.write_feather(table, fbuf)
    frecs = parse_structured_bytes("/d/a.feather", fbuf.getvalue().to_pybytes())
    assert [(r["id"], r["title"]) for r in frecs] == [
        (r["id"], r["title"]) for r in recs
    ]

    with _pytest.raises(ValueError, match="invalid Arrow"):
        parse_arrow_bytes("/d/bad.arrow", b"not arrow bytes at all")

    # a table with no text-like column is a container-level error
    no_text = pa.table({"id": pa.array([1], pa.int64())})
    b2 = pa.BufferOutputStream()
    with pa.ipc.new_file(b2, no_text.schema) as w:
        w.write_table(no_text)
    with _pytest.raises(ValueError, match="no text field"):
        parse_arrow_bytes("/d/c.arrow", b2.getvalue().to_pybytes())


def test_parse_parquet_bytes_container():
    """Parquet as a byte-level record container (tar member / upload):
    same key chains, int ids stringify, dispatch + envelope compose,
    corrupt bytes raise for the container. The engine ingests it
    end-to-end at <file>#rN identity like every other container."""
    import gzip

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from mcp_local_rag_spark.sources.structured import (
        parse_parquet_bytes,
        parse_structured_bytes,
    )

    t = pa.table(
        {"id": pa.array([3], pa.int64()), "title": ["P3"],
         "text": ["parquet body text"]}
    )
    buf = pa.BufferOutputStream()
    pq.write_table(t, buf)
    blob = buf.getvalue().to_pybytes()
    recs = parse_parquet_bytes("/d/a.parquet", blob)
    assert recs == [
        {"record_index": 0, "id": "3", "title": "P3",
         "text": "parquet body text"}
    ]
    assert parse_structured_bytes("/d/a.parquet.gz", gzip.compress(blob)) == recs
    with _pytest.raises(ValueError, match="invalid parquet"):
        parse_parquet_bytes("/d/bad.parquet", b"PAR1 nope")
