"""Multi-record structured sources: JSONL and CSV.

The reference's parser registry is strictly one-file-one-document
(src/parser/index.ts dispatch); training corpora, however, arrive as
record containers — a .jsonl of {"id","title","text"} objects or a .csv
with a text column — so this module extends S6 with a flatMap-shaped
parser: one input file row expands to N document rows. Everything is
stdlib (json / csv) inside an Arrow ``mapInPandas`` batch; the Spark
plan is a pure map stage, no shuffle, parallel across files.

Record identity: each record keeps its 0-based position in the file
(``record_index``) plus the container path, so ``<path>#r<index>`` is a
stable per-record path for the chunks table; an explicit ``id`` field
(JSONL key / CSV column) rides along when present.
"""

from __future__ import annotations

import csv
import io
import json
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

# keys tried in order for the text / title payload of one record
TEXT_KEYS = ("text", "content", "body")
TITLE_KEYS = ("title", "heading", "name")


def _first_key(obj: dict, keys: tuple[str, ...]) -> str | None:
    for k in keys:
        v = obj.get(k)
        if isinstance(v, str) and v:
            return v
    return None


def _record(obj: dict, idx: int, path: str) -> dict:
    text = _first_key(obj, TEXT_KEYS)
    if text is None:
        raise ValueError(f"record {idx} has no text field (tried {TEXT_KEYS})")
    title = _first_key(obj, TITLE_KEYS)
    if title is None:
        # txt-style fallback: first line of the record's own text
        title = text.split("\n", 1)[0][:100].strip() or f"{path}#r{idx}"
    rid = obj.get("id")
    return {
        "record_index": idx,
        "id": None if rid is None else str(rid),
        "title": title,
        "text": text,
    }


def parse_jsonl_bytes(path: str, content: bytes) -> list[dict]:
    """One JSON object per non-blank line -> list of records. A bad line
    raises (the caller records the error for the whole file — a container
    with undecodable records is a coverage fact, not a partial parse)."""
    records = []
    idx = 0
    for lineno, line in enumerate(content.decode("utf-8-sig").splitlines(), 1):
        if not line.strip():
            continue
        try:
            obj = json.loads(line)
        except json.JSONDecodeError as e:
            raise ValueError(f"line {lineno}: invalid JSON ({e.msg})") from e
        if not isinstance(obj, dict):
            raise ValueError(f"line {lineno}: not a JSON object")
        records.append(_record(obj, idx, path))
        idx += 1
    return records


def parse_csv_bytes(path: str, content: bytes) -> list[dict]:
    """Header CSV -> list of records via csv.DictReader (handles quoting,
    embedded newlines/commas). Text column resolution follows TEXT_KEYS."""
    reader = csv.DictReader(io.StringIO(content.decode("utf-8-sig")))
    if reader.fieldnames is None:
        raise ValueError("empty CSV (no header row)")
    records = []
    for idx, row in enumerate(reader):
        records.append(_record(row, idx, path))
    return records


def parse_xml_bytes(path: str, content: bytes) -> list[dict]:
    """``<root><record id="..."><title>..</title><text>..</text></record>...``
    -> list of records: every direct child of the root element is one
    record; its attributes and child-element texts form the field dict
    (child elements win on tag/attribute clashes). Field resolution then
    follows the same TEXT_KEYS/TITLE_KEYS chains as JSONL/CSV. Parse
    errors raise for the whole container (coverage fact, not a partial
    parse). stdlib ElementTree — local trusted files, same posture as the
    other stdlib parsers."""
    import xml.etree.ElementTree as ET

    try:
        # utf-8-sig: a Windows-exported container's BOM would otherwise
        # reject the entire (possibly million-record) file as one
        # parse_error; lossless on BOM-less input (same for JSONL/CSV)
        root = ET.fromstring(content.decode("utf-8-sig"))
    except ET.ParseError as e:
        raise ValueError(f"invalid XML: {e}") from e
    records = []
    for idx, el in enumerate(root):
        obj = dict(el.attrib)
        for child in el:
            # itertext, not .text: '<text>Hello <b>world</b>!</text>' has
            # .text == 'Hello ' — nested markup and tails would silently
            # truncate the ingested document
            joined = "".join(child.itertext())
            if joined:
                obj[child.tag] = joined
        records.append(_record(obj, idx, path))
    return records


# transparent compression envelopes: training corpora overwhelmingly ship
# as .jsonl.gz / .jsonl.zst etc.; gzip/bz2/xz are stdlib, so those three
# unwrap natively (zstd would need an import-gated backend). The INNER
# extension drives format dispatch, and the inner path is what parsers
# receive so titles/record paths stay spelling-stable.
COMPRESSION_EXTS = ("gz", "bz2", "xz")

# short tar spellings: one extension meaning <stem>.tar + envelope
SHORT_TAR_EXTS = {"tgz": "gz", "tbz2": "bz2", "txz": "xz"}


def _inflate_bounded(new_decomp, content: bytes, limit: int, codec: str) -> bytes:
    """Streaming decompress with a hard output cap: the scanner's
    MAX_FILE_SIZE guard sees only the COMPRESSED size, so without this a
    kilobyte-sized bomb (200 MB of zeros gzips to ~200 KB) would expand
    unbounded inside an executor's Python worker. Concatenated members
    and null stream padding unwrap; trailing garbage after a complete
    stream follows the per-codec stdlib one-shot policy (verified
    empirically): bz2/xz IGNORE it (return the decoded streams), gzip
    raises. Truncation mid-stream always raises — never a silent
    prefix."""
    out = bytearray()
    d = new_decomp()
    data = content
    members_done = 0
    while True:
        try:
            chunk = d.decompress(data, limit + 1 - len(out))
        except Exception as exc:  # codec-specific error types
            if members_done and codec != "gz":
                return bytes(out)  # bz2/xz: trailing junk, stdlib policy
            raise ValueError(f"corrupt {codec} envelope: {exc}") from exc
        out += chunk
        if len(out) > limit:
            raise ValueError(
                f"{codec} envelope expands past {limit} bytes: {len(content)}"
                " compressed"
            )
        if getattr(d, "eof", False):
            members_done += 1
            rest = d.unused_data.lstrip(b"\x00")
            if not rest:
                return bytes(out)
            d = new_decomp()  # next concatenated member
            data = rest
            continue
        tail = getattr(d, "unconsumed_tail", None)
        if tail is not None:  # zlib object: leftover input rides here
            if not tail:
                raise ValueError(f"truncated {codec} stream")
            data = tail
            continue
        if d.needs_input:  # bz2/lzma: input exhausted mid-stream
            raise ValueError(f"truncated {codec} stream")
        data = b""  # buffered output pending past the cap check


def maybe_decompress(
    path: str, content: bytes, *, max_bytes: int | None = None
) -> tuple[str, bytes]:
    """Strip one compression envelope by extension, or pass through.
    ``('/x/a.jsonl.gz', <gzip bytes>) -> ('/x/a.jsonl', <plain bytes>)``.
    Decompressed output is capped at ``max_bytes`` (default: the
    scanner's MAX_FILE_SIZE, which only bounds the compressed size).
    Short tar spellings unwrap too: ``a.tgz`` -> ``a.tar`` (likewise
    .tbz2/.txz)."""
    ext = path.rsplit(".", 1)[-1].lower() if "." in path else ""
    if ext in SHORT_TAR_EXTS:
        inner = path[: -(len(ext) + 1)] + ".tar"
        ext = SHORT_TAR_EXTS[ext]
    elif ext in COMPRESSION_EXTS:
        inner = path[: -(len(ext) + 1)]
    else:
        return path, content
    if max_bytes is None:
        from .scan import MAX_FILE_SIZE  # lazy: scan imports this module

        max_bytes = MAX_FILE_SIZE
    if ext == "gz":
        import zlib

        new_decomp = lambda: zlib.decompressobj(wbits=31)  # noqa: E731
    elif ext == "bz2":
        import bz2

        new_decomp = bz2.BZ2Decompressor
    else:
        import lzma

        new_decomp = lzma.LZMADecompressor
    return inner, _inflate_bounded(new_decomp, content, max_bytes, ext)


def parse_arrow_bytes(path: str, content: bytes) -> list[dict]:
    """Arrow IPC file (.arrow / .feather v2) -> list of records — the
    zero-copy interchange format ML tooling actually hands around.
    pyarrow is a first-class dependency of this engine (Spark's own
    Arrow batch transport), so this parser is real, not a seam. Field
    resolution follows the same TEXT_KEYS/TITLE_KEYS chains as
    JSONL/CSV; non-string cells stringify (ids arrive as int64 as often
    as utf8). A malformed file raises for the whole container (coverage
    fact, not a partial parse)."""
    import pyarrow as pa

    try:
        if path.rsplit(".", 1)[-1].lower() == "feather":
            from pyarrow import feather

            table = feather.read_table(pa.BufferReader(content))  # v1 + v2
        else:
            with pa.ipc.open_file(pa.BufferReader(content)) as reader:
                table = reader.read_all()
    except pa.ArrowInvalid as exc:
        raise ValueError(f"invalid Arrow IPC file: {exc}") from exc
    records = []
    for idx, row in enumerate(table.to_pylist()):
        obj = {
            k: (v if isinstance(v, str) or v is None else str(v))
            for k, v in row.items()
        }
        records.append(_record(obj, idx, path))
    return records


def parse_parquet_bytes(path: str, content: bytes) -> list[dict]:
    """Parquet file -> list of records through the same key chains.
    NOTE: this is the RECORD-CONTAINER path for one parquet file handed
    around as bytes (a member of a tar shard, an upload); corpus-scale
    parquet is read by Spark's native source (`session.load`), never
    through here."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    try:
        table = pq.read_table(pa.BufferReader(content))
    except (pa.ArrowInvalid, OSError) as exc:
        raise ValueError(f"invalid parquet file: {exc}") from exc
    records = []
    for idx, row in enumerate(table.to_pylist()):
        obj = {
            k: (v if isinstance(v, str) or v is None else str(v))
            for k, v in row.items()
        }
        records.append(_record(obj, idx, path))
    return records


def parse_structured_bytes(path: str, content: bytes) -> list[dict]:
    path, content = maybe_decompress(path, content)
    ext = path.rsplit(".", 1)[-1].lower() if "." in path else ""
    if ext == "jsonl":
        return parse_jsonl_bytes(path, content)
    if ext == "csv":
        return parse_csv_bytes(path, content)
    if ext == "xml":
        return parse_xml_bytes(path, content)
    if ext in ("arrow", "feather"):
        return parse_arrow_bytes(path, content)
    if ext == "parquet":
        return parse_parquet_bytes(path, content)
    raise ValueError(f"unsupported structured extension: {path}")


RECORDS_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("record_index", LongType()),
        StructField("record_id", StringType()),
        StructField("title", StringType()),
        StructField("text", StringType()),
        StructField("parse_error", StringType()),
    ]
)


def parse_structured_files(files: DataFrame) -> DataFrame:
    """(path, content) -> one row per record (flatMap expansion).

    A file that fails to parse yields ONE row with parse_error set and
    null record fields — same coverage-not-crash contract as
    parsers.parse_files. Downstream chunking uses
    ``path || '#r' || record_index`` as the per-record file path.
    """
    import pandas as pd

    def _parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    for rec in parse_structured_bytes(path, bytes(content)):
                        rows.append(
                            (
                                path,
                                rec["record_index"],
                                rec["id"],
                                rec["title"],
                                rec["text"],
                                None,
                            )
                        )
                except Exception as e:  # noqa: BLE001 — coverage fact
                    rows.append((path, None, None, None, None, f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(
                rows,
                columns=[
                    "path",
                    "record_index",
                    "record_id",
                    "title",
                    "text",
                    "parse_error",
                ],
            )

    return files.select("path", "content").mapInPandas(_parse, RECORDS_SCHEMA)
