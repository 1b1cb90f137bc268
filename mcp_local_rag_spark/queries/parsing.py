"""Parser round-trip queries with SQL oracles.

Each query BUILDS a real container format (a .docx zip / an HTML page)
from rows of the ``documents`` table inside an Arrow ``mapInPandas``
batch, runs the actual stdlib parser over the bytes, and emits fields a
SQL oracle can independently derive from the construction template:
title chain, parsed-text length, atomic-range offsets, noise-stripping
effects. A parser bug (missed table row, broken title chain, unstripped
<nav>, wrong whitespace normalization) shifts the lengths/offsets and
fails the hash compare — this is the CORRECTNESS gate for S6/T7/T14
(reference src/parser/docx-parser.ts, html-parser.ts,
title-extractor.ts).

Whitespace collapse is ASCII-only in the template (synthetic testdata is
ASCII), matching both Python ``\\s`` and RE2 ``\\s`` over it.
"""

from __future__ import annotations

import io
import zipfile
from html import escape as html_escape
from xml.sax.saxutils import escape as xml_escape

import pandas as pd
from pyspark.sql import functions as F

from ..session import load, spread
from .common import register

_OUT_SCHEMA = (
    "doc_id long, title string, text_len long, n_atomic long,"
    " atomic_start long, atomic_end long"
)

_W = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'


def _docx_bytes(doc_id: int, text: str, n_chars: int) -> bytes:
    def p(t: str) -> str:
        return f"<w:p><w:r><w:t>{xml_escape(t)}</w:t></w:r></w:p>"

    def tc(t: str) -> str:
        return f"<w:tc>{p(t)}</w:tc>"

    table = (
        "<w:tbl>"
        f"<w:tr>{tc('id')}{tc('chars')}</w:tr>"
        f"<w:tr>{tc(str(doc_id))}{tc(str(n_chars))}</w:tr>"
        "</w:tbl>"
    )
    doc = (
        f'<?xml version="1.0"?><w:document {_W}><w:body>'
        f"{p(text)}{table}</w:body></w:document>"
    )
    core = (
        '<?xml version="1.0"?>'
        '<cp:coreProperties xmlns:cp="http://schemas.openxmlformats.org/'
        'package/2006/metadata/core-properties" '
        'xmlns:dc="http://purl.org/dc/elements/1.1/">'
        f"<dc:title>Doc {doc_id}</dc:title></cp:coreProperties>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", doc)
        zf.writestr("docProps/core.xml", core)
    return buf.getvalue()


@register(
    "parsed_docx_roundtrip",
    r"""WITH base AS (
  SELECT doc_id, n_chars,
         trim(regexp_replace(text, '\s+', ' ', 'g')) AS norm
  FROM documents WHERE doc_id % 5 = 0
),
tmpl AS (
  SELECT doc_id,
         'Doc ' || doc_id AS title,
         length(norm) AS body_len,
         length('id: ' || doc_id || chr(10) || 'chars: ' || n_chars) AS row_len
  FROM base
)
SELECT doc_id, title,
       (body_len + 2 + row_len)::BIGINT AS text_len,
       1::BIGINT AS n_atomic,
       (body_len + 2)::BIGINT AS atomic_start,
       (body_len + 2 + row_len)::BIGINT AS atomic_end
FROM tmpl""",
)
def q_parsed_docx_roundtrip(spark, sf_dir):
    """Build one .docx per document (body paragraph + core title + a 2x2
    table whose data row is atomic), parse it with the real stdlib parser,
    and emit offsets the oracle derives from the template."""
    from ..sources.docx import parse_docx_bytes

    docs = spread(
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 5 == 0)
        .select("doc_id", "text", "n_chars")
    )

    def _roundtrip(batches):
        for pdf in batches:
            rows = []
            for doc_id, text, n_chars in zip(
                pdf["doc_id"], pdf["text"], pdf["n_chars"]
            ):
                parsed = parse_docx_bytes(
                    f"/mem/{doc_id}.docx", _docx_bytes(doc_id, text or "", n_chars)
                )
                ar = parsed["atomic_ranges"]
                rows.append(
                    (
                        doc_id,
                        parsed["title"],
                        len(parsed["text"]),
                        len(ar),
                        ar[0][0] if ar else -1,
                        ar[-1][1] if ar else -1,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "title", "text_len", "n_atomic",
                    "atomic_start", "atomic_end",
                ],
            )

    return docs.mapInPandas(_roundtrip, _OUT_SCHEMA)


def _pdf_bytes(doc_id: int, norm: str) -> bytes:
    """3-page PDF: identical small-font header+footer on every page (T5
    must strip them), one body sentence per page carrying the sanitized
    document text (no internal terminators — assembly is then exact and
    the oracle can derive the final length arithmetically)."""
    from ..sources.pdf_mini import build_pdf

    pages = []
    for p in range(1, 4):
        pages.append(
            [
                (50.0, 780.0, 6.0, "Repeated header boilerplate."),
                (50.0, 400.0, 11.0, f"Page {p} body {norm}."),
                (50.0, 10.0, 6.0, "Repeated footer boilerplate."),
            ]
        )
    return build_pdf(pages, title=f"Doc {doc_id}")


@register(
    "parsed_pdf_roundtrip",
    r"""WITH base AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(text, '[^a-zA-Z0-9 ]+', ' ', 'g'),
                             ' +', ' ', 'g')) AS norm
  FROM documents WHERE doc_id % 5 = 2
)
SELECT doc_id,
       'Doc ' || doc_id AS title,
       (3 * length('Page 1 body ' || norm || '.') + 4)::BIGINT AS text_len,
       TRUE AS stripped
FROM base""",
)
def q_parsed_pdf_roundtrip(spark, sf_dir):
    """Build one real .pdf per document (Flate-compressed content streams,
    /Info title, repeated header/footer), parse it with the stdlib
    extractor (sources/pdf_mini.py), and emit title + stripped-text length
    the oracle derives from the template: a decode bug, a missed strip, or
    a broken title chain shifts the values (S6-pdf / T5 / T7 gate)."""
    from ..sources.pdf_mini import parse_pdf_mini

    docs = spread(
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 5 == 2)
        .select(
            "doc_id",
            F.trim(
                F.regexp_replace(
                    F.regexp_replace("text", "[^a-zA-Z0-9 ]+", " "), " +", " "
                )
            ).alias("norm"),
        )
    )

    def _roundtrip(batches):
        for pdf in batches:
            rows = []
            for doc_id, norm in zip(pdf["doc_id"], pdf["norm"]):
                parsed = parse_pdf_mini(
                    f"/mem/{doc_id}.pdf", _pdf_bytes(doc_id, norm or "")
                )
                stripped = (
                    "Repeated header" not in parsed["text"]
                    and "Repeated footer" not in parsed["text"]
                )
                rows.append(
                    (doc_id, parsed["title"], len(parsed["text"]), stripped)
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "title", "text_len", "stripped"]
            )

    return docs.mapInPandas(
        _roundtrip, "doc_id long, title string, text_len long, stripped boolean"
    )


def _html_page(doc_id: int, text: str) -> str:
    body = html_escape(text)
    return (
        "<!doctype html><html><head>"
        f"<title>Doc {doc_id}</title>"
        "<style>.x{color:red}</style></head><body>"
        "<nav><a href='/'>Home</a> <a href='/a'>About</a></nav>"
        "<div id='content'>"
        f"<h1>Heading {doc_id}</h1>"
        f"<p>{body}</p>"
        "</div>"
        "<footer>footer noise to strip</footer>"
        "</body></html>"
    )


@register(
    "parsed_html_roundtrip",
    r"""WITH base AS (
  SELECT doc_id,
         trim(regexp_replace(text, '\s+', ' ', 'g')) AS norm
  FROM documents WHERE doc_id % 5 = 1
)
SELECT doc_id,
       'Doc ' || doc_id AS title,
       (length('# Heading ' || doc_id) + 2 + length(norm))::BIGINT AS text_len
FROM base""",
)
def q_parsed_html_roundtrip(spark, sf_dir):
    """Build one HTML page per document (title tag, nav/footer/style noise,
    a dense content div with h1 + paragraph), run the stdlib main-content
    extractor, and emit title + markdown length; unstripped noise or a
    broken title chain shifts the values."""
    from ..sources.html import parse_html_text

    docs = spread(
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 5 == 1)
        .select("doc_id", "text")
    )

    def _roundtrip(batches):
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                parsed = parse_html_text(
                    f"/mem/{doc_id}.html", _html_page(doc_id, text or "")
                )
                rows.append((doc_id, parsed["title"], len(parsed["text"])))
            yield pd.DataFrame(rows, columns=["doc_id", "title", "text_len"])

    return docs.mapInPandas(_roundtrip, "doc_id long, title string, text_len long")


# ---------------------------------------------------------------------------
# structured multi-record containers (JSONL / CSV) — one file expands to
# many documents. Each query builds ONE container per `source` group
# (applyInPandas), runs the real stdlib record parser, and emits per-record
# fields the oracle derives relationally: record_index must equal the
# rank of the doc within its source file, so a skipped/duplicated/
# reordered record breaks the hash compare.

_RECORDS_RT_SCHEMA = "doc_id long, record_index long, title string, text_len long"


@register(
    "parsed_jsonl_roundtrip",
    """SELECT doc_id,
       (row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1)::BIGINT
         AS record_index,
       'Doc ' || doc_id AS title,
       length(text)::BIGINT AS text_len
FROM documents""",
)
def q_parsed_jsonl_roundtrip(spark, sf_dir):
    """Serialize each source's documents to a real .jsonl (one JSON object
    per line, id/title/text keys), parse it back with the record parser,
    and emit identity + position + exact text length (JSON round-trips
    text byte-exactly, so text_len is length(text) — no normalization)."""
    import json

    from ..sources.structured import parse_jsonl_bytes

    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")

    def _rt(key, pdf):
        pdf = pdf.sort_values("doc_id")
        lines = [
            json.dumps(
                {"id": int(d), "title": f"Doc {d}", "text": t},
                ensure_ascii=False,
            )
            for d, t in zip(pdf["doc_id"], pdf["text"])
        ]
        recs = parse_jsonl_bytes(
            f"/mem/{key[0]}.jsonl", "\n".join(lines).encode("utf-8")
        )
        return pd.DataFrame(
            [
                (int(r["id"]), r["record_index"], r["title"], len(r["text"]))
                for r in recs
            ],
            columns=["doc_id", "record_index", "title", "text_len"],
        )

    return docs.groupBy("source").applyInPandas(_rt, _RECORDS_RT_SCHEMA)


# ---------------------------------------------------------------------------
# Compressed-container roundtrip: the same JSONL serialization wrapped in
# a rotating stdlib compression envelope per source (gz / bz2 / xz — the
# shapes training corpora actually ship in; .jsonl.gz above all), parsed
# back through parse_structured_bytes' transparent maybe_decompress. The
# inner path drives dispatch, so titles/record identities are byte-equal
# to the uncompressed twin; the codec column pins the rotation.

@register(
    "parsed_jsonl_gz_roundtrip",
    """SELECT doc_id,
       (row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1)::BIGINT
         AS record_index,
       CASE substr(source, 4)::INT % 3 WHEN 0 THEN 'gz' WHEN 1 THEN 'bz2'
            ELSE 'xz' END AS codec,
       'Doc ' || doc_id AS title,
       length(text)::BIGINT AS text_len
FROM documents""",
)
def q_parsed_jsonl_gz_roundtrip(spark, sf_dir):
    import bz2
    import gzip
    import json
    import lzma

    from ..sources.structured import parse_structured_bytes

    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    schema = (
        "doc_id long, record_index long, codec string, title string,"
        " text_len long"
    )

    def _rt(key, pdf):
        source = key[0]
        i = int(source[3:]) if source[3:].isdigit() else 0
        codec = ("gz", "bz2", "xz")[i % 3]
        comp = {"gz": gzip.compress, "bz2": bz2.compress, "xz": lzma.compress}[
            codec
        ]
        pdf = pdf.sort_values("doc_id")
        lines = [
            json.dumps(
                {"id": int(d), "title": f"Doc {d}", "text": t},
                ensure_ascii=False,
            )
            for d, t in zip(pdf["doc_id"], pdf["text"])
        ]
        recs = parse_structured_bytes(
            f"/mem/{source}.jsonl.{codec}",
            comp("\n".join(lines).encode("utf-8")),
        )
        return pd.DataFrame(
            [
                (int(r["id"]), r["record_index"], codec, r["title"], len(r["text"]))
                for r in recs
            ],
            columns=["doc_id", "record_index", "codec", "title", "text_len"],
        )

    return docs.groupBy("source").applyInPandas(_rt, schema)


@register(
    "parsed_csv_roundtrip",
    """SELECT doc_id,
       (row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1)::BIGINT
         AS record_index,
       trim(substr(text, 1, 100)) AS title,
       length(text)::BIGINT AS text_len
FROM documents""",
)
def q_parsed_csv_roundtrip(spark, sf_dir):
    """Serialize each source's documents to a real header CSV (id,text —
    deliberately NO title column, exercising the first-line-of-text title
    fallback), parse via csv.DictReader, and emit the same relational
    identity fields as the JSONL twin."""
    import csv
    import io

    from ..sources.structured import parse_csv_bytes

    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")

    def _rt(key, pdf):
        pdf = pdf.sort_values("doc_id")
        buf = io.StringIO()
        w = csv.writer(buf)
        w.writerow(["id", "text"])
        for d, t in zip(pdf["doc_id"], pdf["text"]):
            w.writerow([int(d), t])
        recs = parse_csv_bytes(f"/mem/{key[0]}.csv", buf.getvalue().encode("utf-8"))
        return pd.DataFrame(
            [
                (int(r["id"]), r["record_index"], r["title"], len(r["text"]))
                for r in recs
            ],
            columns=["doc_id", "record_index", "title", "text_len"],
        )

    return docs.groupBy("source").applyInPandas(_rt, _RECORDS_RT_SCHEMA)


@register(
    "parsed_xml_roundtrip",
    """SELECT doc_id,
       (row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1)::BIGINT
         AS record_index,
       'Doc ' || doc_id AS title,
       length(text)::BIGINT AS text_len
FROM documents""",
)
def q_parsed_xml_roundtrip(spark, sf_dir):
    """Serialize each source's documents to real XML (<docs><record id=..>
    <title>/<text> children</record>...</docs>, entity-escaped), parse it
    back with the XML record parser, and emit identity + position + exact
    text length — XML escaping round-trips text byte-exactly, so text_len
    is length(text), same oracle as the JSONL container."""
    from xml.sax.saxutils import escape

    from ..sources.structured import parse_xml_bytes

    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")

    def _rt(key, pdf):
        pdf = pdf.sort_values("doc_id")
        parts = ["<docs>"]
        for d, t in zip(pdf["doc_id"], pdf["text"]):
            parts.append(
                f'<record id="{int(d)}"><title>Doc {int(d)}</title>'
                f"<text>{escape(t)}</text></record>"
            )
        parts.append("</docs>")
        recs = parse_xml_bytes(f"/mem/{key[0]}.xml", "".join(parts).encode("utf-8"))
        return pd.DataFrame(
            [
                (int(r["id"]), r["record_index"], r["title"], len(r["text"]))
                for r in recs
            ],
            columns=["doc_id", "record_index", "title", "text_len"],
        )

    return docs.groupBy("source").applyInPandas(_rt, _RECORDS_RT_SCHEMA)


# T10 visual-candidate detection gated end-to-end on REAL bytes: each
# selected document becomes a 2-page PDF with a deterministic figure
# layout (page 0: one image XObject whose width grows with doc_id;
# page 1: doc_id%9 stroked rectangles, no image). The Spark side runs the
# byte-level lane — build_pdf -> pdf_mini block extraction (Do placements
# through the CTM, path paints) -> operators/pdf_layout.visual_candidates
# — while the oracle re-derives the same geometry ARITHMETICALLY from
# doc_id and applies the published thresholds (largest-image >= 0.10,
# total >= 0.15, strokes >= 5, 8%/12pt crop padding). A drift anywhere —
# writer, interpreter, CTM math, detector rule, crop padding — breaks the
# hash. Pages with no blocks at all produce no row on either side (the
# detector aggregates blocks; strokes=0 text pages are invisible to it).

_VIS_PW, _VIS_PH = 612.0, 792.0


@register(
    "pdf_visual_detect",
    f"""WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 5 = 1),
p0 AS (
  SELECT doc_id, 0 AS page,
         (40 + doc_id % 20)::DOUBLE AS ix0, 120.0 AS iy0,
         (40 + doc_id % 20 + 60 + 6 * (doc_id % 60))::DOUBLE AS ix1,
         320.0 AS iy1, 0::BIGINT AS n_strokes
  FROM d
),
p1 AS (
  SELECT doc_id, 1 AS page,
         NULL::DOUBLE AS ix0, NULL::DOUBLE AS iy0,
         NULL::DOUBLE AS ix1, NULL::DOUBLE AS iy1,
         (doc_id % 9)::BIGINT AS n_strokes
  FROM d WHERE doc_id % 9 <> 0
),
calc AS (
  SELECT doc_id, page, n_strokes, ix0, iy0, ix1, iy1,
         CASE WHEN ix0 IS NULL THEN 0.0
              ELSE (ix1 - ix0) * (iy1 - iy0) END AS img_area,
         CASE WHEN ix0 IS NULL THEN NULL
              ELSE greatest(0.08 * greatest(ix1 - ix0, iy1 - iy0), 12.0) END AS pad
  FROM (SELECT * FROM p0 UNION ALL SELECT * FROM p1)
),
out AS (
  SELECT doc_id, page,
         (coalesce(img_area / ({_VIS_PW} * {_VIS_PH}), 0.0) >= 0.10
          OR img_area / ({_VIS_PW} * {_VIS_PH}) >= 0.15
          OR n_strokes >= 5) AS is_candidate,
         CASE WHEN ix0 IS NULL THEN 0.0 ELSE greatest(ix0 - pad, 0.0) END AS cx0,
         CASE WHEN ix0 IS NULL THEN 0.0 ELSE greatest(iy0 - pad, 0.0) END AS cy0,
         CASE WHEN ix0 IS NULL THEN {_VIS_PW} ELSE least(ix1 + pad, {_VIS_PW}) END AS cx1,
         CASE WHEN ix0 IS NULL THEN {_VIS_PH} ELSE least(iy1 + pad, {_VIS_PH}) END AS cy1,
         img_area / ({_VIS_PW} * {_VIS_PH}) AS image_ratio,
         n_strokes
  FROM calc
)
SELECT doc_id, page, is_candidate,
       round(cx0, 6) + 0 AS crop_x0, round(cy0, 6) + 0 AS crop_y0,
       round(cx1, 6) + 0 AS crop_x1, round(cy1, 6) + 0 AS crop_y1,
       round(image_ratio, 6) + 0 AS image_ratio, n_strokes
FROM out ORDER BY doc_id, page""",
)
def q_pdf_visual_detect(spark, sf_dir):
    from ..operators.multimodal import pdf_blocks
    from ..operators.pdf_layout import visual_candidates

    docs = spread(load(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 5 == 1
    ).select("doc_id"))

    def _mk(batches):
        from ..sources.pdf_mini import build_pdf

        for pdf in batches:
            paths, blobs = [], []
            for d in pdf["doc_id"]:
                d = int(d)
                x0 = 40 + d % 20
                w = 60 + 6 * (d % 60)
                blobs.append(
                    build_pdf(
                        [
                            [(50.0, 700.0, 12.0, f"Figure doc {d} page one")],
                            [(50.0, 700.0, 12.0, f"Doc {d} page two")],
                        ],
                        images=[[(float(x0), 120.0, float(w), 200.0)], []],
                        strokes=[0, d % 9],
                    )
                )
                paths.append(str(d))
            yield pd.DataFrame({"path": paths, "content": blobs})

    bytes_df = docs.mapInPandas(_mk, "path string, content binary")
    cands = visual_candidates(pdf_blocks(bytes_df), doc_col="doc_key")
    return cands.select(
        F.col("doc_key").cast("long").alias("doc_id"),
        "page",
        "is_candidate",
        (F.round(F.col("crop.x0"), 6) + F.lit(0.0)).alias("crop_x0"),
        (F.round(F.col("crop.y0"), 6) + F.lit(0.0)).alias("crop_y0"),
        (F.round(F.col("crop.x1"), 6) + F.lit(0.0)).alias("crop_x1"),
        (F.round(F.col("crop.y1"), 6) + F.lit(0.0)).alias("crop_y1"),
        (F.round("image_ratio", 6) + F.lit(0.0)).alias("image_ratio"),
        F.col("n_strokes").cast("long").alias("n_strokes"),
    ).orderBy("doc_id", "page")


# ---------------------------------------------------------------------------
# Image lane, oracle-gated END-TO-END on real bytes (same technique as
# pdf_visual_detect): deterministic gradient images are ENCODED in-plan —
# netpbm P6 for even doc_ids, 24-bit BMP for odd (two container parsers,
# one query) — cross a real binary-column stage boundary, then DECODE
# through operators/multimodal.default_image_decoder's magic dispatch and
# a nearest-neighbor 2x resize. Every output is integer-exact: the pixel
# sum has a closed form the oracle recomputes arithmetically, the resized
# sum must be exactly 4x (replication), and the mean is micro-unit
# half-away integer division. A byte-level defect anywhere (header
# parse, row padding, BGR order, bottom-up flip, resize sampling) breaks
# the hash.

@register(
    "media_image_features",
    """WITH d AS (
  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 7 AS h
  FROM documents WHERE doc_id % 4 = 0 OR doc_id % 4 = 1
),
px AS (
  SELECT doc_id, w, h,
         sum((31 * doc_id + 17 * y + 7 * x + 3 * c) % 256)::BIGINT AS sum_px
  FROM d,
       unnest(range(0, h)) AS ry(y),
       unnest(range(0, w)) AS rx(x),
       unnest(range(0, 3)) AS rc(c)
  GROUP BY doc_id, w, h
)
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'ppm' ELSE 'bmp' END AS container,
       w::BIGINT AS width, h::BIGINT AS height, sum_px,
       (4 * sum_px)::BIGINT AS resized_sum_px,
       ((2 * sum_px * 1000000 + h * w * 3) // (2 * h * w * 3)) / 1000000.0 + 0
         AS mean_px
FROM px ORDER BY doc_id""",
)
def q_media_image_features(spark, sf_dir):
    # NO spread here (r16 A/B): the media fixture rows are tiny (few-px
    # synthetic images), so the per-row Python work never amortizes the
    # round-robin exchange — and each 32-wide chained-Python stage forks
    # a 64-96-process worker fleet whose cold import cost dominated the
    # whole media family in the sweep (video 7.8 s cold -> 1.4 s warm;
    # warm spread-off -62%). parsed_pdf_roundtrip keeps spread: its real
    # per-row Flate work measured 4x WORSE single-split. At real scale
    # media blobs arrive in >= cores splits and spread is a no-op anyway.
    docs = load(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 4 == 0) | (F.col("doc_id") % 4 == 1)
    ).select("doc_id")

    def _mk(batches):
        import numpy as np

        from ..operators.multimodal import encode_bmp, encode_ppm

        for pdf in batches:
            ids, blobs = [], []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 4 + d % 5, 3 + d % 7
                y, x = np.mgrid[0:h, 0:w]
                img = np.stack(
                    [(31 * d + 17 * y + 7 * x + 3 * c) % 256 for c in range(3)],
                    axis=-1,
                ).astype(np.uint8)
                blobs.append(encode_ppm(img) if d % 2 == 0 else encode_bmp(img))
                ids.append(d)
            yield pd.DataFrame({"doc_id": ids, "content": blobs})

    media = docs.mapInPandas(_mk, "doc_id long, content binary")

    def _feats(batches):
        from ..operators.multimodal import default_image_decoder, resize_nearest

        for pdf in batches:
            rows = []
            for d, content in zip(pdf["doc_id"], pdf["content"]):
                img = default_image_decoder(bytes(content))
                h, w = img.shape[:2]
                up = resize_nearest(img, 2 * h, 2 * w)
                rows.append((int(d), int(img.sum()), int(up.sum()), h, w))
            yield pd.DataFrame(
                rows, columns=["doc_id", "sum_px", "resized_sum_px", "h", "w"]
            )

    feats = media.mapInPandas(
        _feats, "doc_id long, sum_px long, resized_sum_px long, h int, w int"
    )
    return feats.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, "ppm").otherwise("bmp").alias("container"),
        F.col("w").cast("bigint").alias("width"),
        F.col("h").cast("bigint").alias("height"),
        "sum_px",
        "resized_sum_px",
        (
            F.expr("div(2 * sum_px * 1000000 + h * w * 3, 2 * h * w * 3)")
            / F.lit(1000000.0)
            + F.lit(0.0)
        ).alias("mean_px"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# GIF lane — the package's first COMPRESSED container, oracle-gated
# end-to-end on real bytes: the same deterministic gradients are encoded
# as single-frame GIF87a (palette build + true LZW compression), cross a
# binary-column stage boundary, and decode back through
# default_image_decoder's magic dispatch. GIF is palette-bound, so the
# lane also pins the palette size (distinct colors has a closed form the
# oracle recomputes: the gradient's channels are v, v+3, v+6 mod 256, so
# distinct pixels == distinct v). A defect anywhere in the LZW variable-
# width bitstream, the code-table growth, the deferred clear, or the
# palette indexing breaks the hash.

@register(
    "media_gif_features",
    """WITH d AS (
  SELECT doc_id, 4 + doc_id % 9 AS w, 3 + doc_id % 11 AS h
  FROM documents WHERE doc_id % 4 = 2
),
px AS (
  SELECT doc_id, w, h,
         sum((31 * doc_id + 17 * y + 7 * x + 3 * c) % 256)::BIGINT AS sum_px,
         count(DISTINCT CASE WHEN c = 0
                             THEN (31 * doc_id + 17 * y + 7 * x) % 256
                        END)::BIGINT AS n_colors
  FROM d,
       unnest(range(0, h)) AS ry(y),
       unnest(range(0, w)) AS rx(x),
       unnest(range(0, 3)) AS rc(c)
  GROUP BY doc_id, w, h
)
SELECT doc_id, w::BIGINT AS width, h::BIGINT AS height, n_colors, sum_px,
       ((2 * sum_px * 1000000 + h * w * 3) // (2 * h * w * 3)) / 1000000.0 + 0
         AS mean_px
FROM px ORDER BY doc_id""",
)
def q_media_gif_features(spark, sf_dir):
    # no spread: tiny fixture rows — see q_media_image_features (r16 A/B)
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 4 == 2)
        .select("doc_id")
    )

    def _mk(batches):
        import numpy as np

        from ..operators.multimodal import encode_gif

        for pdf in batches:
            ids, blobs = [], []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 4 + d % 9, 3 + d % 11
                y, x = np.mgrid[0:h, 0:w]
                img = np.stack(
                    [(31 * d + 17 * y + 7 * x + 3 * c) % 256 for c in range(3)],
                    axis=-1,
                ).astype(np.uint8)
                blobs.append(encode_gif(img))
                ids.append(d)
            yield pd.DataFrame({"doc_id": ids, "content": blobs})

    media = docs.mapInPandas(_mk, "doc_id long, content binary")

    def _feats(batches):
        import numpy as np

        from ..operators.multimodal import default_image_decoder

        for pdf in batches:
            rows = []
            for d, content in zip(pdf["doc_id"], pdf["content"]):
                img = default_image_decoder(bytes(content))
                h, w = img.shape[:2]
                n_colors = len(np.unique(img.reshape(-1, 3), axis=0))
                rows.append((int(d), int(img.sum()), n_colors, h, w))
            yield pd.DataFrame(
                rows, columns=["doc_id", "sum_px", "n_colors", "h", "w"]
            )

    feats = media.mapInPandas(
        _feats, "doc_id long, sum_px long, n_colors long, h int, w int"
    )
    return feats.select(
        "doc_id",
        F.col("w").cast("bigint").alias("width"),
        F.col("h").cast("bigint").alias("height"),
        "n_colors",
        "sum_px",
        (
            F.expr("div(2 * sum_px * 1000000 + h * w * 3, 2 * h * w * 3)")
            / F.lit(1000000.0)
            + F.lit(0.0)
        ).alias("mean_px"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# PNG lane — zlib-compressed mainstream codec, oracle-gated end-to-end:
# deterministic RGBA gradients encode as real 8-bit PNGs with the row
# filter CYCLING None/Sub/Up/Average/Paeth (every decode path crosses
# the binary stage boundary on every document), then decode back through
# default_image_decoder. Completes the residue symmetry: ppm/bmp on
# doc_id%4 in {0,1}, gif on 2, png on 3.

@register(
    "media_png_features",
    """WITH d AS (
  SELECT doc_id, 3 + doc_id % 8 AS w, 2 + doc_id % 10 AS h
  FROM documents WHERE doc_id % 4 = 3
),
px AS (
  SELECT doc_id, w, h,
         sum((31 * doc_id + 17 * y + 7 * x + 3 * c) % 256)::BIGINT AS sum_px
  FROM d,
       unnest(range(0, h)) AS ry(y),
       unnest(range(0, w)) AS rx(x),
       unnest(range(0, 4)) AS rc(c)
  GROUP BY doc_id, w, h
)
SELECT doc_id, w::BIGINT AS width, h::BIGINT AS height, 4::BIGINT AS channels,
       sum_px,
       ((2 * sum_px * 1000000 + h * w * 4) // (2 * h * w * 4)) / 1000000.0 + 0
         AS mean_px
FROM px ORDER BY doc_id""",
)
def q_media_png_features(spark, sf_dir):
    # no spread: tiny fixture rows — see q_media_image_features (r16 A/B)
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 4 == 3)
        .select("doc_id")
    )

    def _mk(batches):
        import numpy as np

        from ..operators.multimodal import encode_png

        for pdf in batches:
            ids, blobs = [], []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 3 + d % 8, 2 + d % 10
                y, x = np.mgrid[0:h, 0:w]
                img = np.stack(
                    [(31 * d + 17 * y + 7 * x + 3 * c) % 256 for c in range(4)],
                    axis=-1,
                ).astype(np.uint8)
                blobs.append(encode_png(img))  # RGBA, filters cycled per row
                ids.append(d)
            yield pd.DataFrame({"doc_id": ids, "content": blobs})

    media = docs.mapInPandas(_mk, "doc_id long, content binary")

    def _feats(batches):
        from ..operators.multimodal import default_image_decoder

        for pdf in batches:
            rows = []
            for d, content in zip(pdf["doc_id"], pdf["content"]):
                img = default_image_decoder(bytes(content))
                h, w, ch = img.shape
                rows.append((int(d), int(img.sum()), h, w, ch))
            yield pd.DataFrame(rows, columns=["doc_id", "sum_px", "h", "w", "ch"])

    feats = media.mapInPandas(
        _feats, "doc_id long, sum_px long, h int, w int, ch int"
    )
    return feats.select(
        "doc_id",
        F.col("w").cast("bigint").alias("width"),
        F.col("h").cast("bigint").alias("height"),
        F.col("ch").cast("bigint").alias("channels"),
        "sum_px",
        (
            F.expr("div(2 * sum_px * 1000000 + h * w * 4, 2 * h * w * 4)")
            / F.lit(1000000.0)
            + F.lit(0.0)
        ).alias("mean_px"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Audio lane, oracle-gated the same way: a deterministic int16 waveform is
# packed into a REAL PCM16 WAV container in-plan (stdlib wave), crosses a
# binary stage boundary, decodes through
# operators/multimodal.default_audio_decoder (RIFF parse, mono fold,
# [-1,1] scaling), and windows into integer-exact features: sum of squared
# samples and strict sign-flip zero crossings per 16-sample window. The
# int16 -> float /32768 -> *32768 round trip is exact in IEEE double, so
# the oracle recomputes every output arithmetically from the waveform
# formula; a byte-order / header / scaling defect breaks the hash.

@register(
    "media_audio_features",
    """WITH d AS (
  SELECT doc_id, 48 + doc_id % 16 AS n FROM documents WHERE doc_id % 3 = 0
),
s AS (
  SELECT doc_id, i, ((31 * doc_id + 17 * i) % 2001) - 1000 AS v, i // 16 AS wdx
  FROM d, unnest(range(0, n)) AS r(i)
),
p AS (
  SELECT doc_id, wdx, v, i,
         lag(v) OVER (PARTITION BY doc_id, wdx ORDER BY i) AS pv
  FROM s
)
SELECT doc_id, wdx::BIGINT AS window_index, count(*)::BIGINT AS n_samples,
       sum(v * v)::BIGINT AS sum_sq,
       sum(CASE WHEN pv IS NOT NULL AND pv * v < 0 THEN 1 ELSE 0 END)::BIGINT
         AS zero_crossings
FROM p GROUP BY doc_id, wdx ORDER BY doc_id, window_index""",
)
def q_media_audio_features(spark, sf_dir):
    # no spread: tiny fixture rows — see q_media_image_features (r16 A/B)
    docs = load(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 3 == 0
    ).select("doc_id")

    def _mk(batches):
        import io
        import wave

        import numpy as np

        for pdf in batches:
            ids, blobs = [], []
            for d in pdf["doc_id"]:
                d = int(d)
                n = 48 + d % 16
                i = np.arange(n)
                samples = (((31 * d + 17 * i) % 2001) - 1000).astype(np.int16)
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(8000)
                    w.writeframes(samples.tobytes())
                ids.append(d)
                blobs.append(buf.getvalue())
            yield pd.DataFrame({"doc_id": ids, "content": blobs})

    media = docs.mapInPandas(_mk, "doc_id long, content binary")

    def _feats(batches):
        import numpy as np

        from ..operators.multimodal import default_audio_decoder

        for pdf in batches:
            rows = []
            for d, content in zip(pdf["doc_id"], pdf["content"]):
                x, _sr = default_audio_decoder(bytes(content))
                s = np.rint(x * 32768.0).astype(np.int64)
                for w0 in range(0, len(s), 16):
                    win = s[w0 : w0 + 16]
                    zc = int(np.sum(win[:-1] * win[1:] < 0))
                    rows.append(
                        (int(d), w0 // 16, len(win), int(np.sum(win * win)), zc)
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "window_index", "n_samples", "sum_sq",
                         "zero_crossings"],
            )

    feats = media.mapInPandas(
        _feats,
        "doc_id long, window_index long, n_samples long, sum_sq long,"
        " zero_crossings long",
    )
    return feats.orderBy("doc_id", "window_index")


# ---------------------------------------------------------------------------
# Video lane, completing the oracle-gated multimodal trio: deterministic
# luma gradients are packed into a REAL YUV4MPEG2 stream in-plan
# (operators/multimodal.encode_y4m), cross a binary stage boundary, and
# sample_frames' default extractor (decode_y4m -> PGM payload) pulls every
# 3rd frame; the decoded planes' integer pixel sums check against a
# closed-form oracle. Frame count varies per doc (5 + doc_id % 7) so the
# past-stream-end emission rule is exercised: requested indices beyond the
# stream produce NO row, and the oracle enumerates exactly the surviving
# (doc, frame) set.

@register(
    "media_video_frames",
    """WITH d AS (
  SELECT doc_id, 5 + doc_id % 7 AS n_frames
  FROM documents WHERE doc_id % 6 = 2
),
sampled AS (
  SELECT doc_id, 3 * j AS frame_index
  FROM d, unnest(range(0, 4)) AS r(j)
  WHERE 3 * j < n_frames
),
px AS (
  SELECT s.doc_id, s.frame_index,
         sum((7 * s.doc_id + 13 * s.frame_index + 5 * y + 11 * x) % 256)::BIGINT
           AS sum_luma
  FROM sampled s,
       unnest(range(0, 6)) AS ry(y),
       unnest(range(0, 8)) AS rx(x)
  GROUP BY s.doc_id, s.frame_index
)
SELECT doc_id, frame_index::BIGINT AS frame_index, sum_luma
FROM px ORDER BY doc_id, frame_index""",
)
def q_media_video_frames(spark, sf_dir):
    from ..operators.multimodal import media_table, sample_frames

    # no spread: tiny fixture rows — see q_media_image_features (r16 A/B).
    # This lane chains THREE Python stages, so the 32-wide spread forked a
    # ~96-process worker fleet: the family's worst cold number (9.9 s).
    docs = load(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 6 == 2
    ).select("doc_id")

    def _mk(batches):
        import numpy as np

        from ..operators.multimodal import encode_y4m

        for pdf in batches:
            ids, blobs = [], []
            for d in pdf["doc_id"]:
                d = int(d)
                y, x = np.mgrid[0:6, 0:8]
                frames = [
                    ((7 * d + 13 * k + 5 * y + 11 * x) % 256).astype(np.uint8)
                    for k in range(5 + d % 7)
                ]
                ids.append(d)
                blobs.append(encode_y4m(frames))
            yield pd.DataFrame({"doc_id": ids, "content": blobs})

    media = media_table(
        docs.mapInPandas(_mk, "doc_id long, content binary"),
        id_col="doc_id", content_col="content", modality="video",
    )
    frames = sample_frames(media, every_n=3, n_frames=4)

    def _sums(batches):
        import numpy as np

        from ..operators.multimodal import decode_netpbm

        for pdf in batches:
            rows = []
            for mid, idx, payload in zip(
                pdf["media_id"], pdf["frame_index"], pdf["frame"]
            ):
                plane = decode_netpbm(bytes.fromhex(payload))
                rows.append((int(mid), int(idx), int(np.sum(plane, dtype=np.int64))))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_index", "sum_luma"])

    return frames.mapInPandas(
        _sums, "doc_id long, frame_index long, sum_luma long"
    ).orderBy("doc_id", "frame_index")


# ---------------------------------------------------------------------------
# WebDataset tar-shard roundtrip: each source's documents are packed into
# a deterministic POSIX tar shard (two members per sample — NNNNNNNN.txt
# with the text bytes, NNNNNNNN.json with {"id","title"} — adjacent, as
# the convention requires), odd-numbered sources additionally wrapped in
# a gzip envelope (shard.tar.gz composes maybe_decompress with the tar
# walk). The shards cross a binary stage boundary, expand through
# expand_shards' map-only member walk, and regroup through
# assemble_samples' slot map. The oracle re-derives every field from the
# construction template: member grouping, slot routing, byte accounting
# (ASCII json => char length == byte length), and the envelope rotation.
# A defect in the tar writer, the member walk, the key/slot split, or
# the sample aggregation shifts a count or length and breaks the hash.

@register(
    "webdataset_roundtrip",
    """SELECT source,
       substr(source, 4)::INT % 2 AS gz,
       doc_id,
       'Doc ' || doc_id AS title,
       2::BIGINT AS n_slots,
       length(text)::BIGINT AS text_len,
       (octet_length(encode(text))
        + length('{"id": ' || doc_id || ', "title": "Doc ' || doc_id || '"}')
       )::BIGINT AS total_bytes
FROM documents ORDER BY doc_id""",
)
def q_webdataset_roundtrip(spark, sf_dir):
    import gzip
    import json

    from ..sources.webdataset import (
        assemble_samples,
        expand_shards,
        write_tar_shard,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")

    def _pack(key, pdf):
        source = key[0]
        i = int(source[3:]) if source[3:].isdigit() else 0
        pdf = pdf.sort_values("doc_id")
        members = []
        for d, t in zip(pdf["doc_id"], pdf["text"]):
            d = int(d)
            members.append((f"{d:08d}.txt", t.encode("utf-8")))
            members.append(
                (
                    f"{d:08d}.json",
                    json.dumps({"id": d, "title": f"Doc {d}"}).encode(),
                )
            )
        blob = write_tar_shard(members)
        if i % 2:
            path = f"/mem/{source}.tar.gz"
            blob = gzip.compress(blob, mtime=0)
        else:
            path = f"/mem/{source}.tar"
        return pd.DataFrame({"path": [path], "content": [blob]})

    shards = docs.groupBy("source").applyInPandas(
        _pack, "path string, content binary"
    )
    samples = assemble_samples(expand_shards(shards))
    txt = F.col("slots")["txt"].cast("string")
    js = F.col("slots")["json"].cast("string")
    return samples.select(
        F.regexp_extract("shard", r"/mem/(src\d+)\.tar", 1).alias("source"),
        F.when(F.col("shard").endswith(".gz"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("gz"),
        F.col("sample_key").cast("long").alias("doc_id"),
        F.get_json_object(js, "$.title").alias("title"),
        "n_slots",
        F.length(txt).cast("long").alias("text_len"),
        "total_bytes",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Multimodal WebDataset lane — the LAION shape: image+caption samples in
# tar shards. Every image codec in the package rotates through the SHARD
# path (doc_id%4 -> ppm / bmp / gif / png-RGBA), each sample carrying an
# NNNNNNNN.<codec> member and an NNNNNNNN.txt caption; shards expand and
# assemble exactly as a training loader would, the image slot decodes
# through default_image_decoder's magic dispatch, and the caption rides
# the txt slot. One dimension template across codecs keeps the oracle a
# single closed form: w = 4 + d%7, h = 3 + d%9, channels 4 for png else
# 3, pixel (31d + 17y + 7x + 3c) % 256. A defect in any codec, the tar
# writer, the member walk, or the slot map shifts sum_px/caption_len and
# breaks the hash.

@register(
    "webdataset_multimodal",
    """WITH d AS (
  SELECT doc_id,
         4 + doc_id % 7 AS w, 3 + doc_id % 9 AS h,
         CASE doc_id % 4 WHEN 0 THEN 'ppm' WHEN 1 THEN 'bmp'
              WHEN 2 THEN 'gif' ELSE 'png' END AS codec,
         CASE WHEN doc_id % 4 = 3 THEN 4 ELSE 3 END AS ch,
         'caption for doc ' || doc_id AS caption
  FROM documents WHERE doc_id % 10 < 4
)
SELECT doc_id, codec,
       w::BIGINT AS width, h::BIGINT AS height, ch::BIGINT AS channels,
       (SELECT sum((31 * doc_id + 17 * y + 7 * x + 3 * c) % 256)
        FROM unnest(range(0, h)) AS ry(y),
             unnest(range(0, w)) AS rx(x),
             unnest(range(0, ch)) AS rc(c))::BIGINT AS sum_px,
       length(caption)::BIGINT AS caption_len,
       2::BIGINT AS n_slots
FROM d ORDER BY doc_id""",
)
def q_webdataset_multimodal(spark, sf_dir):
    from ..sources.webdataset import (
        assemble_samples,
        expand_shards,
        write_tar_shard,
    )

    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 < 4)
        .select("doc_id", "source")
    )

    def _pack(key, pdf):
        import numpy as np

        from ..operators.multimodal import (
            encode_bmp,
            encode_gif,
            encode_png,
            encode_ppm,
        )

        source = key[0]
        members = []
        for d in sorted(int(x) for x in pdf["doc_id"]):
            w, h = 4 + d % 7, 3 + d % 9
            ch = 4 if d % 4 == 3 else 3
            y, x = np.mgrid[0:h, 0:w]
            img = np.stack(
                [(31 * d + 17 * y + 7 * x + 3 * c) % 256 for c in range(ch)],
                axis=-1,
            ).astype(np.uint8)
            enc, ext = [
                (encode_ppm, "ppm"), (encode_bmp, "bmp"),
                (encode_gif, "gif"), (encode_png, "png"),
            ][d % 4]
            members.append((f"{d:08d}.{ext}", enc(img)))
            members.append((f"{d:08d}.txt", f"caption for doc {d}".encode()))
        return pd.DataFrame(
            {"path": [f"/mem/mm-{source}.tar"],
             "content": [write_tar_shard(members)]}
        )

    shards = docs.groupBy("source").applyInPandas(
        _pack, "path string, content binary"
    )
    samples = assemble_samples(expand_shards(shards))

    def _feats(batches):
        from ..operators.multimodal import default_image_decoder

        for pdf in batches:
            rows = []
            for key, slots, n_slots in zip(
                pdf["sample_key"], pdf["slots"], pdf["n_slots"]
            ):
                d = int(key)
                img_slot = next(s for s in slots if s != "txt")
                img = default_image_decoder(bytes(slots[img_slot]))
                h, w = img.shape[:2]
                ch = 1 if img.ndim == 2 else img.shape[2]
                rows.append(
                    (d, img_slot, w, h, ch, int(img.sum()),
                     len(bytes(slots["txt"]).decode("utf-8")), int(n_slots))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "codec", "width", "height", "channels",
                         "sum_px", "caption_len", "n_slots"],
            )

    return samples.select("sample_key", "slots", "n_slots").mapInPandas(
        _feats,
        "doc_id long, codec string, width long, height long, channels long,"
        " sum_px long, caption_len long, n_slots long",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Arrow IPC roundtrip: each source's documents serialize into a REAL
# Arrow IPC file (pyarrow.ipc — the zero-copy interchange ML loaders
# hand around; odd sources take the .feather spelling through the
# feather reader, and sources divisible by 3 additionally wear a gzip
# envelope) and parse back through parse_structured_bytes' dispatch.
# The id column is written as int64 — the parser's stringify path for
# non-utf8 cells is part of what the hash gates.

@register(
    "parsed_arrow_roundtrip",
    """SELECT doc_id,
       (row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1)::BIGINT
         AS record_index,
       CASE WHEN substr(source, 4)::INT % 2 = 1 THEN 'feather'
            ELSE 'arrow' END AS container,
       (substr(source, 4)::INT % 3 = 0)::INT AS gz,
       'Doc ' || doc_id AS title,
       length(text)::BIGINT AS text_len
FROM documents""",
)
def q_parsed_arrow_roundtrip(spark, sf_dir):
    import gzip

    from ..sources.structured import parse_structured_bytes

    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    schema = (
        "doc_id long, record_index long, container string, gz int,"
        " title string, text_len long"
    )

    def _rt(key, pdf):
        import pyarrow as pa
        from pyarrow import feather

        source = key[0]
        i = int(source[3:]) if source[3:].isdigit() else 0
        container = "feather" if i % 2 == 1 else "arrow"
        pdf = pdf.sort_values("doc_id")
        table = pa.table(
            {
                "id": pa.array([int(d) for d in pdf["doc_id"]], pa.int64()),
                "title": [f"Doc {int(d)}" for d in pdf["doc_id"]],
                "text": list(pdf["text"]),
            }
        )
        buf = pa.BufferOutputStream()
        if container == "feather":
            feather.write_feather(table, buf)
        else:
            with pa.ipc.new_file(buf, table.schema) as writer:
                writer.write_table(table)
        blob = buf.getvalue().to_pybytes()
        path = f"/mem/{source}.{container}"
        wrapped = 1 if i % 3 == 0 else 0
        if wrapped:
            blob = gzip.compress(blob, mtime=0)
            path += ".gz"
        recs = parse_structured_bytes(path, blob)
        return pd.DataFrame(
            [
                (int(r["id"]), r["record_index"], container, wrapped,
                 r["title"], len(r["text"]))
                for r in recs
            ],
            columns=["doc_id", "record_index", "container", "gz", "title",
                     "text_len"],
        )

    return docs.groupBy("source").applyInPandas(_rt, schema)
