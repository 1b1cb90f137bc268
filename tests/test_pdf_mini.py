"""The stdlib PDF extractor (sources/pdf_mini.py): real bytes through
object scan, FlateDecode, page-tree walk, and the text-state interpreter
— then end-to-end through the T5 strip + T7 title chain. No Spark needed
for most cases; the engine test lives in test_engine.py."""

import zlib

import pytest

from mcp_local_rag_spark.sources.pdf_mini import (
    PdfError,
    build_pdf,
    extract_pdf_items,
    parse_pdf_mini,
)


def _three_pages(with_title=True):
    pages = []
    for p in range(1, 4):
        items = [
            (50.0, 780.0, 6.0, "Shared header sentence."),
            (50.0, 400.0, 11.0, f"Page {p} body words differ on every page number {p}."),
            (50.0, 10.0, 6.0, "Shared footer sentence."),
        ]
        if p == 1 and with_title:
            items.insert(1, (50.0, 700.0, 24.0, "The Big Document Title"))
        pages.append(items)
    return pages


def test_roundtrip_positions_sizes_and_meta_title():
    data = build_pdf(_three_pages(), title="Doc 42")
    pages, meta = extract_pdf_items(data)
    assert meta == "Doc 42"
    assert [p["page"] for p in pages] == [0, 1, 2]
    assert all(p["page_height"] == 792.0 for p in pages)
    first = pages[0]["items"]
    assert first[0] == {"x": 50.0, "y": 780.0, "font_size": 6.0,
                        "text": "Shared header sentence.", "font": "F1"}
    assert first[1]["font_size"] == 24.0 and first[1]["text"] == "The Big Document Title"


def test_uncompressed_streams_parse_identically():
    plain = build_pdf(_three_pages(), title="T", compress=False)
    comp = build_pdf(_three_pages(), title="T", compress=True)
    assert extract_pdf_items(plain)[0] == extract_pdf_items(comp)[0]


def test_t5_strip_and_title_chain_on_real_bytes():
    """filter_page_boundary_sentences removes the repeated header AND
    footer sentence from EVERY page; title comes from /Info /Title."""
    parsed = parse_pdf_mini("/mem/report.pdf", build_pdf(_three_pages(), title="Doc 42"))
    assert parsed["title"] == "Doc 42"
    assert "Shared header" not in parsed["text"]
    assert "Shared footer" not in parsed["text"]
    assert "Page 2 body words" in parsed["text"]


def test_title_falls_back_to_large_font_then_filename():
    # no /Info: largest page-1 font > 14pt wins (T7 chain step 2)
    parsed = parse_pdf_mini("/mem/a.pdf", build_pdf(_three_pages(with_title=True)))
    assert parsed["title"] == "The Big Document Title"
    # no /Info, no large font: the strip removes boundary sentences and the
    # first page chunk (its body line) becomes the title
    parsed2 = parse_pdf_mini("/mem/some-file.pdf", build_pdf(_three_pages(with_title=False)))
    assert parsed2["title"].startswith("Page 1 body words")


def _pdf_from_content(content: bytes, n_extra_objects: bytes = b"") -> bytes:
    """Hand-rolled single-page PDF around a raw content stream."""
    return (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 200 100] >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content
        + b"\nendstream endobj\n"
        + n_extra_objects
        + b"trailer << /Size 5 /Root 1 0 R >>\n%%EOF\n"
    )


def test_content_operators_td_tstar_tj_array_and_escapes():
    content = (
        b"BT /F1 10 Tf 1 0 0 1 20 80 Tm (line one) Tj\n"
        b"0 -20 Td [(kerned) -250 (words) 30 (glued)] TJ\n"
        b"2 TL T* (third \\(escaped\\) \\\\ line \\101) Tj\n"
        b"<68657820414243> Tj ET"
    )
    pages, _ = extract_pdf_items(_pdf_from_content(content))
    items = pages[0]["items"]
    texts = [i["text"] for i in items]
    # TJ: gap < -180 becomes a space, small kern glues
    assert texts[1] == "kerned wordsglued"
    # literal escapes: \( \) \\ and octal \101 = 'A'
    assert texts[2] == "third (escaped) \\ line A"
    # hex string decodes
    assert texts[3] == "hex ABC"
    # Td moved down 20, T* down leading=2 from there
    assert items[0]["y"] == 80.0 and items[1]["y"] == 60.0 and items[2]["y"] == 58.0
    assert pages[0]["page_height"] == 100.0


def test_tm_scaling_scales_font_size():
    content = b"BT /F1 10 Tf 2 0 0 2 10 50 Tm (big) Tj ET"
    pages, _ = extract_pdf_items(_pdf_from_content(content))
    assert pages[0]["items"][0]["font_size"] == 20.0
    assert pages[0]["items"][0]["x"] == 10.0


def test_object_stream_pdf():
    """Page objects packed in a /ObjStm (how xref-stream PDFs store
    bodies): the expander must surface them."""
    bodies = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 300 300] >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>",
    ]
    inner, offsets = b"", []
    for body in bodies:
        offsets.append(len(inner))
        inner += body + b" "
    header = b"".join(
        b"%d %d " % (num, off) for num, off in zip((1, 2, 3), offsets)
    )
    packed = zlib.compress(header + inner)
    content = b"BT /F1 9 Tf 1 0 0 1 10 200 Tm (from objstm) Tj ET"
    data = (
        b"%PDF-1.5\n"
        b"4 0 obj << /Type /ObjStm /N 3 /First " + str(len(header)).encode()
        + b" /Length " + str(len(packed)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + packed + b"\nendstream endobj\n"
        b"5 0 obj << /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content + b"\nendstream endobj\n"
        b"6 0 obj << /Type /XRef /Root 1 0 R /Size 7 >> endobj\n"
        b"%%EOF\n"
    )
    pages, _ = extract_pdf_items(data)
    assert len(pages) == 1
    assert pages[0]["page_height"] == 300.0
    assert pages[0]["items"][0]["text"] == "from objstm"


def test_encrypted_pdf_raises():
    data = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"trailer << /Root 1 0 R /Encrypt 9 0 R >>\n%%EOF\n"
    )
    with pytest.raises(PdfError, match="encrypted"):
        extract_pdf_items(data)


def test_multiple_shows_same_line_stay_ordered():
    """Shows without repositioning advance the pen — items on one line
    must come out left-to-right for T6 assembly."""
    content = b"BT /F1 10 Tf 1 0 0 1 10 50 Tm (alpha ) Tj (beta) Tj ET"
    pages, _ = extract_pdf_items(_pdf_from_content(content))
    a, b = pages[0]["items"]
    assert (a["text"], b["text"]) == ("alpha ", "beta")
    assert b["x"] > a["x"] and a["y"] == b["y"]


def test_utf16_metadata_title_and_hex_name_escapes():
    """/Info strings may be UTF-16BE with BOM; names may carry #xx hex
    escapes — both decode per the PDF spec."""
    content = b"BT /F1 9 Tf 1 0 0 1 10 50 Tm (body) Tj ET"
    title_utf16 = "Déjà Vu".encode("utf-16-be")
    data = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Ty#70e /Pages /Kids [3 0 R] /Count 1"
        b" /MediaBox [0 0 100 100] >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content + b"\nendstream endobj\n"
        b"5 0 obj << /Title (\xfe\xff" + title_utf16 + b") >> endobj\n"
        b"trailer << /Root 1 0 R /Info 5 0 R >>\n%%EOF\n"
    )
    pages, meta = extract_pdf_items(data)
    assert meta == "Déjà Vu"
    # the #70 escape in /Ty#70e still resolves the page tree
    assert len(pages) == 1 and pages[0]["items"][0]["text"] == "body"


def test_contents_array_concatenates_streams():
    """/Contents may be an ARRAY of streams forming one logical content
    stream."""
    part1 = b"BT /F1 9 Tf 1 0 0 1 10 80 Tm (first) Tj ET"
    part2 = b"BT /F1 9 Tf 1 0 0 1 10 40 Tm (second) Tj ET"
    data = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1"
        b" /MediaBox [0 0 100 100] >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents [4 0 R 5 0 R] >> endobj\n"
        b"4 0 obj << /Length " + str(len(part1)).encode() + b" >>\nstream\n"
        + part1 + b"\nendstream endobj\n"
        b"5 0 obj << /Length " + str(len(part2)).encode() + b" >>\nstream\n"
        + part2 + b"\nendstream endobj\n"
        b"trailer << /Root 1 0 R >>\n%%EOF\n"
    )
    pages, _ = extract_pdf_items(data)
    assert [i["text"] for i in pages[0]["items"]] == ["first", "second"]


def _lzw_encode(data: bytes, early_change: int = 1) -> bytes:
    """Minimal TIFF-LZW encoder (test-only) mirroring the spec the decoder
    implements: MSB-first, CLEAR first, widths 9->12 with EarlyChange."""
    table = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    buf = cnt = 0
    out = bytearray()

    def emit(code):
        nonlocal buf, cnt
        buf = (buf << width) | code
        cnt += width
        while cnt >= 8:
            out.append((buf >> (cnt - 8)) & 0xFF)
            cnt -= 8

    emit(256)
    w = b""
    for ch in data:
        c = bytes([ch])
        if w + c in table:
            w += c
            continue
        emit(table[w])
        table[w + c] = next_code
        next_code += 1
        if next_code + early_change - 1 >= (1 << width) and width < 12:
            width += 1
        w = c
    if w:
        emit(table[w])
    emit(257)
    if cnt:
        out.append((buf << (8 - cnt)) & 0xFF)
    return bytes(out)


def test_lzw_roundtrip_and_filter():
    from mcp_local_rag_spark.sources.pdf_mini import _lzw_decode

    short = b"AAAA"
    assert _lzw_decode(_lzw_encode(short)) == short
    # long enough to cross the 9->10 bit width switch and hit KwKwK
    long = bytes((i * 7 + i // 3) % 256 for i in range(1500)) + b"ababababab" * 20
    assert _lzw_decode(_lzw_encode(long)) == long

    content = b"BT /F1 9 Tf 1 0 0 1 10 50 Tm (lzw text) Tj ET"
    packed = _lzw_encode(content)
    data = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1"
        b" /MediaBox [0 0 100 100] >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length " + str(len(packed)).encode()
        + b" /Filter /LZWDecode >>\nstream\n" + packed + b"\nendstream endobj\n"
        b"trailer << /Root 1 0 R >>\n%%EOF\n"
    )
    pages, _ = extract_pdf_items(data)
    assert pages[0]["items"][0]["text"] == "lzw text"


def test_asciihex_and_ascii85_filter_chain():
    """ASCIIHexDecode alone, and the classic [/ASCII85Decode /FlateDecode]
    chain (filters apply in order)."""
    import base64

    content = b"BT /F1 9 Tf 1 0 0 1 10 50 Tm (encoded) Tj ET"

    hexed = content.hex().encode() + b">"
    data_hex = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1"
        b" /MediaBox [0 0 100 100] >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length " + str(len(hexed)).encode()
        + b" /Filter /ASCIIHexDecode >>\nstream\n" + hexed + b"\nendstream endobj\n"
        b"trailer << /Root 1 0 R >>\n%%EOF\n"
    )
    pages, _ = extract_pdf_items(data_hex)
    assert pages[0]["items"][0]["text"] == "encoded"

    flated = zlib.compress(content)
    a85 = base64.a85encode(flated, adobe=True)[2:]  # strip <~, keep ~>
    data_85 = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1"
        b" /MediaBox [0 0 100 100] >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length " + str(len(a85)).encode()
        + b" /Filter [/ASCII85Decode /FlateDecode] >>\nstream\n" + a85
        + b"\nendstream endobj\n"
        b"trailer << /Root 1 0 R >>\n%%EOF\n"
    )
    pages, _ = extract_pdf_items(data_85)
    assert pages[0]["items"][0]["text"] == "encoded"


def test_scan_objects_ignores_false_headers_inside_streams():
    """Compressed stream bytes can coincidentally contain 'N G obj'; such a
    match must not clobber the REAL object N defined earlier."""
    from mcp_local_rag_spark.sources.pdf_mini import _scan_objects

    payload = b"xx 5 0 obj 42 endobj zz"
    data = (
        b"5 0 obj\n(real)\nendobj\n"
        b"6 0 obj\n<< /Length " + str(len(payload)).encode() + b" >>\nstream\n"
        + payload
        + b"\nendstream\nendobj\n"
        b"7 0 obj\n99\nendobj\n"
    )
    objs = _scan_objects(data)
    assert objs[5][0] != 42          # real object survives the in-stream fake
    assert objs[7][0] == 99          # scanning resumes after the stream
    assert objs[6][1] == payload


def _decode_gray_png(png: bytes):
    import struct

    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    pos, idat, w, h = 8, b"", None, None
    while pos < len(png):
        ln = struct.unpack(">I", png[pos : pos + 4])[0]
        typ = png[pos + 4 : pos + 8]
        chunk = png[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR":
            w, h = struct.unpack(">II", chunk[:8])
        if typ == b"IDAT":
            idat += chunk
        pos += 12 + ln
    raw = zlib.decompress(idat)
    stride = w + 1
    rows = []
    for r in range(h):
        line = raw[r * stride : (r + 1) * stride]
        assert line[0] == 0  # filter: none
        rows.append(line[1:])
    return w, h, rows


def test_glyph_render_metrics_and_golden():
    """T11 glyph-box rendering (render_page_png): per-character AFM
    advances, word gaps, ascender/descender envelopes — structural
    checks plus an exact golden digest (the raster is deterministic)."""
    import hashlib

    from mcp_local_rag_spark.sources.pdf_mini import render_page_png

    data = build_pdf(
        [[(50.0, 700.0, 24.0, "Wide WAVE words"),
          (50.0, 650.0, 11.0, "illinois jilly iii"),
          (50.0, 600.0, 11.0, "two  spaced   words")]],
        title="G",
    )
    png = render_page_png(data, 0, {"x0": 40, "y0": 580, "x1": 400, "y1": 730},
                          dpi=100.0)
    w, h, rows = _decode_gray_png(png)
    assert (w, h) == (500, 208)

    def dark_cols(r0, r1):
        return {c for r in range(r0, r1) for c, v in enumerate(rows[r]) if v < 128}

    def runs(cols):
        """Contiguous dark-column runs (glyph/word blocks)."""
        out, cur = [], None
        for c in sorted(cols):
            if cur and c == cur[1] + 1:
                cur[1] = c
            else:
                cur = [c, c]
                out.append(cur)
        return out

    # row band of the 24pt line ("Wide WAVE words", baseline y=700):
    # x-height body spans y 700..712.5 -> rows ~24..41 in the 100dpi crop
    big = dark_cols(25, 40)
    assert big, "title line rendered"
    # word gaps: 3 words -> >= 3 separated blocks of >= 2px gap
    word_blocks = [r for r in runs(big) if r[1] - r[0] > 3]
    gaps = [b[0] - a[1] for a, b in zip(word_blocks, word_blocks[1:])]
    assert sum(1 for g in gaps if g >= 2) >= 2, (word_blocks, gaps)
    # proportional metrics: 'W' (944/1000 em) paints a wider glyph box
    # than 'i' (222/1000). Compare widest vs narrowest run on the 11pt
    # i-line vs the 24pt W-words line, scaled by size.
    iline = dark_cols(104, 110)  # baseline y=650 (row ~111), x-height top row ~103
    assert iline
    widest_big = max(r[1] - r[0] + 1 for r in runs(big))
    narrow_i = min(r[1] - r[0] + 1 for r in runs(iline))
    assert widest_big > narrow_i
    # descender: 'j'/'y' in "jilly" drop BELOW the 11pt baseline row
    base_row_650 = int(round((730 - 650) * 100 / 72))  # ~111
    assert dark_cols(base_row_650 + 1, base_row_650 + 3), "descenders painted"
    # golden digest: any change to metrics/envelope/painting shows up here
    assert hashlib.md5(png).hexdigest() == "847c6eb1ff1c6e84df21ffebe9524432"
