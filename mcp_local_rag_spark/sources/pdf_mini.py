"""Minimal pure-stdlib PDF text extractor + writer (S6 PDF decode).

Covers the subset of ISO 32000 needed to ingest digitally-born text PDFs
without pymupdf: object scanning (classic xref AND xref-stream files),
object streams (/ObjStm), FlateDecode, page-tree walk with inherited
MediaBox, and a text-state interpreter over content streams (BT/ET, Tf,
Td/TD/Tm/T*/TL, Tj/'/\"/TJ) emitting positioned items
(x, y, font_size, text) in PDF user space — y grows UP, exactly the
orientation operators/pdf_layout.py expects, so the T5/T6/T7 pipeline
(assembly, 2-stage header/footer strip, title chain) runs unchanged on
real bytes. The reference decodes with mupdf
(src/parser/pdf-extract.ts:112); this is an independent implementation
against the public PDF spec, not a port — when pymupdf IS importable the
fitz path takes precedence (sources/parsers.py).

Stream filters: FlateDecode (+PNG predictors), LZWDecode (TIFF-style,
EarlyChange), ASCIIHexDecode, ASCII85Decode, applied as chains in order.
Out of scope (explicit, not wrong): encrypted PDFs (raises), image-only
filters (DCT/JBIG2/CCITT — stream skipped), CID/Type0 composite fonts
with custom CMaps (bytes decode best-effort latin-1 / UTF-16BE), and
glyph-accurate advance widths (after a show the pen x advances by an
0.5-em-per-char estimate; items written by distinct Td/Tm positionings —
the overwhelmingly common layout — are exact).

``build_pdf`` is the matching writer: deterministic, Flate-compressed
content streams, classic xref, /Info /Title — used by the ingest tests
and the ``parsed_pdf_roundtrip`` oracle query to flow REAL .pdf bytes
through the whole pipeline.
"""

from __future__ import annotations

import re
import zlib

__all__ = ["extract_pdf_items", "parse_pdf_mini", "build_pdf", "PdfError"]


class PdfError(ValueError):
    pass


# ---------------------------------------------------------------------------
# object model: python primitives + Name / Ref wrappers


class Name(str):
    """A PDF name token (/Foo) — distinct from a string literal."""


class Ref(tuple):
    """Indirect reference (num, gen)."""

    def __new__(cls, num: int, gen: int):
        return super().__new__(cls, (num, gen))


_WHITESPACE = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Lexer:
    """Tokenizer over the body of a PDF object or content stream."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = d[self.pos]
            if c in _WHITESPACE:
                self.pos += 1
            elif c == 0x25:  # '%' comment to EOL
                while self.pos < n and d[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def peek_byte(self) -> int | None:
        self._skip_ws()
        return self.data[self.pos] if self.pos < len(self.data) else None

    def read_token(self) -> bytes | None:
        """Next raw token: delimiter pair starts, numbers, keywords."""
        self._skip_ws()
        d, n = self.data, len(self.data)
        if self.pos >= n:
            return None
        c = d[self.pos]
        if c == 0x3C:  # '<'
            if self.pos + 1 < n and d[self.pos + 1] == 0x3C:
                self.pos += 2
                return b"<<"
            self.pos += 1
            return b"<"
        if c == 0x3E and self.pos + 1 < n and d[self.pos + 1] == 0x3E:
            self.pos += 2
            return b">>"
        if c in b"[]{}()/":
            self.pos += 1
            return bytes([c])
        start = self.pos
        while self.pos < n and d[self.pos] not in _WHITESPACE and d[self.pos] not in _DELIM:
            self.pos += 1
        return d[start : self.pos]


_NUM_RE = re.compile(rb"^[+-]?(\d+\.?\d*|\.\d+)$")


def _decode_string(raw: bytes) -> str:
    if raw.startswith(b"\xfe\xff"):
        try:
            return raw[2:].decode("utf-16-be", errors="replace")
        except Exception:
            pass
    return raw.decode("latin-1", errors="replace")


class _Parser(_Lexer):
    """Recursive-descent parser for PDF objects (dicts, arrays, strings,
    names, numbers, refs, booleans, null)."""

    def parse_object(self):
        tok = self.read_token()
        if tok is None:
            raise PdfError("unexpected EOF")
        if tok == b"<<":
            return self._parse_dict()
        if tok == b"[":
            return self._parse_array()
        if tok == b"(":
            return self._parse_literal_string()
        if tok == b"<":
            return self._parse_hex_string()
        if tok == b"/":
            return Name(self._parse_name())
        if tok == b"true":
            return True
        if tok == b"false":
            return False
        if tok == b"null":
            return None
        if _NUM_RE.match(tok):
            # try "N G R" indirect reference
            save = self.pos
            t2 = self.read_token()
            if t2 is not None and t2.isdigit():
                t3 = self.read_token()
                if t3 == b"R":
                    return Ref(int(tok), int(t2))
            self.pos = save
            return float(tok) if b"." in tok else int(tok)
        raise PdfError(f"unexpected token {tok!r}")

    def _parse_name(self) -> str:
        d, n = self.data, len(self.data)
        start = self.pos
        while self.pos < n and d[self.pos] not in _WHITESPACE and d[self.pos] not in _DELIM:
            self.pos += 1
        raw = d[start : self.pos]
        # #xx hex escapes in names
        return re.sub(
            rb"#([0-9A-Fa-f]{2})", lambda m: bytes([int(m.group(1), 16)]), raw
        ).decode("latin-1")

    def _parse_dict(self) -> dict:
        out: dict = {}
        while True:
            tok = self.read_token()
            if tok == b">>":
                return out
            if tok != b"/":
                raise PdfError(f"dict key must be a name, got {tok!r}")
            key = self._parse_name()
            out[key] = self.parse_object()

    def _parse_array(self) -> list:
        out = []
        while True:
            if self.peek_byte() == 0x5D:  # ']'
                self.pos += 1
                return out
            out.append(self.parse_object())

    def _parse_literal_string(self) -> str:
        d, n = self.data, len(self.data)
        depth, buf = 1, bytearray()
        while self.pos < n:
            c = d[self.pos]
            self.pos += 1
            if c == 0x5C:  # backslash
                if self.pos >= n:
                    break
                e = d[self.pos]
                self.pos += 1
                mapped = {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}.get(e)
                if mapped is not None:
                    buf.append(mapped)
                elif e in b"()\\":
                    buf.append(e)
                elif e in b"01234567":  # octal up to 3 digits
                    oct_digits = chr(e)
                    for _ in range(2):
                        if self.pos < n and d[self.pos] in b"01234567":
                            oct_digits += chr(d[self.pos])
                            self.pos += 1
                    buf.append(int(oct_digits, 8) & 0xFF)
                elif e in b"\r\n":  # line continuation
                    if e == 0x0D and self.pos < n and d[self.pos] == 0x0A:
                        self.pos += 1
                else:
                    buf.append(e)
            elif c == 0x28:  # '('
                depth += 1
                buf.append(c)
            elif c == 0x29:  # ')'
                depth -= 1
                if depth == 0:
                    return _decode_string(bytes(buf))
                buf.append(c)
            else:
                buf.append(c)
        raise PdfError("unterminated string")

    def _parse_hex_string(self) -> str:
        d, n = self.data, len(self.data)
        hex_chars = []
        while self.pos < n and d[self.pos] != 0x3E:  # '>'
            c = d[self.pos]
            if c not in _WHITESPACE:
                hex_chars.append(chr(c))
            self.pos += 1
        self.pos += 1
        if len(hex_chars) % 2:
            hex_chars.append("0")
        return _decode_string(bytes.fromhex("".join(hex_chars)))


# ---------------------------------------------------------------------------
# document structure

_OBJ_HEAD_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_STREAM_RE = re.compile(rb"stream\r?\n")


class _Doc:
    def __init__(self, objects: dict, trailer: dict):
        self.objects = objects
        self.trailer = trailer

    def resolve(self, obj, depth: int = 0):
        while isinstance(obj, Ref) and depth < 32:
            obj = self.objects.get(obj[0], (None, None))[0]
            depth += 1
        return obj


def _scan_objects(data: bytes) -> dict[int, tuple[object, bytes | None]]:
    """All `N G obj ... endobj` bodies, later definitions winning (matches
    incremental-update append order). Values are (parsed_value, raw_stream)."""
    objects: dict[int, tuple[object, bytes | None]] = {}
    # `resume` skips header matches that begin INSIDE a previous object's
    # stream bytes: compressed data can coincidentally contain b'N G obj',
    # and such a false match would clobber the real object N
    resume = 0
    for m in _OBJ_HEAD_RE.finditer(data):
        if m.start() < resume:
            continue
        num = int(m.group(1))
        body_start = m.end()
        end = data.find(b"endobj", body_start)
        if end == -1:
            end = len(data)
        body = data[body_start:end]
        resume = end + 6
        sm = _STREAM_RE.search(body)
        stream = None
        if sm:
            dict_part = body[: sm.start()]
            try:
                value = _Parser(dict_part).parse_object()
            except PdfError:
                continue
            # a direct /Length slices exactly (never eats checksum bytes
            # that happen to end in \r\n); indirect/absent falls back to
            # the endstream keyword
            length = value.get("Length") if isinstance(value, dict) else None
            if isinstance(length, int):
                # absolute slice from the full buffer: a compressed stream
                # can coincidentally contain b"endobj", truncating `body`
                abs_start = body_start + sm.end()
                stream = data[abs_start : abs_start + length]
                resume = max(resume, abs_start + length)
            else:
                s_end = body.rfind(b"endstream")
                if s_end == -1:
                    s_end = len(body)
                stream = body[sm.end() : s_end].rstrip(b"\r\n")
            objects[num] = (value, stream)
            continue
        try:
            value = _Parser(body).parse_object()
        except PdfError:
            continue
        objects[num] = (value, stream)
    return objects


def _lzw_decode(data: bytes, early_change: int = 1) -> bytes:
    """TIFF-style LZW per the PDF spec: MSB-first codes, 9→12 bit widths,
    CLEAR=256, EOD=257, EarlyChange widens one code early (the default)."""
    out = bytearray()
    table: dict[int, bytes] = {i: bytes([i]) for i in range(256)}
    next_code, width = 258, 9
    bitbuf = bitcnt = 0
    prev: int | None = None
    for byte in data:
        bitbuf = (bitbuf << 8) | byte
        bitcnt += 8
        while bitcnt >= width:
            code = (bitbuf >> (bitcnt - width)) & ((1 << width) - 1)
            bitcnt -= width
            if code == 256:
                table = {i: bytes([i]) for i in range(256)}
                next_code, width, prev = 258, 9, None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code in table:
                entry = table[code]
            else:  # KwKwK case
                entry = table[prev] + table[prev][:1]
            out += entry
            if prev is not None:
                table[next_code] = table[prev] + entry[:1]
                next_code += 1
            prev = code
            # the decoder's table lags the encoder's by one entry, so it
            # widens one code earlier in its own next_code terms
            if next_code + early_change >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def _ascii_hex_decode(data: bytes) -> bytes:
    body = data.split(b">", 1)[0]
    hexstr = b"".join(body.split())
    if len(hexstr) % 2:
        hexstr += b"0"
    return bytes.fromhex(hexstr.decode("ascii"))


def _ascii85_decode(data: bytes) -> bytes:
    import base64

    body = b"".join(data.split())
    if body.endswith(b"~>"):
        body = body[:-2]
    return base64.a85decode(b"<~" + body + b"~>", adobe=True)


def _decode_stream(doc: _Doc, meta: dict, raw: bytes) -> bytes | None:
    filt = doc.resolve(meta.get("Filter"))
    filters = filt if isinstance(filt, list) else ([filt] if filt else [])
    parms_raw = doc.resolve(meta.get("DecodeParms"))
    parms_list = parms_raw if isinstance(parms_raw, list) else [parms_raw] * len(filters)
    out = raw
    for f, parms in zip(filters, parms_list):
        f = doc.resolve(f)
        parms = doc.resolve(parms)
        try:
            if f == "FlateDecode":
                try:
                    out = zlib.decompress(out)
                except zlib.error:  # tolerate trailing garbage
                    out = zlib.decompressobj().decompress(out)
            elif f == "LZWDecode":
                ec = 1
                if isinstance(parms, dict):
                    ec = int(doc.resolve(parms.get("EarlyChange", 1)))
                out = _lzw_decode(out, early_change=ec)
            elif f == "ASCIIHexDecode":
                out = _ascii_hex_decode(out)
            elif f == "ASCII85Decode":
                out = _ascii85_decode(out)
            elif f is None:
                continue
            else:
                return None  # unsupported filter (DCT/JBIG2/...) — explicit skip
        except Exception:
            return None
        if f in ("FlateDecode", "LZWDecode") and isinstance(parms, dict):
            if doc.resolve(parms.get("Predictor", 1)) not in (None, 1):
                out = _unpredict(out, parms, doc)
    return out


def _unpredict(data: bytes, parms: dict, doc: _Doc) -> bytes:
    """PNG Up/Sub/Paeth predictors (used by xref/object streams)."""
    predictor = int(doc.resolve(parms.get("Predictor", 1)))
    if predictor < 10:
        return data
    columns = int(doc.resolve(parms.get("Columns", 1)))
    colors = int(doc.resolve(parms.get("Colors", 1)))
    bpc = int(doc.resolve(parms.get("BitsPerComponent", 8)))
    bpp = max(1, colors * bpc // 8)
    row_len = columns * bpp
    out = bytearray()
    prev = bytearray(row_len)
    pos = 0
    while pos + 1 + row_len <= len(data):
        ft = data[pos]
        row = bytearray(data[pos + 1 : pos + 1 + row_len])
        pos += 1 + row_len
        if ft == 1:  # Sub
            for i in range(bpp, row_len):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(row_len):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(row_len):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + (left + prev[i]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(row_len):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        out += row
        prev = row
    return bytes(out)


def _expand_object_streams(doc: _Doc) -> None:
    """Pull objects embedded in /ObjStm streams into the object map
    (how xref-stream PDFs store most of their bodies)."""
    for num in list(doc.objects):
        value, raw = doc.objects[num]
        if not (isinstance(value, dict) and value.get("Type") == "ObjStm" and raw):
            continue
        decoded = _decode_stream(doc, value, raw)
        if decoded is None:
            continue
        n = int(doc.resolve(value.get("N", 0)))
        first = int(doc.resolve(value.get("First", 0)))
        header = _Lexer(decoded[:first])
        pairs = []
        for _ in range(n):
            a, b = header.read_token(), header.read_token()
            if a is None or b is None:
                break
            pairs.append((int(a), int(b)))
        for obj_num, offset in pairs:
            if obj_num in doc.objects:
                continue  # top-level definition wins
            try:
                obj = _Parser(decoded, first + offset).parse_object()
            except PdfError:
                continue
            doc.objects[obj_num] = (obj, None)


def _load(data: bytes) -> _Doc:
    objects = _scan_objects(data)
    if not objects:
        raise PdfError("no PDF objects found")
    # trailer dict(s): classic files; xref-stream files carry /Root on the
    # /Type /XRef stream dict instead
    trailer: dict = {}
    for m in re.finditer(rb"trailer\b", data):
        try:
            t = _Parser(data, m.end()).parse_object()
        except PdfError:
            continue
        if isinstance(t, dict):
            trailer.update(t)
    doc = _Doc(objects, trailer)
    if "Root" not in trailer:
        for num, (value, _s) in objects.items():
            if isinstance(value, dict) and value.get("Type") == "XRef":
                trailer.update({k: v for k, v in value.items() if k in ("Root", "Info")})
    if "Encrypt" in trailer:
        raise PdfError("encrypted PDF not supported")
    _expand_object_streams(doc)
    return doc


def _find_catalog(doc: _Doc) -> dict:
    cat = doc.resolve(doc.trailer.get("Root"))
    if isinstance(cat, dict) and "Pages" in cat:
        return cat
    for _num, (value, _s) in doc.objects.items():
        if isinstance(value, dict) and value.get("Type") == "Catalog":
            return value
    raise PdfError("no document catalog")


_INHERITABLE = ("MediaBox", "Resources", "Rotate")


def _walk_pages(doc: _Doc, node, inherited: dict, out: list, depth: int = 0) -> None:
    node = doc.resolve(node)
    if not isinstance(node, dict) or depth > 64:
        return
    inh = dict(inherited)
    for k in _INHERITABLE:
        if k in node:
            inh[k] = node[k]
    if node.get("Type") == "Page" or ("Contents" in node and "Kids" not in node):
        out.append({**inh, **node})
        return
    for kid in doc.resolve(node.get("Kids")) or []:
        _walk_pages(doc, kid, inh, out, depth + 1)


# ---------------------------------------------------------------------------
# content-stream text interpreter

_ID6 = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)


def _mat_mul(m1, m2):
    a1, b1, c1, d1, e1, f1 = m1
    a2, b2, c2, d2, e2, f2 = m2
    return (
        a1 * a2 + b1 * c2,
        a1 * b2 + b1 * d2,
        c1 * a2 + d1 * c2,
        c1 * b2 + d1 * d2,
        e1 * a2 + f1 * c2 + e2,
        e1 * b2 + f1 * d2 + f2,
    )


# word-gap heuristic for TJ kerning adjustments (thousandths of an em):
# a reverse displacement beyond this inserts a space
_TJ_WORD_GAP = 180.0


def _interpret_text(
    content: bytes, image_names: frozenset[str] = frozenset()
) -> tuple[list[dict], list[dict]]:
    """Run the text-state machine over one page's content; emit
    ({x, y, font_size, text, font} items — one per show that produced
    glyphs — and {kind, x0, y0, x1, y1} BLOCKS: image XObject placements
    (unit square through the CTM) and path-paint strokes, the T10
    visual-candidate detector's input)."""
    lex = _Parser(content)
    items: list[dict] = []
    blocks: list[dict] = []
    stack: list = []
    tm = lm = _ID6
    ctm = _ID6
    gs_stack: list = []
    font_size = 0.0
    font_name = None  # active /Fn resource name (glyph-metric lookup)
    leading = 0.0

    def eff():
        m = _mat_mul(tm, ctm)
        # vertical text scale: the y-axis unit vector maps to (c, d) under
        # the row-vector convention, so the factor is sqrt(c^2 + d^2) —
        # using b (m[1]) instead would inflate sheared/skewed text and let
        # a decorative item out-size the real max-font title
        scale = (m[2] ** 2 + m[3] ** 2) ** 0.5
        return m[4], m[5], round(font_size * scale, 3)

    def show(text: str):
        nonlocal tm
        if not text:
            return
        x, y, size = eff()
        items.append(
            {
                "x": round(x, 3),
                "y": round(y, 3),
                "font_size": size,
                "text": text,
                "font": font_name,
            }
        )
        # crude advance: 0.5 em per char — keeps multiple shows on one
        # line ordered left-to-right even without glyph metrics
        tm = _mat_mul((1, 0, 0, 1, 0.5 * font_size * len(text), 0), tm)

    data, n = lex.data, len(lex.data)
    while True:
        lex._skip_ws()
        if lex.pos >= n:
            break
        c = data[lex.pos]
        if c in b"[(</+-.0123456789":
            try:
                stack.append(lex.parse_object())
            except PdfError:
                lex.pos += 1
            continue
        tok = lex.read_token()
        if tok is None:
            break
        op = tok.decode("latin-1", errors="replace")
        try:
            if op == "BT":
                tm = lm = _ID6
            elif op == "ET":
                pass
            elif op == "Tf" and len(stack) >= 2:
                font_size = float(stack[-1])
                if isinstance(stack[-2], str):
                    font_name = str(stack[-2])
            elif op == "TL" and stack:
                leading = float(stack[-1])
            elif op == "Td" and len(stack) >= 2:
                lm = _mat_mul((1, 0, 0, 1, float(stack[-2]), float(stack[-1])), lm)
                tm = lm
            elif op == "TD" and len(stack) >= 2:
                leading = -float(stack[-1])
                lm = _mat_mul((1, 0, 0, 1, float(stack[-2]), float(stack[-1])), lm)
                tm = lm
            elif op == "Tm" and len(stack) >= 6:
                lm = tm = tuple(float(v) for v in stack[-6:])
            elif op == "T*":
                lm = _mat_mul((1, 0, 0, 1, 0.0, -leading), lm)
                tm = lm
            elif op == "Tj" and stack:
                show(str(stack[-1]))
            elif op == "'" and stack:
                lm = _mat_mul((1, 0, 0, 1, 0.0, -leading), lm)
                tm = lm
                show(str(stack[-1]))
            elif op == '"' and len(stack) >= 3:
                lm = _mat_mul((1, 0, 0, 1, 0.0, -leading), lm)
                tm = lm
                show(str(stack[-1]))
            elif op == "TJ" and stack and isinstance(stack[-1], list):
                parts: list[str] = []
                for el in stack[-1]:
                    if isinstance(el, str):
                        parts.append(el)
                    elif isinstance(el, (int, float)) and el < -_TJ_WORD_GAP:
                        parts.append(" ")
                show("".join(parts))
            elif op == "q":
                gs_stack.append(ctm)
            elif op == "Q":
                ctm = gs_stack.pop() if gs_stack else _ID6
            elif op == "cm" and len(stack) >= 6:
                ctm = _mat_mul(tuple(float(v) for v in stack[-6:]), ctm)
            elif op == "Do" and stack:
                nm = stack[-1]
                if isinstance(nm, str) and str(nm) in image_names:
                    # image placement: the unit square through the CTM
                    a_, b_, c_, d_, e_, f_ = ctm
                    xs = (e_, a_ + e_, c_ + e_, a_ + c_ + e_)
                    ys = (f_, b_ + f_, d_ + f_, b_ + d_ + f_)
                    blocks.append(
                        {
                            "kind": "image",
                            "x0": round(min(xs), 3),
                            "y0": round(min(ys), 3),
                            "x1": round(max(xs), 3),
                            "y1": round(max(ys), 3),
                        }
                    )
            elif op in ("S", "s", "f", "F", "f*", "B", "B*", "b", "b*"):
                # one path-paint = one vector stroke (the detector only
                # COUNTS strokes; coordinates are not consumed)
                blocks.append(
                    {"kind": "stroke", "x0": 0.0, "y0": 0.0, "x1": 0.0, "y1": 0.0}
                )
            elif op == "BI":
                # inline image: skip to EI
                ei = data.find(b"\nEI", lex.pos)
                lex.pos = (ei + 3) if ei != -1 else n
        except (TypeError, ValueError):
            pass
        stack.clear()
    return items, blocks


# ---------------------------------------------------------------------------
# public API


def extract_pdf_items(content: bytes) -> tuple[list[dict], str | None]:
    """bytes -> (pages, metadata_title). Each page:
    {"page": int, "page_height": float, "items": [{x, y, font_size, text}]}
    — the exact shape operators/pdf_layout.py consumes (y grows up)."""
    doc = _load(content)
    catalog = _find_catalog(doc)
    page_nodes: list[dict] = []
    _walk_pages(doc, catalog.get("Pages"), {}, page_nodes)
    pages = []
    for pno, node in enumerate(page_nodes):
        media = doc.resolve(node.get("MediaBox")) or [0, 0, 612, 792]
        height = float(doc.resolve(media[3])) - float(doc.resolve(media[1]))
        width = float(doc.resolve(media[2])) - float(doc.resolve(media[0]))
        contents = doc.resolve(node.get("Contents"))
        parts: list[bytes] = []
        for ref in contents if isinstance(contents, list) else [node.get("Contents")]:
            if isinstance(ref, Ref):
                meta, raw = doc.objects.get(ref[0], (None, None))
            else:
                meta, raw = doc.resolve(ref), None
            if raw is None and isinstance(ref, Ref):
                continue
            if isinstance(meta, dict) and raw is not None:
                decoded = _decode_stream(doc, meta, raw)
                if decoded is not None:
                    parts.append(decoded)
        # image XObject names: a /Do of one of these is an image placement
        img_names = set()
        res = doc.resolve(node.get("Resources"))
        xdict = doc.resolve(res.get("XObject")) if isinstance(res, dict) else None
        if isinstance(xdict, dict):
            for xname, xref in xdict.items():
                xobj = doc.resolve(xref)
                if isinstance(xobj, dict) and str(
                    doc.resolve(xobj.get("Subtype")) or ""
                ) == "Image":
                    img_names.add(str(xname))
        items, blocks = (
            _interpret_text(b"\n".join(parts), frozenset(img_names))
            if parts
            else ([], [])
        )
        # per-page font metrics for the glyph renderer: embedded /Widths
        # arrays (simple TrueType/Type1 fonts) keyed by resource name,
        # plus the /BaseFont for the built-in AFM fallback
        fonts: dict[str, dict] = {}
        fdict = doc.resolve(res.get("Font")) if isinstance(res, dict) else None
        if isinstance(fdict, dict):
            for fname, fref in fdict.items():
                fobj = doc.resolve(fref)
                if not isinstance(fobj, dict):
                    continue
                widths = doc.resolve(fobj.get("Widths"))
                entry: dict = {"base": str(doc.resolve(fobj.get("BaseFont")) or "")}
                if isinstance(widths, list):
                    try:
                        entry["first"] = int(doc.resolve(fobj.get("FirstChar")) or 0)
                        entry["widths"] = [
                            float(doc.resolve(w)) for w in widths
                        ]
                    except (TypeError, ValueError):
                        pass
                fonts[str(fname)] = entry
        pages.append(
            {
                "page": pno,
                "page_height": height,
                "page_width": width,
                "items": items,
                "fonts": fonts,
                "blocks": blocks,
            }
        )
    info = doc.resolve(doc.trailer.get("Info"))
    meta_title = None
    if isinstance(info, dict):
        t = doc.resolve(info.get("Title"))
        if isinstance(t, str):
            meta_title = t
    return pages, meta_title


def parse_pdf_mini(path: str, content: bytes, *, dim: int = 64) -> dict:
    """Full S6 PDF parse without pymupdf: stdlib extraction feeding the
    T5 stage-1+2 strip and the T7 title chain — same return contract as
    parse_pdf_with_fitz ({text, title, atomic_ranges})."""
    from ..embedder import pseudo_embed
    from ..operators.pdf_layout import (
        extract_pdf_title,
        filter_page_boundary_sentences,
    )

    pages, meta_title = extract_pdf_items(content)

    def _embed(sentences):
        return [pseudo_embed(s, dim) for s in sentences]

    page_texts = filter_page_boundary_sentences(pages, _embed)
    text = "\n\n".join(t for t in page_texts if t)
    first_items = pages[0]["items"] if pages else []
    font_hint = max(first_items, key=lambda i: i["font_size"]) if first_items else None
    title = extract_pdf_title(
        meta_title,
        page_texts[0].strip() if page_texts else None,
        path.rsplit("/", 1)[-1],
        {"text": font_hint["text"], "font_size": font_hint["font_size"]}
        if font_hint
        else None,
    )
    return {"text": text, "title": title, "atomic_ranges": []}


# ---------------------------------------------------------------------------
# T11 geometry renderer: rasterize a page's text boxes into a real PNG
# (stdlib struct+zlib). Glyph-accurate rendering needs pymupdf; this mini
# renderer produces an actual image of the page LAYOUT from real bytes —
# enough for the T10->T12 pipeline (crop math, batch shapes, captioner
# input contract) to run end-to-end without any imaging library.


def _png_gray(pixels: bytearray, width: int, height: int) -> bytes:
    """8-bit grayscale PNG from a row-major pixel buffer."""
    import struct

    def chunk(tag: bytes, payload: bytes) -> bytes:
        body = tag + payload
        return (
            struct.pack(">I", len(payload))
            + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    raw = b"".join(
        b"\x00" + bytes(pixels[y * width : (y + 1) * width]) for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


# Adobe AFM advance widths for the Helvetica base-14 font, 1/1000 em,
# chars 0x20-0x7E (public Adobe Font Metrics data). Helvetica is both the
# writer's font and the overwhelmingly common sans default; Courier is
# fixed 600; everything unknown falls back to 500.
_HELVETICA_WIDTHS = [
    278, 278, 355, 556, 556, 889, 667, 191, 333, 333, 389, 584, 278, 333,
    278, 278, 556, 556, 556, 556, 556, 556, 556, 556, 556, 556, 278, 278,
    584, 584, 584, 556, 1015, 667, 667, 722, 722, 667, 611, 778, 722, 278,
    500, 667, 556, 833, 722, 778, 667, 778, 722, 667, 611, 722, 667, 944,
    667, 667, 611, 278, 278, 278, 469, 556, 333, 556, 556, 500, 556, 556,
    278, 556, 556, 222, 222, 500, 222, 833, 556, 556, 556, 556, 333, 500,
    278, 556, 500, 722, 500, 500, 500, 334, 260, 334, 584,
]
# Helvetica vertical metrics (AFM): cap height 718, x-height 523,
# descender -207 — the glyph-box envelope below.
_ASCENT, _XHEIGHT, _DESCENT = 0.718, 0.523, 0.207
_ASCENDERS = set("bdfhklt" + "".join(chr(c) for c in range(0x21, 0x61)))
_DESCENDERS = set("gjpqy")


def _advance_fn(font: dict | None):
    """Per-char advance (em fraction) for one font resource: embedded
    /Widths array when the PDF carries one, else the base-font AFM table
    (Helvetica family / Courier), else a 0.5-em estimate."""
    widths, first = None, 0
    base = ""
    if font:
        widths, first = font.get("widths"), int(font.get("first", 0))
        base = (font.get("base") or "").lower()

    def adv(ch: str) -> float:
        code = ord(ch)
        if widths is not None and first <= code < first + len(widths):
            w = widths[code - first]
            if w > 0:
                return w / 1000.0
        if "courier" in base or "mono" in base:
            return 0.6
        if 0x20 <= code <= 0x7E:
            return _HELVETICA_WIDTHS[code - 0x20] / 1000.0
        return 0.5

    return adv


def render_page_png(
    doc_bytes: bytes,
    page_num: int,
    crop: dict | None = None,
    *,
    dpi: float = 200.0,
) -> bytes:
    """Rasterize one page (optionally cropped to {x0,y0,x1,y1} in PDF
    points, y up) at ``dpi`` on a white canvas. Returns real PNG bytes.

    GLYPH-box rendering (not one slab per show): the pen advances per
    character by its real metric — the embedded /Widths array when the
    font dict carries one, Adobe AFM Helvetica/Courier tables otherwise —
    and each non-space glyph paints its own box with the font's vertical
    envelope (x-height body, ascender/cap extension, descender drop) and
    an inter-glyph gap. Word spacing, proportional widths, and line
    texture therefore survive into the raster, which is what the caption
    stage actually consumes (the reference renders real pixmaps via
    mupdf, src/pdf-visual/renderer.ts:29-87; pymupdf takes precedence
    here too when importable — operators/multimodal.py)."""
    pages, _ = extract_pdf_items(doc_bytes)
    if not 0 <= page_num < len(pages):
        raise PdfError(f"page {page_num} out of range")
    page = pages[page_num]
    page_h = float(page["page_height"])
    region = crop or {"x0": 0.0, "y0": 0.0, "x1": float(page["page_width"]), "y1": page_h}
    x0, y0 = float(region["x0"]), float(region["y0"])
    x1, y1 = float(region["x1"]), float(region["y1"])
    scale = dpi / 72.0
    width = max(1, int(round((x1 - x0) * scale)))
    height = max(1, int(round((y1 - y0) * scale)))
    pixels = bytearray(b"\xff" * (width * height))
    fonts = page.get("fonts") or {}

    def paint(bx0: float, by0: float, bx1: float, by1: float, shade: int):
        # clip to the crop region, then to pixel space (PNG rows top-down)
        cx0, cx1 = max(bx0, x0), min(bx1, x1)
        cy0, cy1 = max(by0, y0), min(by1, y1)
        if cx0 >= cx1 or cy0 >= cy1:
            return
        px0 = max(0, int((cx0 - x0) * scale))
        px1 = min(width, max(px0 + 1, int(round((cx1 - x0) * scale))))
        py0 = max(0, int((y1 - cy1) * scale))
        py1 = min(height, max(py0 + 1, int(round((y1 - cy0) * scale))))
        run = bytes([shade]) * (px1 - px0)
        for row in range(py0, py1):
            base = row * width
            pixels[base + px0 : base + px1] = run

    for it in page["items"]:
        size = float(it["font_size"]) or 10.0
        adv = _advance_fn(fonts.get(it.get("font")))
        pen = float(it["x"])
        base_y = float(it["y"])
        for ch in it["text"]:
            a = adv(ch) * size
            if not ch.isspace():
                top = base_y + (_ASCENT if ch in _ASCENDERS else _XHEIGHT) * size
                bottom = base_y - (_DESCENT * size if ch in _DESCENDERS else 0.0)
                # 8% side bearing keeps glyph boxes visually separate
                paint(pen + 0.08 * a, bottom, pen + 0.92 * a, top, 0x20)
            pen += a
    return _png_gray(pixels, width, height)


# ---------------------------------------------------------------------------
# writer (fixtures + oracle queries)


def _esc_literal(s: str) -> bytes:
    return (
        s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    ).encode("latin-1", errors="replace")


def build_pdf(
    pages: list[list[tuple[float, float, float, str]]],
    *,
    title: str | None = None,
    page_width: float = 612.0,
    page_height: float = 792.0,
    compress: bool = True,
    images: list[list[tuple[float, float, float, float]]] | None = None,
    strokes: list[int] | None = None,
) -> bytes:
    """Deterministic single-font PDF: ``pages`` is a list of pages, each a
    list of (x, y, font_size, text) items (y grows up from the bottom-left
    origin, PDF user space). Content streams are Flate-compressed by
    default so the parser's decode path is exercised; classic xref +
    trailer, /Info /Title when given.

    ``images``: per-page (x, y, w, h) placements of a shared 1x1 gray
    /Image XObject (`q w 0 0 h x y cm /Im0 Do Q`) and ``strokes``:
    per-page count of stroked rectangles — together they let tests build
    REAL figure pages for the T10 detector and the visual pipeline."""
    objects: list[bytes] = []  # bodies, 1-indexed

    def add(body: bytes) -> int:
        objects.append(body)
        return len(objects)

    font_num = add(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>"
    )
    image_num = None
    if images and any(images):
        image_num = add(
            b"<< /Type /XObject /Subtype /Image /Width 1 /Height 1"
            b" /ColorSpace /DeviceGray /BitsPerComponent 8 /Length 1 >>"
            b"\nstream\n\x80\nendstream"
        )
    page_nums: list[int] = []
    content_nums: list[int] = []
    for pno, items in enumerate(pages):
        ops = [b"BT"]
        for x, y, size, text in items:
            ops.append(
                b"/F1 %.2f Tf 1 0 0 1 %.2f %.2f Tm (%s) Tj"
                % (size, x, y, _esc_literal(text))
            )
        ops.append(b"ET")
        for x, y, w, h in (images[pno] if images and pno < len(images) else ()):
            ops.append(b"q %.2f 0 0 %.2f %.2f %.2f cm /Im0 Do Q" % (w, h, x, y))
        for i in range(strokes[pno] if strokes and pno < len(strokes) else 0):
            ops.append(
                b"%.2f %.2f 40 20 re S" % (20.0 + 5 * i, 30.0 + 5 * i)
            )
        stream = b"\n".join(ops)
        if compress:
            stream = zlib.compress(stream)
            head = b"<< /Length %d /Filter /FlateDecode >>" % len(stream)
        else:
            head = b"<< /Length %d >>" % len(stream)
        content_nums.append(add(head + b"\nstream\n" + stream + b"\nendstream"))

    pages_num = len(objects) + len(pages) + 1  # page objects then the tree node
    xobj = (
        b" /XObject << /Im0 %d 0 R >>" % image_num if image_num is not None else b""
    )
    for cn in content_nums:
        page_nums.append(
            add(
                b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 %.2f %.2f]"
                b" /Resources << /Font << /F1 %d 0 R >>%s >> /Contents %d 0 R >>"
                % (pages_num, page_width, page_height, font_num, xobj, cn)
            )
        )
    kids = b" ".join(b"%d 0 R" % p for p in page_nums)
    tree_num = add(
        b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, len(page_nums))
    )
    if tree_num != pages_num:
        raise AssertionError(f"page tree numbering drifted: {tree_num} != {pages_num}")
    catalog_num = add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages_num)
    info_num = None
    if title is not None:
        info_num = add(b"<< /Title (%s) >>" % _esc_literal(title))

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (len(objects) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    trailer = b"<< /Size %d /Root %d 0 R" % (len(objects) + 1, catalog_num)
    if info_num is not None:
        trailer += b" /Info %d 0 R" % info_num
    trailer += b" >>"
    out += b"trailer\n" + trailer + b"\nstartxref\n%d\n%%%%EOF\n" % xref_pos
    return bytes(out)
