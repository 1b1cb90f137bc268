"""DOCX (zipfile+ElementTree) and HTML (html.parser) parser semantics,
mirroring the reference's block-walker and Readability/Turndown behavior
(src/parser/docx-parser.ts, src/parser/html-parser.ts)."""

from __future__ import annotations

import io
import zipfile

import pytest

from mcp_local_rag_spark.chunking.splitter import split_sentence_units
from mcp_local_rag_spark.sources.docx import filename_title, parse_docx_bytes
from mcp_local_rag_spark.sources.html import parse_html_text

W = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'


def _p(text: str, style: str | None = None, num: bool = False) -> str:
    ppr = ""
    if style or num:
        ppr = "<w:pPr>"
        if style:
            ppr += f'<w:pStyle w:val="{style}"/>'
        if num:
            ppr += '<w:numPr><w:ilvl w:val="0"/><w:numId w:val="1"/></w:numPr>'
        ppr += "</w:pPr>"
    return f"<w:p>{ppr}<w:r><w:t>{text}</w:t></w:r></w:p>"


def _tc(text: str, span: int = 1) -> str:
    pr = f'<w:tcPr><w:gridSpan w:val="{span}"/></w:tcPr>' if span > 1 else ""
    return f"<w:tc>{pr}{_p(text)}</w:tc>"


def _tbl(rows: list[list[str]]) -> str:
    trs = "".join(f"<w:tr>{''.join(_tc(c) for c in row)}</w:tr>" for row in rows)
    return f"<w:tbl>{trs}</w:tbl>"


def make_docx(body_xml: str, core_title: str | None = None) -> bytes:
    doc = (
        f'<?xml version="1.0"?><w:document {W}><w:body>{body_xml}</w:body></w:document>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", doc)
        if core_title is not None:
            zf.writestr(
                "docProps/core.xml",
                '<?xml version="1.0"?>'
                '<cp:coreProperties xmlns:cp="http://schemas.openxmlformats.org/'
                'package/2006/metadata/core-properties" '
                'xmlns:dc="http://purl.org/dc/elements/1.1/">'
                f"<dc:title>{core_title}</dc:title></cp:coreProperties>",
            )
    return buf.getvalue()


# ---------------------------------------------------------------------------
# DOCX


def test_docx_paragraphs_and_title_chain():
    data = make_docx(_p("The Heading", style="Heading1") + _p("Body paragraph one."))
    out = parse_docx_bytes("/x/report-file.docx", data)
    assert out["text"] == "The Heading\n\nBody paragraph one."
    assert out["title"] == "The Heading"  # no core title -> first Heading1
    assert out["atomic_ranges"] == []


def test_docx_core_title_wins():
    data = make_docx(_p("H", style="Heading1"), core_title="  Core   Title ")
    out = parse_docx_bytes("/x/a.docx", data)
    assert out["title"] == "Core Title"  # whitespace-normalized


def test_docx_filename_fallback_replaces_separators():
    data = make_docx(_p("plain body"))
    out = parse_docx_bytes("/x/my-q3_report.docx", data)
    assert out["title"] == "my q3 report"
    assert filename_title("a_b-c.txt") == "a b c"


def test_docx_table_rows_become_atomic_blocks():
    body = _p("Intro paragraph.") + _tbl(
        [["Name", "Role"], ["Ada", "Engineer"], ["Grace", "Admiral"]]
    )
    out = parse_docx_bytes("/x/t.docx", make_docx(body))
    text = out["text"]
    assert "Name: Ada\nRole: Engineer" in text
    assert "Name: Grace\nRole: Admiral" in text
    # atomic ranges cover exactly the two row blocks
    spans = [text[s:e] for s, e in out["atomic_ranges"]]
    assert spans == ["Name: Ada\nRole: Engineer", "Name: Grace\nRole: Admiral"]


def test_docx_empty_header_cells_get_column_names():
    out = parse_docx_bytes(
        "/x/t.docx", make_docx(_tbl([["", "B"], ["1", "2"]]))
    )
    assert "Column 1: 1\nB: 2" in out["text"]


def test_docx_spanning_table_flattens_non_atomic():
    trs = (
        f"<w:tr>{_tc('Merged', span=2)}</w:tr>"
        f"<w:tr>{_tc('a')}{_tc('b')}</w:tr>"
    )
    out = parse_docx_bytes("/x/t.docx", make_docx(f"<w:tbl>{trs}</w:tbl>"))
    assert out["atomic_ranges"] == []
    assert out["text"] == "Merged a b"


def test_docx_single_row_table_flattens():
    out = parse_docx_bytes("/x/t.docx", make_docx(_tbl([["only", "row"]])))
    assert out["atomic_ranges"] == []
    assert out["text"] == "only row"


def test_docx_list_paragraphs_group_into_one_block():
    body = _p("first item", num=True) + _p("second item", num=True) + _p("After.")
    out = parse_docx_bytes("/x/l.docx", make_docx(body))
    assert out["text"] == "first item\nsecond item\n\nAfter."


# ---------------------------------------------------------------------------
# atomic sentence units (T2)


def test_split_units_atomic_bypass():
    text = "A first sentence. Then another.\n\nName: Ada\nRole: Eng\n\nTail text."
    start = text.index("Name:")
    end = text.index("\n\nTail")
    units = split_sentence_units(text, [[start, end]])
    assert ("Name: Ada\nRole: Eng", True) in units
    assert ("A first sentence.", False) in units
    assert ("Tail text.", False) in units


def test_split_units_validation():
    with pytest.raises(ValueError):
        split_sentence_units("abc", [[2, 1]])
    with pytest.raises(ValueError):
        split_sentence_units("abc", [[0, 2], [1, 3]])  # overlap
    with pytest.raises(ValueError):
        split_sentence_units("a  b", [[1, 3]])  # empty after trim


# ---------------------------------------------------------------------------
# HTML


HTML_PAGE = """<!doctype html>
<html><head><title>Page Title</title><style>.x{color:red}</style></head>
<body>
<nav><a href="/">Home</a><a href="/about">About</a></nav>
<div id="content">
  <h1>Main Heading</h1>
  <p>First paragraph with <strong>bold</strong> and <a href="https://e.co/d">a link</a>.</p>
  <p>Second paragraph is here to add enough density for extraction.</p>
  <ul><li>alpha</li><li>beta</li></ul>
  <pre><code class="language-python">print("hi")</code></pre>
</div>
<footer>Copyright nobody</footer>
</body></html>"""


def test_html_main_content_and_markdown():
    out = parse_html_text("/x/page.html", HTML_PAGE)
    text = out["text"]
    assert out["title"] == "Page Title"
    assert "# Main Heading" in text
    assert "First paragraph with **bold** and [a link](https://e.co/d)." in text
    assert "- alpha\n- beta" in text
    assert '```python\nprint("hi")\n```' in text
    # noise is stripped
    assert "Home" not in text and "Copyright" not in text and "color:red" not in text


def test_html_empty_degrades_gracefully():
    assert parse_html_text("/x/e.html", "") == {"text": "", "title": ""}
    assert parse_html_text("/x/e.html", "   \n ") == {"text": "", "title": ""}


def test_html_title_falls_back_to_h1_then_filename():
    out = parse_html_text("/x/no-title.html", "<body><h1>From H1</h1><p>Long enough paragraph of body text here.</p></body>")
    assert out["title"] == "From H1"
    out2 = parse_html_text(
        "/x/my-page.html", "<body><p>Paragraph body text long enough to extract.</p></body>"
    )
    assert out2["title"] == "my page"


def test_html_article_preferred_over_density():
    page = (
        "<body><div><p>Sidebar text that is long and rambling and dense enough to win.</p>"
        "<p>More sidebar filler text to boost the division score further still.</p></div>"
        "<article><p>Article body.</p></article></body>"
    )
    out = parse_html_text("/x/a.html", page)
    assert out["text"] == "Article body."
