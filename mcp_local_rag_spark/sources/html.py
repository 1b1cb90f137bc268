"""Stdlib HTML main-content extraction — no native libs.

The reference pipes HTML through JSDOM -> Readability (noise removal,
main-content selection) -> Turndown (markdown with ATX headings and
fenced code, src/parser/html-parser.ts:28-130). This reproduces those
semantics with ``html.parser``:

  * noise stripped structurally: script/style/noscript/nav/header/footer/
    aside/form/iframe/svg/button subtrees are dropped;
  * main content = <article>/<main>/[role=main] if present, else the
    element owning the densest paragraph text (each p/pre/li/heading
    credits its parent; argmax wins — the core Readability scoring idea);
  * markdown rendering: ATX headings, fenced code for <pre> (language from
    ``class="language-x"`` kept, matching the reference's custom pre rule,
    html-parser.ts:40-48), '-' bullets, [text](href) links, **bold**,
    _emphasis_ — the reference's Turndown configuration (:29-35);
  * empty / whitespace-only input -> empty content and title, graceful
    degradation instead of an error (:74-77, :126-129);
  * title chain: <title> -> first <h1> -> filename
    (extractHtmlTitle, title-extractor.ts:107-117).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from .docx import filename_title

_WS_RE = re.compile(r"\s+")

VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}
NOISE_TAGS = {
    "script", "style", "noscript", "nav", "header", "footer",
    "aside", "form", "iframe", "svg", "button", "template",
}
BLOCK_TAGS = {
    "p", "div", "section", "article", "main", "blockquote", "pre",
    "ul", "ol", "li", "table", "tr", "h1", "h2", "h3", "h4", "h5", "h6",
    "body", "html", "figure", "figcaption", "td", "th", "thead", "tbody",
}
_SCORE_TAGS = {"p", "pre", "li", "h1", "h2", "h3", "h4", "h5", "h6"}


class _Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict | None = None, parent: "_Node | None" = None):
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list = []  # _Node | str
        self.parent = parent

    def text(self) -> str:
        parts: list[str] = []
        stack: list = list(self.children)
        while stack:
            c = stack.pop()
            if isinstance(c, str):
                parts.append(c)
            else:
                stack.extend(c.children)
        return "".join(reversed(parts))

    def find_all(self, *tags: str):
        out = []
        stack: list = [self]
        while stack:
            n = stack.pop(0)
            if isinstance(n, _Node):
                if n.tag in tags and n is not self:
                    out.append(n)
                stack.extend(c for c in n.children if isinstance(c, _Node))
        return out


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("html")
        self.cur = self.root

    def handle_starttag(self, tag, attrs):
        if tag in VOID_TAGS:
            self.cur.children.append(_Node(tag, dict(attrs), self.cur))
            return
        node = _Node(tag, dict(attrs), self.cur)
        self.cur.children.append(node)
        self.cur = node

    def handle_startendtag(self, tag, attrs):
        self.cur.children.append(_Node(tag, dict(attrs), self.cur))

    def handle_endtag(self, tag):
        # close the nearest matching open ancestor (forgiving, like browsers)
        n = self.cur
        while n is not self.root and n.tag != tag:
            n = n.parent
        if n is not self.root:
            self.cur = n.parent

    def handle_data(self, data):
        if data:
            self.cur.children.append(data)


def _strip_noise(node: _Node) -> None:
    node.children = [
        c
        for c in node.children
        if not (isinstance(c, _Node) and c.tag in NOISE_TAGS)
    ]
    for c in node.children:
        if isinstance(c, _Node):
            _strip_noise(c)


def _main_node(root: _Node) -> _Node:
    for tag in ("article", "main"):
        found = root.find_all(tag)
        if found:
            return found[0]
    for n in root.find_all("div", "section"):
        if n.attrs.get("role") == "main":
            return n
    body = (root.find_all("body") or [root])[0]
    # densest-paragraph container: each scoring child credits its parent
    scores: dict[int, tuple[int, _Node]] = {}
    for el in body.find_all(*_SCORE_TAGS):
        parent = el.parent
        if parent is None:
            continue
        # li credits the list's container, not the ul itself
        if el.tag == "li" and parent.parent is not None:
            parent = parent.parent
        key = id(parent)
        prev = scores.get(key)
        gain = len(_WS_RE.sub(" ", el.text()).strip())
        scores[key] = (prev[0] + gain if prev else gain, parent)
    if scores:
        best_score, best = max(scores.values(), key=lambda t: t[0])
        if best_score >= 25:
            return best
    return body


def _inline(node: _Node) -> str:
    parts: list[str] = []
    for c in node.children:
        if isinstance(c, str):
            parts.append(_WS_RE.sub(" ", c))
            continue
        if c.tag in NOISE_TAGS:
            continue
        if c.tag == "br":
            parts.append("\n")
        elif c.tag in ("strong", "b"):
            inner = _inline(c).strip()
            parts.append(f"**{inner}**" if inner else "")
        elif c.tag in ("em", "i"):
            inner = _inline(c).strip()
            parts.append(f"_{inner}_" if inner else "")
        elif c.tag == "code":
            inner = _inline(c).strip()
            parts.append(f"`{inner}`" if inner else "")
        elif c.tag == "a":
            inner = _inline(c).strip()
            href = c.attrs.get("href")
            parts.append(f"[{inner}]({href})" if inner and href else inner)
        elif c.tag == "img":
            alt = c.attrs.get("alt", "")
            parts.append(alt)
        else:
            parts.append(_inline(c))
    return "".join(parts)


def _code_block(node: _Node) -> str:
    code_el = next((c for c in node.children if isinstance(c, _Node) and c.tag == "code"), None)
    src = code_el if code_el is not None else node
    lang = ""
    if code_el is not None:
        cls = code_el.attrs.get("class", "")
        m = re.search(r"language-([\w+-]+)", cls)
        if m:
            lang = m.group(1)
    return f"```{lang}\n{src.text().strip()}\n```"


def _list_block(node: _Node, ordered: bool, depth: int = 0) -> str:
    lines: list[str] = []
    i = 1
    for c in node.children:
        if not (isinstance(c, _Node) and c.tag == "li"):
            continue
        sublists = [
            g for g in c.children if isinstance(g, _Node) and g.tag in ("ul", "ol")
        ]
        own = _Node("li")
        own.children = [g for g in c.children if g not in sublists]
        text = _inline(own).strip()
        marker = f"{i}." if ordered else "-"
        if text:
            lines.append("  " * depth + f"{marker} {text}")
        for sub in sublists:
            sub_text = _list_block(sub, sub.tag == "ol", depth + 1)
            if sub_text:
                lines.append(sub_text)
        i += 1
    return "\n".join(lines)


def _table_block(node: _Node) -> str:
    lines = []
    for tr in node.find_all("tr"):
        cells = [
            _WS_RE.sub(" ", _inline(td)).strip()
            for td in tr.children
            if isinstance(td, _Node) and td.tag in ("td", "th")
        ]
        if any(cells):
            lines.append(" | ".join(cells))
    return "\n".join(lines)


def _blocks(node: _Node, out: list[str]) -> None:
    pending_text: list[str] = []

    def _flush() -> None:
        text = _WS_RE.sub(" ", "".join(pending_text)).strip()
        pending_text.clear()
        if text:
            out.append(text)

    for c in node.children:
        if isinstance(c, str):
            pending_text.append(c)
            continue
        if c.tag in NOISE_TAGS:
            continue
        if c.tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
            _flush()
            text = _WS_RE.sub(" ", _inline(c)).strip()
            if text:
                out.append("#" * int(c.tag[1]) + " " + text)
        elif c.tag == "p":
            _flush()
            text = _inline(c).strip()
            if text:
                out.append(_WS_RE.sub(" ", text))
        elif c.tag == "pre":
            _flush()
            out.append(_code_block(c))
        elif c.tag == "blockquote":
            _flush()
            inner: list[str] = []
            _blocks(c, inner)
            if inner:
                out.append("\n".join("> " + line for b in inner for line in b.split("\n")))
        elif c.tag in ("ul", "ol"):
            _flush()
            text = _list_block(c, c.tag == "ol")
            if text:
                out.append(text)
        elif c.tag == "table":
            _flush()
            text = _table_block(c)
            if text:
                out.append(text)
        elif c.tag in BLOCK_TAGS:
            _flush()
            _blocks(c, out)
        else:
            # inline element at block level: accumulate into the text run
            pending_text.append(_inline(c))
    _flush()


def parse_html_text(path: str, html: str) -> dict:
    """-> {text: markdown, title}; empty input degrades to empty output."""
    if not html or not html.strip():
        return {"text": "", "title": ""}
    builder = _TreeBuilder()
    builder.feed(html)
    root = builder.root
    _strip_noise(root)

    titles = root.find_all("title")
    title = _WS_RE.sub(" ", titles[0].text()).strip() if titles else ""
    if not title:
        h1s = root.find_all("h1")
        if h1s:
            title = _WS_RE.sub(" ", h1s[0].text()).strip()
    if not title:
        title = filename_title(path)

    main = _main_node(root)
    out: list[str] = []
    _blocks(main, out)
    return {"text": "\n\n".join(out).strip(), "title": title}
