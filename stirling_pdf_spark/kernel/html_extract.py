"""HTML boilerplate stripping (H1-H3 semantics + H7 scoring).

Semantics preserved from the reference:
  * <script>/<style> content removed (EmlProcessingUtils.java:594-606);
  * <noscript> disallowed by the sanitizer allowlist
    (CustomHtmlSanitizer.java:45-67) — we drop its subtree;
  * elements styled position:fixed / position:absolute removed
    (EmlProcessingUtils.java:238-247).

The main-content scoring (H7) follows the public Readability/jusText
approach (link density + text length + tag/class penalties — see
PAPERS.md); the reference itself only sanitizes. Output: one
kind='text' span per kept block, in document order.

Pure stdlib (html.parser) so the oracle and the Arrow UDF share this
exact code path.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from .model import (
    MAX_LINK_DENSITY,
    MIN_BLOCK_CHARS,
    MIN_HEADING_CHARS,
)

_SKIP_TAGS = frozenset({"script", "style", "noscript", "svg", "iframe", "template"})
_BOILER_TAGS = frozenset({"nav", "footer", "aside"})
_BLOCK_TAGS = frozenset(
    {
        "p", "div", "section", "article", "main", "header", "footer",
        "aside", "nav", "ul", "ol", "li", "table", "tr", "td", "th",
        "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre",
        "figure", "figcaption", "form", "body",
    }
)
_HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})
_BOILER_CLASS_RE = re.compile(
    r"(?:^|[\s_-])(nav|navbar|footer|sidebar|side-bar|comment|comments|"
    r"banner|menu|advert|ads?|sponsor|share|social|breadcrumb|related|"
    r"cookie|popup|promo)(?:$|[\s_-])",
    re.IGNORECASE,
)
_POSITIONED_RE = re.compile(r"position\s*:\s*(fixed|absolute)", re.IGNORECASE)
_WS_RE = re.compile(r"\s+")


class _Block:
    __slots__ = ("tag", "chars", "link_chars", "boiler")

    def __init__(self, tag: str, boiler: bool) -> None:
        self.tag = tag
        self.chars: list[str] = []
        self.link_chars = 0
        self.boiler = boiler


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, str, int, bool]] = []  # (tag, text, link_chars, boiler)
        self._skip_depth = 0
        self._boiler_depth = 0
        self._link_depth = 0
        self._cur = _Block("body", False)
        # stack entries: (tag, was_skip, was_boiler)
        self._stack: list[tuple[str, bool, bool]] = []

    # -- helpers ------------------------------------------------------
    def _flush(self) -> None:
        text = _WS_RE.sub(" ", "".join(self._cur.chars)).strip()
        if text:
            self.blocks.append((self._cur.tag, text, self._cur.link_chars, self._cur.boiler))
        self._cur = _Block(self._cur.tag, self._boiler_depth > 0)

    @staticmethod
    def _is_boiler_attrs(attrs: list[tuple[str, str | None]]) -> bool:
        for name, value in attrs:
            if name in ("class", "id", "role") and value and _BOILER_CLASS_RE.search(value):
                return True
        return False

    @staticmethod
    def _is_positioned(attrs: list[tuple[str, str | None]]) -> bool:
        for name, value in attrs:
            if name == "style" and value and _POSITIONED_RE.search(value):
                return True
        return False

    # -- parser hooks --------------------------------------------------
    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        skip = tag in _SKIP_TAGS or self._is_positioned(attrs)
        boiler = tag in _BOILER_TAGS or self._is_boiler_attrs(attrs)
        if tag in _BLOCK_TAGS:
            self._flush()
            self._cur = _Block(tag, self._boiler_depth > 0 or boiler)
        if tag == "br":
            self._cur.chars.append(" ")
            return
        if tag in ("img", "hr", "input", "meta", "link"):
            return  # void elements — no stack entry
        self._stack.append((tag, skip, boiler))
        if skip:
            self._skip_depth += 1
        if boiler:
            self._boiler_depth += 1
        if tag == "a":
            self._link_depth += 1

    def handle_endtag(self, tag: str) -> None:
        # unwind to the matching open tag (tolerates unclosed children)
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i][0] == tag:
                for j in range(len(self._stack) - 1, i - 1, -1):
                    t, skip, boiler = self._stack.pop()
                    if skip:
                        self._skip_depth -= 1
                    if boiler:
                        self._boiler_depth -= 1
                    if t == "a":
                        self._link_depth -= 1
                break
        if tag in _BLOCK_TAGS:
            self._flush()
            self._cur = _Block("body", self._boiler_depth > 0)

    def handle_data(self, data: str) -> None:
        if self._skip_depth > 0 or not data:
            return
        self._cur.chars.append(data)
        if self._link_depth > 0:
            self._cur.link_chars += len(data.strip())

    def close(self) -> None:  # type: ignore[override]
        super().close()
        self._flush()


def extract_main_blocks(html: str) -> list[str]:
    """Strip boilerplate; return kept block texts in document order."""
    parser = _Extractor()
    parser.feed(html)
    parser.close()
    kept: list[str] = []
    for tag, text, link_chars, boiler in parser.blocks:
        if boiler:
            continue
        n = len(text)
        density = (link_chars / n) if n else 1.0
        if tag in _HEADING_TAGS:
            if n >= MIN_HEADING_CHARS and link_chars == 0:
                kept.append(text)
            continue
        if n >= MIN_BLOCK_CHARS and density <= MAX_LINK_DENSITY:
            kept.append(text)
    return kept


def extract_all_blocks(html: str) -> list[str]:
    """Block texts with NO boilerplate/link-density filtering — the
    EML-body path: EmlToPdf renders the whole converted body (scripts/
    styles/positioned elements still dropped by the parser), so an
    autolinked plain-text body must survive even though its link
    density would fail the H7 heuristic."""
    parser = _Extractor()
    parser.feed(html)
    parser.close()
    return [text for _tag, text, _lc, _b in parser.blocks]
