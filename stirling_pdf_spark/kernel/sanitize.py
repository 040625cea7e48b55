"""HTML allowlist sanitizer (reference op H1).

Reimplements the semantics of CustomHtmlSanitizer.java:45-67 (OWASP
policy FORMATTING + BLOCKS + STYLES + LINKS + TABLES + constrained img)
from the spec in SURVEY.md §2.2 using the stdlib HTMLParser — written
from scratch, not translated:

  * allowed tags keep their (allowlisted) attributes;
  * <script>/<style>/<noscript> are dropped WITH their content;
  * unknown/disallowed tags are unwrapped (tag removed, text kept);
  * img keeps alt,width,height,title and src only when it is not a
    javascript:/data: URL (the SSRF/XSS guard).
"""

from __future__ import annotations

from html import escape
from html.parser import HTMLParser

FORMATTING = {"b", "i", "u", "em", "strong", "small", "s", "sub", "sup",
              "code", "pre", "tt", "abbr"}
BLOCKS = {"p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "ul", "ol", "li",
          "blockquote", "br", "hr", "span"}
TABLES = {"table", "thead", "tbody", "tfoot", "tr", "td", "th", "caption",
          "colgroup", "col"}
LINKS = {"a"}
IMG = {"img"}
ALLOWED_TAGS = FORMATTING | BLOCKS | TABLES | LINKS | IMG
DROP_WITH_CONTENT = {"script", "style", "noscript"}
VOID_TAGS = {"br", "hr", "img", "col"}

ALLOWED_ATTRS: dict[str, set[str]] = {
    "a": {"href", "title"},
    "img": {"alt", "width", "height", "title", "src"},
    "td": {"colspan", "rowspan"},
    "th": {"colspan", "rowspan"},
}
_UNSAFE_SCHEMES = ("javascript:", "data:", "vbscript:")


def _safe_url(value: str) -> bool:
    return not value.strip().lower().startswith(_UNSAFE_SCHEMES)


class _Sanitizer(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.out: list[str] = []
        self._drop_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in DROP_WITH_CONTENT:
            self._drop_depth += 1
            return
        if self._drop_depth or tag not in ALLOWED_TAGS:
            return  # unwrap: skip the tag, keep children
        keep = []
        for name, value in attrs:
            if name not in ALLOWED_ATTRS.get(tag, set()):
                continue
            if name in ("href", "src") and value and not _safe_url(value):
                continue
            keep.append(f' {name}="{escape(value or "", quote=True)}"')
        close = " /" if tag in VOID_TAGS else ""
        self.out.append(f"<{tag}{''.join(keep)}{close}>")

    def handle_endtag(self, tag):
        if tag in DROP_WITH_CONTENT:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if self._drop_depth or tag not in ALLOWED_TAGS or tag in VOID_TAGS:
            return
        self.out.append(f"</{tag}>")

    def handle_data(self, data):
        if not self._drop_depth:
            self.out.append(escape(data, quote=False))


def sanitize_html(html: str) -> str:
    p = _Sanitizer()
    p.feed(html or "")
    p.close()
    return "".join(p.out)
