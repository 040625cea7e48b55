"""Markdown -> HTML conversion for the /markdown/pdf ingestion path.

The reference converts Markdown to HTML with commonmark-java plus the
GFM TablesExtension and feeds the HTML to its HTML->PDF pipeline
(ConvertMarkdownToPdf.java:7-13,124-150). Here the same shape:
``markdown_to_html`` implements the CommonMark subset the corpus and
the reference's own exporter produce — ATX headings, paragraphs with
soft line breaks, unordered lists, GFM pipe tables (the extension),
inline code/strong/emphasis/links — and the result rides the existing
HTML ingestion (sources/files.py) as a kind='htmlbody' span, i.e.
rendered whole like an EML body, matching the reference's
render-the-whole-document behavior (no boilerplate stripping on a
converted file). Fenced code blocks, blockquotes, setext headings and
ordered lists are outside the modeled subset — the function renders
them as paragraphs rather than guessing.
"""

from __future__ import annotations

import re

_HEADING_RE = re.compile(r"^(#{1,6})\s+(.*)$")
_LIST_RE = re.compile(r"^[-*+]\s+(.*)$")
_SEP_ROW_RE = re.compile(r"^\|(?:\s*:?-{3,}:?\s*\|)+\s*$")
_CODE_RE = re.compile(r"`([^`]+)`")
_STRONG_RE = re.compile(r"\*\*([^*]+)\*\*")
_EM_RE = re.compile(r"\*([^*]+)\*")
_LINK_RE = re.compile(r"\[([^\]]+)\]\(([^)\s]+)\)")
_PIPE_SENTINEL = "\x00pipe\x00"


def _escape(text: str) -> str:
    return (text.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace('"', "&quot;"))


def _inline(text: str) -> str:
    s = _escape(text)
    s = _CODE_RE.sub(r"<code>\1</code>", s)
    s = _STRONG_RE.sub(r"<strong>\1</strong>", s)
    s = _EM_RE.sub(r"<em>\1</em>", s)
    s = _LINK_RE.sub(r'<a href="\2">\1</a>', s)
    return s


def _table_cells(row: str) -> list[str]:
    row = row.strip().replace("\\|", _PIPE_SENTINEL)
    if row.startswith("|"):
        row = row[1:]
    if row.endswith("|"):
        row = row[:-1]
    return [c.strip().replace(_PIPE_SENTINEL, "|")
            for c in row.split("|")]


def markdown_to_html(md: str) -> str:
    out: list[str] = []
    lines = md.split("\n")
    i = 0
    para: list[str] = []

    def flush_para() -> None:
        if para:
            out.append("<p>" + "\n".join(_inline(ln) for ln in para)
                       + "</p>")
            para.clear()

    while i < len(lines):
        line = lines[i]
        stripped = line.strip()
        if not stripped:
            flush_para()
            i += 1
            continue
        m = _HEADING_RE.match(stripped)
        if m:
            flush_para()
            level = len(m.group(1))
            out.append(f"<h{level}>{_inline(m.group(2).strip())}"
                       f"</h{level}>")
            i += 1
            continue
        if (stripped.startswith("|") and i + 1 < len(lines)
                and _SEP_ROW_RE.match(lines[i + 1].strip())):
            flush_para()
            header = _table_cells(stripped)
            i += 2
            rows: list[list[str]] = []
            while i < len(lines) and lines[i].strip().startswith("|"):
                rows.append(_table_cells(lines[i].strip()))
                i += 1
            parts = ["<table><thead><tr>"]
            parts += [f"<th>{_inline(c)}</th>" for c in header]
            parts.append("</tr></thead><tbody>")
            for row in rows:
                parts.append("<tr>")
                parts += [f"<td>{_inline(c)}</td>" for c in row]
                parts.append("</tr>")
            parts.append("</tbody></table>")
            out.append("".join(parts))
            continue
        lm = _LIST_RE.match(stripped)
        if lm:
            flush_para()
            items = []
            while i < len(lines):
                im = _LIST_RE.match(lines[i].strip())
                if not im:
                    break
                items.append(f"<li>{_inline(im.group(1).strip())}</li>")
                i += 1
            out.append("<ul>" + "".join(items) + "</ul>")
            continue
        para.append(stripped)
        i += 1
    flush_para()
    return "".join(out)
