"""Markdown -> HTML conversion for the /markdown/pdf ingestion path.

The reference converts Markdown to HTML with commonmark-java plus the
GFM TablesExtension and feeds the HTML to its HTML->PDF pipeline
(ConvertMarkdownToPdf.java:7-13,124-150). Here the same shape:
``markdown_to_html`` implements the CommonMark subset the corpus and
the reference's own exporter produce — ATX headings, paragraphs with
soft line breaks, unordered AND ordered lists, blockquotes, fenced
code blocks, GFM pipe tables (the extension), inline
code/strong/emphasis/links — and the result rides the existing
HTML ingestion (sources/files.py) as a kind='htmlbody' span, i.e.
rendered whole like an EML body, matching the reference's
render-the-whole-document behavior (no boilerplate stripping on a
converted file). Setext headings and nested lists are outside the
modeled subset — the function renders them as paragraphs/flat items
rather than guessing.
"""

from __future__ import annotations

import re

_HEADING_RE = re.compile(r"^(#{1,6})\s+(.*)$")
_LIST_RE = re.compile(r"^[-*+]\s+(.*)$")
_OLIST_RE = re.compile(r"^\d+[.)]\s+(.*)$")
_FENCE_RE = re.compile(r"^(```|~~~)\s*\S*\s*$")
_QUOTE_RE = re.compile(r"^>\s?(.*)$")
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
    stash: list[str] = []

    def protect(rendered: str) -> str:
        stash.append(rendered)
        return f"\x00{len(stash) - 1}\x00"

    # code spans bind tightest in commonmark: their CONTENTS must not
    # receive strong/em/link substitution ('`a*b*c`' stays literal)
    s = _CODE_RE.sub(lambda m: protect(f"<code>{m.group(1)}</code>"), s)
    # link destinations are literal URLs: stash them before the
    # emphasis passes can rewrite '*' inside them; link TEXT stays
    # inline so strong/em still apply to it, as commonmark does
    s = _LINK_RE.sub(lambda m: f"[{m.group(1)}]({protect(m.group(2))})",
                     s)
    s = _STRONG_RE.sub(r"<strong>\1</strong>", s)
    s = _EM_RE.sub(r"<em>\1</em>", s)
    s = _LINK_RE.sub(r'<a href="\2">\1</a>', s)
    for i, rendered in enumerate(stash):
        s = s.replace(f"\x00{i}\x00", rendered)
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
        fm = _FENCE_RE.match(stripped)
        if fm:
            flush_para()
            fence = fm.group(1)
            i += 1
            code: list[str] = []
            while i < len(lines) and not lines[i].strip().startswith(fence):
                code.append(lines[i])
                i += 1
            i += 1  # closing fence (or EOF)
            out.append("<pre><code>" + _escape("\n".join(code))
                       + "</code></pre>")
            continue
        if _QUOTE_RE.match(stripped):
            flush_para()
            quoted: list[str] = []
            while i < len(lines):
                qm = _QUOTE_RE.match(lines[i].strip())
                if not qm:
                    break
                quoted.append(qm.group(1))
                i += 1
            out.append("<blockquote><p>"
                       + "\n".join(_inline(q) for q in quoted)
                       + "</p></blockquote>")
            continue
        for regex, tag in ((_LIST_RE, "ul"), (_OLIST_RE, "ol")):
            lm = regex.match(stripped)
            if lm:
                flush_para()
                items = []
                while i < len(lines):
                    im = regex.match(lines[i].strip())
                    if not im:
                        break
                    items.append(
                        f"<li>{_inline(im.group(1).strip())}</li>")
                    i += 1
                out.append(f"<{tag}>" + "".join(items) + f"</{tag}>")
                break
        else:
            para.append(stripped)
            i += 1
            continue
        continue
    flush_para()
    return "".join(out)
