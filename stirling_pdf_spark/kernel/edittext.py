"""/edit-text find-and-replace (EditTextController.java:85-320).

The reference converts the PDF to its JSON model, matches each edit's
pattern against the CONCATENATION of a page's text-element strings (no
separators — finds can span kerning-broken runs), applies matches
right-to-left, and writes cross-element matches as a single
replacement run anchored at the first matched element (intermediates
empty, the last keeps its suffix). Find strings are always literal
(Pattern.quote); whole-word mode uses LOOKAROUNDS rather than \\b so
the bound also fires for finds that start or end with a non-word
character (:149-165 — e.g. "-foo"). Zero-length matches skip.
"""

from __future__ import annotations

import re


def compile_edits(edits: list[tuple[str, str]],
                  whole_word: bool = False):
    """(find, replace) list -> compiled (pattern, literal replacement)
    list, in application order. Empty list / empty find rejected like
    the controller (:106-117)."""
    if not edits:
        raise ValueError(
            "No find/replace operations provided for text editing")
    out = []
    for find, replace in edits:
        if not find:
            raise ValueError("Each edit must have a non-empty find string")
        regex = re.escape(find)
        if whole_word:
            regex = r"(?<!\w)(?:" + regex + r")(?!\w)"
        out.append((re.compile(regex), replace or ""))
    return out


def apply_edits_to_page(texts: list[str], compiled) -> tuple[list[str], int]:
    """One page's element texts -> (edited texts, n modified elements).
    Faithful transcription of applyEditToPage/applyMatchToElements
    (:203-320): per edit, join fresh, collect non-empty matches, apply
    right-to-left; replacements are literal (quoteReplacement)."""
    texts = list(texts)
    modified: set[int] = set()
    for pattern, replacement in compiled:
        starts: list[int] = []
        ends: list[int] = []
        pos = 0
        for t in texts:
            starts.append(pos)
            pos += len(t)
            ends.append(pos)
        joined = "".join(texts)
        matches = [(m.start(), m.end()) for m in pattern.finditer(joined)
                   if m.start() != m.end()]
        for s, e in reversed(matches):
            first = next((i for i in range(len(texts))
                          if starts[i] <= s < ends[i]), -1)
            last = next((i for i in range(len(texts))
                         if starts[i] <= e - 1 < ends[i]), -1)
            if first < 0 or last < 0:
                continue
            if first == last:
                t = texts[first]
                texts[first] = (t[:s - starts[first]] + replacement
                                + t[e - starts[first]:])
                modified.add(first)
                continue
            # cross-element: whole replacement anchors at the first
            # element, intermediates empty, last keeps its suffix
            texts[first] = texts[first][:s - starts[first]] + replacement
            modified.add(first)
            for mid in range(first + 1, last):
                texts[mid] = ""
                modified.add(mid)
            texts[last] = texts[last][e - starts[last]:]
            modified.add(last)
    return texts, len(modified)
