"""Text chunking (reference op E24).

Re-derives the semantics of the reference engine's chunker
(engine/src/stirling/documents/chunker.py:9-108 — paragraph -> sentence
packing into ~512-char chunks with 64-char overlap) from the SURVEY.md
§2.1 spec:

  * paragraphs split on blank lines; sentences on [.!?] + whitespace;
  * sentences pack greedily while the chunk stays <= max_len;
  * a new chunk is seeded with the previous chunk's tail sentences up
    to `overlap` chars (context carry-over for retrieval);
  * a single unit longer than max_len is hard-wrapped at word
    boundaries (and mid-word as a last resort).

``chunk_text_windows`` is the column-expression variant (fixed-stride
substring windows) used where an exact SQL oracle is required.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_LEN = 512
OVERLAP = 64
_SENT_RE = re.compile(r"(?<=[.!?])\s+")
_PARA_RE = re.compile(r"\n\s*\n")


def _hard_wrap(unit: str, max_len: int) -> list[str]:
    out: list[str] = []
    words = unit.split(" ")
    cur = ""
    for w in words:
        while len(w) > max_len:  # pathological single token
            out.append(w[:max_len])
            w = w[max_len:]
        if not cur:
            cur = w
        elif len(cur) + 1 + len(w) <= max_len:
            cur = f"{cur} {w}"
        else:
            out.append(cur)
            cur = w
    if cur:
        out.append(cur)
    return out


def _tail_overlap(sentences: list[str], overlap: int) -> list[str]:
    tail: list[str] = []
    used = 0
    for s in reversed(sentences):
        cost = len(s) + (1 if tail else 0)
        if used + cost > overlap:
            break
        tail.insert(0, s)
        used += cost
    return tail


def chunk_text(text: str, max_len: int = MAX_LEN,
               overlap: int = OVERLAP) -> list[str]:
    units: list[str] = []
    for para in _PARA_RE.split(text or ""):
        para = para.strip()
        if not para:
            continue
        for sent in _SENT_RE.split(para):
            sent = sent.strip()
            if not sent:
                continue
            if len(sent) > max_len:
                units.extend(_hard_wrap(sent, max_len))
            else:
                units.append(sent)

    chunks: list[str] = []
    cur: list[str] = []
    cur_len = 0
    for unit in units:
        add = len(unit) + (1 if cur else 0)
        if cur and cur_len + add > max_len:
            chunks.append(" ".join(cur))
            cur = _tail_overlap(cur, overlap)
            cur_len = len(" ".join(cur))
            add = len(unit) + (1 if cur else 0)
        cur.append(unit)
        cur_len += add
    if cur:
        chunks.append(" ".join(cur))
    return chunks


def chunk_text_windows(col: Column, max_len: int = MAX_LEN,
                       overlap: int = OVERLAP) -> Column:
    """Fixed-stride substring windows as array<string>:
    chunk i = substr(text, 1 + i*stride, max_len), stride =
    max_len - overlap, i in [0, ceil(max(len-overlap,1)/stride)).
    Pure column math — exactly reproducible in ANSI SQL."""
    stride = max_len - overlap
    n = F.ceil(F.greatest(F.length(col) - overlap, F.lit(1)) / F.lit(stride))
    return F.transform(
        F.sequence(F.lit(0), (n - 1).cast("int")),
        lambda i: F.substring(col, i * stride + 1, max_len),
    )
