"""Deterministic interleaved-document corpus synthesis (FIXTURES.md §A).

Mirrors the reference's cucumber fixture style
(testing/cucumber/features/steps/step_definitions.py:25-113 —
deterministic reportlab Letter pages, black-box images) but emits raw
span structures directly, so no PDF binary round trip is needed.
Everything is seed-fixed pure Python: doc ``idx`` + ``seed`` fully
determine the document. No external data (BASELINE.json north_rule).

Archetype weights (FIXTURES.md): single-col 40%, two-col 15%,
mixed-media 15%, attachments 10%, html 15%, mega-doc 4%, edge 1%.
"""

from __future__ import annotations

import hashlib
import random

from ..kernel import wire
from ..kernel.model import MediaDraw, TextRun

_WORDS = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
    "eiusmod tempor incididunt ut labore et dolore magna aliqua enim "
    "ad minim veniam quis nostrud exercitation ullamco laboris nisi "
    "aliquip ex ea commodo consequat duis aute irure in reprehenderit "
    "voluptate velit esse cillum eu fugiat nulla pariatur excepteur "
    "sint occaecat cupidatat non proident sunt culpa qui officia "
    "deserunt mollit anim id est laborum"
).split()

ARCHETYPES = (
    ("single-col", 40),
    ("two-col", 15),
    ("mixed-media", 15),
    ("attachments", 10),
    ("html", 15),
    ("mega-doc", 4),
    ("edge", 1),
)
_TOTAL_W = sum(w for _, w in ARCHETYPES)

FONT = "Helvetica"
FS = 11.0
LEFT_X = 72.0
TOP_Y = 72.0
LINE_STEP = 14.0


def _media_ref(rng: random.Random) -> str:
    payload = rng.getrandbits(64).to_bytes(8, "big")
    return "media-" + hashlib.sha256(payload).hexdigest()[:8]


def _pick_archetype(idx: int, seed: int) -> str:
    h = int(hashlib.sha256(f"{seed}:{idx}".encode()).hexdigest()[:8], 16)
    r = h % _TOTAL_W
    acc = 0
    for name, w in ARCHETYPES:
        acc += w
        if r < acc:
            return name
    return "single-col"


def _words(rng: random.Random, n: int) -> list[str]:
    return [rng.choice(_WORDS) for _ in range(n)]


def _budget_words(rng: random.Random, min_chars: int, max_chars: int) -> list[str]:
    """Pick words until adding one more would exceed max_chars (joined
    length incl. single spaces); guarantees >= min_chars by retrying
    short draws with more words."""
    out: list[str] = []
    total = 0
    while True:
        w = rng.choice(_WORDS)
        add = len(w) + (1 if out else 0)
        if total + add > max_chars:
            if total >= min_chars or max_chars - total < 3:
                break
            continue  # skip too-long word, keep filling
        out.append(w)
        total += add
    return out


def _line_runs(rng: random.Random, page: int, x: float, y: float,
               n_words: int, fs: float = FS) -> list[TextRun]:
    """One visual line as 1-3 glyph runs. Intra-line gaps are chosen to
    exercise both word-space insertion (gap > 0.5*avg-char-width =
    0.5*0.5*fs) and direct concatenation, never exceeding the 14 pt
    column-gap split."""
    words = _words(rng, n_words)
    n_runs = rng.randint(1, min(3, n_words))
    # split words into n_runs contiguous chunks
    cuts = sorted(rng.sample(range(1, n_words), n_runs - 1)) if n_runs > 1 else []
    chunks, prev = [], 0
    for c in cuts + [n_words]:
        chunks.append(" ".join(words[prev:c]))
        prev = c
    runs: list[TextRun] = []
    cx = x
    for i, chunk in enumerate(chunks):
        if i > 0:
            # > 2.75 => space inserted; <= 2.75 => glued; <= 14 always
            gap = rng.choice((1.0, 4.0, 6.5, 10.0))
            cx += gap
        run = TextRun(page, round(cx, 2), round(y, 2), fs, FONT, chunk)
        runs.append(run)
        cx = run.right
    return runs


def _emit_text(spans: list, runs: list[TextRun]) -> None:
    for run in runs:
        spans.append(("text", wire.encode_text_run(run), "", len(spans)))


def _emit_media(spans: list, draw: MediaDraw) -> None:
    spans.append(("media", wire.encode_media(draw), draw.media_ref, len(spans)))


def _col_line(rng: random.Random, page: int, x: float, y: float) -> list[TextRun]:
    """A column-width line (20-34 chars) split into 1-2 runs with a
    small gap; total width stays under 220 pt."""
    words = _budget_words(rng, 20, 34)
    content = " ".join(words)
    if len(words) > 2 and rng.random() < 0.5:
        k = rng.randint(1, len(words) - 1)
        a, b = " ".join(words[:k]), " ".join(words[k:])
        r1 = TextRun(page, round(x, 2), round(y, 2), FS, FONT, a)
        gap = rng.choice((1.0, 4.0, 6.5))
        r2 = TextRun(page, round(r1.right + gap, 2), round(y, 2), FS, FONT, b)
        return [r1, r2]
    return [TextRun(page, round(x, 2), round(y, 2), FS, FONT, content)]


# --- archetype builders ------------------------------------------------

def _single_col(rng: random.Random, spans: list, pages: int | None = None) -> None:
    # ~30%% of docs carry Info-dict metadata (E15), emitted as
    # kind='meta' "key|value" raw spans ahead of the content
    if rng.random() < 0.3:
        for key in ("title", "author", "producer")[: rng.randint(1, 3)]:
            spans.append(("meta", f"{key}|{' '.join(_words(rng, 2))}",
                          "", len(spans)))
    for page in range(1, (pages or rng.randint(1, 20)) + 1):
        y = TOP_Y
        for _ in range(rng.randint(5, 40)):
            _emit_text(spans, _line_runs(rng, page, LEFT_X, y, rng.randint(3, 10)))
            y += LINE_STEP


def _two_col(rng: random.Random, spans: list) -> None:
    """IEEE-style: full-width title, then two 220 pt columns with shared
    baselines across the 60 pt gutter (left ends 292, right starts 352 —
    the 60 pt x-gap > 14 pt splits the shared baseline)."""
    for page in range(1, rng.randint(1, 4) + 1):
        title = TextRun(page, 150.0, 60.0, 14.0,
                        FONT, " ".join(_words(rng, 8)))
        _emit_text(spans, [title])
        n_lines = rng.randint(4, 12)
        y = TOP_Y + 20
        for _ in range(n_lines):
            # 20-34 chars -> width 110-187 pt: >=100 (votes in the
            # layout) and fits the 220 pt column even with intra-line
            # gaps, so the 60 pt gutter always splits the baseline
            left = _col_line(rng, page, LEFT_X, y)
            right = _col_line(rng, page, 352.0, y)
            # interleave emission order (content-stream order is not
            # reading order — the kernel must fix it)
            _emit_text(spans, right)
            _emit_text(spans, left)
            y += LINE_STEP


def _mixed_media(rng: random.Random, spans: list) -> None:
    from ..kernel.tables import Rule, encode_rule

    refs = [_media_ref(rng) for _ in range(rng.randint(1, 3))]
    add_table = rng.random() < 0.4
    for page in range(1, rng.randint(1, 6) + 1):
        y = TOP_Y
        for _ in range(rng.randint(3, 12)):
            _emit_text(spans, _line_runs(rng, page, LEFT_X, y, rng.randint(3, 8)))
            y += LINE_STEP
        for _ in range(rng.randint(0, 2)):
            ref = rng.choice(refs)  # repeats exercise dedup (E9)
            _emit_media(spans, MediaDraw(page, round(rng.uniform(72, 400), 2),
                                         round(y + 10, 2), 120.0, 80.0, ref))
        if add_table and page == 1:
            # ruled 2x3 lattice below the text (E14): 3 h-rules, 4
            # v-rules; one word per cell, anchored inside the cell
            ty = round(y + 120, 2)
            xs = [300.0, 400.0, 500.0, 600.0]
            ys = [ty, ty + 20.0, ty + 40.0]
            for ry in ys:
                spans.append(("rule", encode_rule(Rule(page, xs[0], ry,
                                                       xs[-1], ry)),
                              "", len(spans)))
            for rx in xs:
                spans.append(("rule", encode_rule(Rule(page, rx, ys[0],
                                                       rx, ys[-1])),
                              "", len(spans)))
            for r in range(2):
                for c in range(3):
                    cell = TextRun(page, xs[c] + 5.0, ys[r] + 5.0, 9.0,
                                   FONT, rng.choice(_WORDS))
                    _emit_text(spans, [cell])


def _attachments(rng: random.Random, spans: list) -> None:
    _single_col(rng, spans, pages=rng.randint(1, 3))
    # bookmark/outline tree in walk order (E23): "depth|title" wire
    if rng.random() < 0.7:
        for depth, title_words in (
            (0, 2), (1, 3), (2, 2), (1, 2), (0, 3),
        )[: rng.randint(1, 5)]:
            title = " ".join(_words(rng, title_words))
            spans.append(("bookmark", f"{depth}|{title}", "", len(spans)))
    names = ["report.pdf", "report.pdf", "data.csv", "", "notes",
             "report.pdf", "data.csv", "image.png"]
    for _ in range(rng.randint(0, 5)):
        name = rng.choice(names)
        spans.append(("attachment", name, _media_ref(rng), len(spans)))


def _html(rng: random.Random, spans: list) -> None:
    paras = [" ".join(_words(rng, rng.randint(15, 40))) for _ in range(rng.randint(2, 6))]
    nav_links = "".join(f'<li><a href="/{w}">{w}</a></li>' for w in _words(rng, 5))
    cid = _media_ref(rng)
    html = (
        "<html><head><style>.x{color:red}</style>"
        "<script>var t=1;</script></head><body>"
        f'<div style="position:fixed">SUBSCRIBE NOW banner</div>'
        f"<nav><ul>{nav_links}</ul></nav>"
        f"<article><h1>{' '.join(_words(rng, 6))}</h1>"
        + "".join(f"<p>{p}</p>" for p in paras)
        + f'<p><img src="cid:{cid}" alt="inline"/>'
        + " ".join(_words(rng, 20)) + "</p>"
        "</article>"
        f'<div class="sidebar">{nav_links}</div>'
        f"<footer>Copyright {' '.join(_words(rng, 3))} <a href='/tos'>tos</a></footer>"
        "</body></html>"
    )
    spans.append(("html", html, "", len(spans)))


def _mega_doc(rng: random.Random, spans: list, mega_pages: tuple[int, int]) -> None:
    pages = rng.randint(*mega_pages)
    for page in range(1, pages + 1):
        y = TOP_Y
        for _ in range(rng.randint(3, 6)):
            _emit_text(spans, _line_runs(rng, page, LEFT_X, y, rng.randint(3, 6)))
            y += LINE_STEP


def _edge(rng: random.Random, spans: list) -> None:
    kind = rng.randint(0, 3)
    if kind == 0:
        return  # empty document
    if kind == 1:
        # whitespace-only runs (skipped per AllTextLineExtractor.java:74-80)
        _emit_text(spans, [TextRun(1, 72.0, 72.0, FS, FONT, "   ")])
        _emit_text(spans, [TextRun(2, 72.0, 72.0, FS, FONT, "\t ")])
        return
    if kind == 2:
        # unicode incl. surrogate pairs at the 500-char clip boundary
        body = ("\U0001F600" * 260) + " tail"
        _emit_text(spans, [TextRun(1, 72.0, 72.0, FS, FONT, body)])
        return
    # single 1-char token (whole-word search target, TextFinder.java:79-88)
    _emit_text(spans, [TextRun(1, 72.0, 72.0, FS, FONT, "7")])


def synth_doc(idx: int, seed: int = 42,
              mega_pages: tuple[int, int] = (1000, 1500)):
    """Returns (doc_id, archetype, raw_spans) — fully determined by
    (idx, seed, mega_pages)."""
    archetype = _pick_archetype(idx, seed)
    rng = random.Random(f"{seed}:{archetype}:{idx}")
    spans: list[tuple[str, str, str, int]] = []
    if archetype == "single-col":
        _single_col(rng, spans)
    elif archetype == "two-col":
        _two_col(rng, spans)
    elif archetype == "mixed-media":
        _mixed_media(rng, spans)
    elif archetype == "attachments":
        _attachments(rng, spans)
    elif archetype == "html":
        _html(rng, spans)
    elif archetype == "mega-doc":
        _mega_doc(rng, spans, mega_pages)
    else:
        _edge(rng, spans)
    doc_id = f"doc-{archetype}-{idx:08d}"
    return doc_id, archetype, spans


def synth_corpus(n: int, seed: int = 42,
                 mega_pages: tuple[int, int] = (1000, 1500)):
    for idx in range(n):
        yield synth_doc(idx, seed, mega_pages)


TABLE_CELL_MAX_CHARS = 16  # cell words clipped so cell width stays
                           # inside the grid / whitespace-gap geometry

# Precomputed wire-header tails for the fixed-geometry text-derivation
# corpora (synth_from_text / rich_from_text): the 40-line page layout
# makes the "|x|y|fs|font\t" part of every line's wire a pure function
# of line_no % 40, and y = 72 + 14*k is an exact small-integer float,
# so repr(accumulated y) == repr(72.0 + 14.0*k) bit-for-bit. Hoisting
# the repr/format work out of the per-line loop cuts the dominant cost
# of corpus derivation (measured ~2x on derive-heavy bench stages);
# the emitted wire strings are byte-identical.
_BODY_TAILS = tuple(
    f"|{LEFT_X!r}|{(TOP_Y + LINE_STEP * k)!r}|{FS!r}|{FONT}\t"
    for k in range(40)
)
_RICH_TAILS = tuple(
    f"|{LEFT_X!r}|{(TOP_Y + LINE_STEP * k)!r}|{FS!r}"
    f"|{'Courier' if k % 5 == 4 else FONT}\t"
    for k in range(40)
)
_SYNTH_MEDIA_TAIL = f"|{100.0!r}|{650.0!r}|{200.0!r}|{120.0!r}"


def rich_from_text(doc_id: str, text: str):
    """Derive a 'rich' interleaved document deterministically from plain
    text — the corpus for the direct-form E18/S4/E17 gates:

      * a TITLE line (first 6 words) on page 1 at y=40, 16 pt
        Helvetica-Bold — the top candidate AutoRenameController.java:
        106-138 must find;
      * body: 8 words/line, 40 lines/page at y = 72 + 14*(line%40),
        font Courier on every 5th line (else Helvetica) so per-doc font
        sets (GetInfoOnPDF.java:943-985) are non-trivial;
      * bookmarks in outline-walk order, wire 'depth|page|title':
        depth-0 'ch {p}' on every odd page, plus depth-1 's {p}' on
        pages ≡ 3 (mod 4) — drives split-by-chapters
        (SplitPdfByChaptersController.java:62-90, maxLevel filter);
      * annotations (PdfJsonConversionService.java:2553-2610 subtype/
        contents/rect): every doc gets a 'Text' note on page 1; docs
        whose sha256 leads with an even hex digit also get a
        contents-LESS 'Highlight' there, so the per-doc subtype vs
        contents counts (GetInfoOnPDF.java:865-879) differ; multi-page
        docs add a 'Text' on every page ≡ 0 (mod 3) and a 'Highlight'
        on every page ≡ 0 (mod 5).
    """
    words = text.split()
    spans: list[tuple[str, str, str, int]] = []
    if not words:
        return doc_id, spans
    title = TextRun(1, LEFT_X, 40.0, 16.0, "Helvetica-Bold",
                    " ".join(words[:6]))
    spans.append(("text", wire.encode_text_run(title), "", len(spans)))
    # hot loop: precomputed _RICH_TAILS headers (byte-identical wires,
    # see the tails' comment) instead of TextRun + encode per line
    append = spans.append
    page_s, page = "1", 1
    n_words = len(words)
    for i in range(0, n_words, 8):
        line_no = i >> 3
        if line_no // 40 + 1 != page:
            page = line_no // 40 + 1
            page_s = str(page)
        append(("text", page_s + _RICH_TAILS[line_no % 40]
                + " ".join(words[i:i + 8]), "", len(spans)))
    n_lines = (n_words + 7) // 8
    n_pages = (n_lines - 1) // 40 + 1
    for p in range(1, n_pages + 1, 2):
        spans.append(("bookmark", f"0|{p}|ch {p}", "", len(spans)))
        if p % 4 == 3:
            spans.append(("bookmark", f"1|{p}|s {p}", "", len(spans)))
    h = hashlib.sha256(text.encode("utf-8", "surrogatepass")).hexdigest()
    for p in range(1, n_pages + 1):
        if p == 1 or p % 3 == 0:
            spans.append(("annotation",
                          f"{p}|100.0|500.0|80.0|40.0\tText|note {p}||",
                          "", len(spans)))
        if (p == 1 and int(h[0], 16) % 2 == 0) or (p > 1 and p % 5 == 0):
            spans.append(("annotation",
                          f"{p}|200.0|520.0|60.0|30.0\tHighlight|||",
                          "", len(spans)))
    return doc_id, spans


def info_from_text(doc_id: str, text: str):
    """Layer the remaining GetInfoOnPDF per-page blocks onto the rich
    body (rich_from_text) — the corpus for the widened E17 page-info
    gate. Everything is a pure function of the text (and its sha256) so
    the DuckDB oracle can re-derive it closed-form:

      * LINKS (GetInfoOnPDF.java:921-941: unique URIs from Link
        annotations with URI actions): even pages carry TWO Link
        annotations sharing one URI (the unique-URI set must collapse
        them) and pages ≡ 0 (mod 4) a second, distinct URI. The wire
        body is ``Link||||{uri}`` — the URI rides a dedicated 5th body
        field (the action, not the contents: PDAnnotationLink contents
        stay null in the reference, so links must NOT inflate the
        annotation contents count);
      * XOBJECT COUNTS (:992-1020, by type from page resources): pages
        ≡ 0 (mod 3) carry 1 + (p % 2) distinct Image XObjects with the
        first drawn TWICE (resource names count once, draws don't);
        pages ≡ 3 (mod 4) carry one Form XObject (``form-`` ref
        prefix);
      * MULTIMEDIA (:1022-1037: RichMedia annotations with Subtype +
        Contents): page 1 iff sha256 hex digit 1 is even, plus every
        page ≡ 0 (mod 7) — contents non-empty, so these DO count in
        the contents tally, unlike links.
    """
    did, spans = rich_from_text(doc_id, text)
    words = text.split()
    if not words:
        return did, spans
    n_lines = (len(words) + 7) // 8
    n_pages = (n_lines - 1) // 40 + 1
    h = hashlib.sha256(text.encode("utf-8", "surrogatepass")).hexdigest()
    for p in range(1, n_pages + 1):
        if p % 2 == 0:
            uri = f"https://ex.test/{did}/p{p}"
            spans.append(("annotation",
                          f"{p}|90.0|700.0|120.0|12.0\tLink||||{uri}",
                          "", len(spans)))
            spans.append(("annotation",
                          f"{p}|90.0|680.0|120.0|12.0\tLink||||{uri}",
                          "", len(spans)))
            if p % 4 == 0:
                spans.append(("annotation",
                              f"{p}|90.0|660.0|120.0|12.0\tLink||||"
                              f"https://alt.test/p{p}",
                              "", len(spans)))
        if p % 3 == 0:
            for i in range(1 + p % 2):
                ref = f"media-{h[:6]}-{p}-{i}"
                _emit_media(spans, MediaDraw(p, 100.0 + 30.0 * i, 600.0,
                                             120.0, 80.0, ref))
            _emit_media(spans, MediaDraw(p, 300.0, 600.0, 120.0, 80.0,
                                         f"media-{h[:6]}-{p}-0"))
        if p % 4 == 3:
            _emit_media(spans, MediaDraw(p, 80.0, 560.0, 100.0, 60.0,
                                         f"form-{h[:6]}-{p}"))
        if (p == 1 and int(h[1], 16) % 2 == 0) or (p > 1 and p % 7 == 0):
            spans.append(("annotation",
                          f"{p}|250.0|540.0|90.0|50.0\tRichMedia|clip {p}||",
                          "", len(spans)))
    return did, spans


def tables_from_text(doc_id: str, text: str):
    """Derive a TWO-LATTICE-TABLE page deterministically from a plain
    text (E14 multi-table gate): table A is a 2x3 grid at y 100..140,
    table B a 3x2 grid at y 300..360 (disjoint rule components). Cell
    (r, c) holds the doc's word[(base + r*ncols + c) % n_words],
    clipped to TABLE_CELL_MAX_CHARS. Empty texts yield empty docs."""
    from ..kernel.tables import Rule, encode_rule

    words = text.split()
    spans: list[tuple[str, str, str, int]] = []
    if not words:
        return doc_id, spans

    def emit_grid(xs: list[float], ys: list[float], base: int) -> None:
        for ry in ys:
            spans.append(("rule", encode_rule(Rule(1, xs[0], ry, xs[-1], ry)),
                          "", len(spans)))
        for rx in xs:
            spans.append(("rule", encode_rule(Rule(1, rx, ys[0], rx, ys[-1])),
                          "", len(spans)))
        n_cols = len(xs) - 1
        for r in range(len(ys) - 1):
            for c in range(n_cols):
                w = words[(base + r * n_cols + c) % len(words)]
                run = TextRun(1, xs[c] + 5.0, ys[r] + 5.0, 9.0, FONT,
                              w[:TABLE_CELL_MAX_CHARS])
                spans.append(("text", wire.encode_text_run(run), "",
                              len(spans)))

    emit_grid([100.0, 200.0, 300.0, 400.0], [100.0, 120.0, 140.0], 0)
    emit_grid([100.0, 200.0, 300.0], [300.0, 320.0, 340.0, 360.0], 6)
    return doc_id, spans


def single_table_from_text(doc_id: str, text: str):
    """Derive a ONE-lattice-table page (the pdf->xlsx 'Page {p}'
    single-table sheet-naming path): just tables_from_text's grid A —
    the 2x3 grid at y 100..140, cell (r, c) = word[(r*3 + c) %
    n_words] clipped to TABLE_CELL_MAX_CHARS."""
    _did, spans = tables_from_text(doc_id, text)
    # grid A = 3 horizontal + 4 vertical rules + 6 cell runs = spans 0-12
    return doc_id, spans[:13]


def stream_table_from_text(doc_id: str, text: str):
    """Derive a STREAM-mode table page (E14 whitespace columns): 4 rows
    x 3 columns at x = 72/272/472, y = 100 + 20r; cell (r, c) holds
    word[(r*3 + c) % n_words] clipped to TABLE_CELL_MAX_CHARS (so the
    widest cell, 16 chars * 5.5 pt, ends well before the next column —
    the whitespace gap always exceeds STREAM_COL_GAP)."""
    words = text.split()
    spans: list[tuple[str, str, str, int]] = []
    if not words:
        return doc_id, spans
    xs = (72.0, 272.0, 472.0)
    for r in range(4):
        y = 100.0 + 20.0 * r
        for c in range(3):
            w = words[(r * 3 + c) % len(words)]
            run = TextRun(1, xs[c], y, FS, FONT, w[:TABLE_CELL_MAX_CHARS])
            spans.append(("text", wire.encode_text_run(run), "", len(spans)))
    return doc_id, spans


def synth_from_text(doc_id: str, text: str):
    """Derive an interleaved raw document deterministically from a plain
    text (used to build the corpus from the driver's read-only
    ``documents`` table — deterministic, no external data). Lays words
    onto Letter pages at 40 lines/page, ~8 words/line; every 3rd page
    gets a media draw keyed by a content hash; docs whose hash ends in
    0 get an attachment."""
    words = text.split()
    spans: list[tuple[str, str, str, int]] = []
    h = hashlib.sha256(text.encode("utf-8", "surrogatepass")).hexdigest()
    # hot loop: precomputed _BODY_TAILS / _SYNTH_MEDIA_TAIL headers
    # (byte-identical wires, see the tails' comment) instead of
    # TextRun + encode per line
    append = spans.append
    page, line_on_page = 1, 0
    page_s = "1"
    for i in range(0, len(words), 8):
        append(("text", page_s + _BODY_TAILS[line_on_page]
                + " ".join(words[i:i + 8]), "", len(spans)))
        line_on_page += 1
        if line_on_page >= 40:
            if page % 3 == 0:
                ref = "media-" + hashlib.sha256(f"{h}:{page}".encode()).hexdigest()[:8]
                append(("media", page_s + _SYNTH_MEDIA_TAIL, ref,
                        len(spans)))
            page, line_on_page = page + 1, 0
            page_s = str(page)
    if h.endswith("0"):
        spans.append(("attachment", "extra.dat",
                      "media-" + h[:8], len(spans)))
    return doc_id, spans


def analysis_from_text(doc_id: str, text: str):
    """Layer deterministic DOCUMENT-ANALYSIS state onto the
    synth_from_text body — the corpus for the direct E16/E17-security
    and S1-comparator gates. Everything is a pure function of
    sha256(text), re-derived independently by the DuckDB oracles:

      * Info-dict metadata (AnalysisController.java /document-
        properties): title = first 4 words; created/modified as epoch
        seconds from hash prefixes (drives the byDateCreated/
        byDateModified merge comparators, MergeController.java:124-135);
      * encryption block (GetInfoOnPDF.java:487-501): docs with an even
        hex digit 13 are 'encrypted' with AESV3/256/rev 6 or
        AESV2/128/rev 4 by digit 14's parity; revision-6 docs also
        restrict printing (:116-124);
      * AcroForm fields (AnalysisController.java /form-fields):
        digit 15 mod 3 fields (text/checkbox alternating, value =
        word i); digit 16 mod 4 == 0 adds a signature field, == 1 sets
        the XFA flag.
    """
    did, spans = synth_from_text(doc_id, text)
    words = text.split()
    h = hashlib.sha256(text.encode("utf-8", "surrogatepass")).hexdigest()

    def hx(i: int) -> int:  # value of hex digit i (0-based)
        return int(h[i], 16)

    title = " ".join(words[:4])
    created = 1_600_000_000 + int(h[:8], 16) % 10_000_000
    modified = created + int(h[8:12], 16)
    for key, val in (("title", title), ("created", str(created)),
                     ("modified", str(modified))):
        spans.append(("meta", f"{key}|{val}", "", len(spans)))

    if hx(12) % 2 == 0:
        aes3 = hx(13) % 2 == 0
        algo, keylen, rev = (("AESV3", 256, 6) if aes3
                             else ("AESV2", 128, 4))
        spans.append(("meta", "is_encrypted|true", "", len(spans)))
        spans.append(("meta", f"encrypt_algorithm|{algo}", "", len(spans)))
        spans.append(("meta", f"encrypt_keylen|{keylen}", "", len(spans)))
        spans.append(("meta", f"encrypt_revision|{rev}", "", len(spans)))
        spans.append(("meta",
                      f"perm_can_print|{'false' if rev == 6 else 'true'}",
                      "", len(spans)))
    else:
        spans.append(("meta", "is_encrypted|false", "", len(spans)))

    for i in range(hx(14) % 3):
        ftype = "text" if i % 2 == 0 else "checkbox"
        val = words[i] if i < len(words) else ""
        spans.append(("formfield", f"field{i}|{ftype}|{val}", "",
                      len(spans)))
    if hx(15) % 4 == 0:
        spans.append(("formfield", "sig0|signature|", "", len(spans)))
    elif hx(15) % 4 == 1:
        spans.append(("meta", "acroform_xfa|true", "", len(spans)))
    return did, spans


def autorotate_from_text(doc_id: str, text: str):
    """Four-page orientation corpus for the /auto-rotate-pdf TEXT
    detection path (AutoRotateController.java:134-243 text mode +
    AutoRotateDetection.java:84-188). Per page p (1..4) everything is
    a pure function of sha256(text) hex digits (DuckDB mirror:
    _hexv positions p / p+4 / p+8):

      * pagemeta /Rotate state R = 90 * (hx(p-1) % 4);
      * dominant glyph direction d = 90 * (hx(p+3) % 4), carried as a
        ``@{degrees}`` suffix on the font style key (the wire has no
        TextPosition.getDir slot; the font field is an opaque style
        key through every kernel stage, so the suffix rides along
        untouched and only the auto-rotate operator interprets it;
        d == 0 keeps the bare font name — the default path);
      * archetype a = hx(p+7) % 4 covers all four detection outcomes:
          a=0 dense dominant  — 40 glyphs at d + 1 stray at d+90
                                (MIN_GLYPHS=30 / MIN_DOMINANCE=0.95 bar)
          a=1 sparse unanimous — 10 glyphs at d (the
                                MIN_GLYPHS_UNANIMOUS=8 / 0.99 bar)
          a=2 too few glyphs  — 5 glyphs at d (undecided,
                                'tooFewGlyphs')
          a=3 dense split     — 20 at d + 15 at d+180 (undecided,
                                'noDominantDirection')

    Undecided pages make the consensus inference
    (AutoRotateController.inferUndetectedPages:205-243) observable:
    whether a page is inferred depends on the OTHER pages sharing its
    /Rotate value agreeing on one correction. Empty docs emit
    nothing."""
    words = text.split()
    spans: list[tuple[str, str, str, int]] = []
    if not words:
        return doc_id, spans
    h = hashlib.sha256(text.encode("utf-8", "surrogatepass")).hexdigest()

    def hx(i: int) -> int:
        return int(h[i], 16)

    def font(d: int) -> str:
        return FONT if d == 0 else f"{FONT}@{d}"

    for p in range(1, 5):
        rot = 90 * (hx(p - 1) % 4)
        d = 90 * (hx(p + 3) % 4)
        a = hx(p + 7) % 4
        spans.append(("pagemeta",
                      wire.encode_pagemeta(p, 612.0, 792.0, rot),
                      "", len(spans)))
        groups = {0: ((40, d), (1, (d + 90) % 360)),
                  1: ((10, d),),
                  2: ((5, d),),
                  3: ((20, d), (15, (d + 180) % 360))}[a]
        for j, (n, gd) in enumerate(groups):
            run = TextRun(p, LEFT_X, TOP_Y + LINE_STEP * j, FS,
                          font(gd), "g" * n)
            spans.append(("text", wire.encode_text_run(run),
                          "", len(spans)))
    return doc_id, spans


def chapters_from_text(doc_id: str, text: str):
    """Derive a two-CHAPTER document from plain text — the corpus for
    the pdf->epub gate (ConvertPDFToEpubController.java:26-27
    SMART_CHAPTER_EXPRESSION: a heading containing 'Chapter ' starts
    a spine item).

    Docs under 24 words yield NO spans (kept docs must have a body
    glyph majority so the weighted glyph-size median stays at the
    11 pt body size and the 18 pt 'Chapter N' lines land in the
    heading1 branch: 18/11 > 1.4). Kept docs split their words in
    half (ceil) — 'Chapter 1' + first-half body lines of 6 words,
    then 'Chapter 2' + the rest, all on page 1, consecutive y steps
    of 14 so every chapter body merges into ONE paragraph (gap
    14-11=3 < 0.8*11)."""
    words = text.split()
    if len(words) < 24:
        return doc_id, []
    half = (len(words) + 1) // 2
    spans: list[tuple[str, str, str, int]] = []
    line_no = 0

    def emit(content: str, size: float) -> None:
        nonlocal line_no
        run = TextRun(1, LEFT_X, TOP_Y + LINE_STEP * line_no, size,
                      FONT, content)
        spans.append(("text", wire.encode_text_run(run), "", len(spans)))
        line_no += 1

    for ch, chunk in ((1, words[:half]), (2, words[half:])):
        emit(f"Chapter {ch}", 18.0)
        for i in range(0, len(chunk), 6):
            emit(" ".join(chunk[i:i + 6]), FS)
    return doc_id, spans


def slides_from_text(doc_id: str, text: str):
    """Derive a two-PAGE document from plain text — the corpus for the
    pdf->pptx gate (one slide per page, the soffice invariant).

    Same keep rule as chapters_from_text (docs under 24 words yield NO
    spans; the 11 pt body majority keeps 18 pt 'Part N' lines in the
    heading1 branch). Kept docs split their words in half (ceil):
    page 1 carries 'Part 1' + first-half body lines of 6 words,
    page 2 'Part 2' + the rest — page 2 opens with a heading, so the
    cross-page continuation quirk never fires and the per-page and
    stitched views agree."""
    words = text.split()
    if len(words) < 24:
        return doc_id, []
    half = (len(words) + 1) // 2
    spans: list[tuple[str, str, str, int]] = []

    for page, part, chunk in ((1, 1, words[:half]), (2, 2, words[half:])):
        line_no = 0

        def emit(content: str, size: float) -> None:
            nonlocal line_no
            run = TextRun(page, LEFT_X, TOP_Y + LINE_STEP * line_no,
                          size, FONT, content)
            spans.append(("text", wire.encode_text_run(run),
                          "", len(spans)))
            line_no += 1

        emit(f"Part {part}", 18.0)
        for i in range(0, len(chunk), 6):
            emit(" ".join(chunk[i:i + 6]), FS)
    return doc_id, spans
