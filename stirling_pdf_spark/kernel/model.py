"""Span model + layout constants.

Every constant here reproduces a tolerance or cap from the reference
(Stirling-Tools/Stirling-PDF) with a file:line citation, because the
span-sequence-equality contract (kind, text, media_ref, order) depends
on them bit-for-bit (SURVEY.md §2.1.6, BASELINE.md "Layout constants").
"""

from __future__ import annotations

from typing import NamedTuple

# --- line clustering (reference: AllTextLineExtractor.java:32-39) ---
LINE_Y_TOLERANCE = 3.0     # new line when |y - line_y| > 3.0 pt
COLUMN_GAP_X = 14.0        # split a shared baseline when x-gap > 14 pt

# --- column layout vote (reference: PageColumnLayout.java:23-43,65-89) ---
MIN_COLUMN_LINE_WIDTH = 100.0  # only lines >= 100 pt wide vote
GUTTER_SLACK = 30.0            # mid +/- 30 pt dead zone for the vote
MIN_SIDE_LINES = 3             # both sides need >= 3 votes for 2 columns

# --- run merging (reference: PdfJsonConversionService.java:169-171) ---
BASELINE_MERGE_TOLERANCE = 0.5  # pt
ORIENTATION_TOLERANCE = 5e-4

# --- word spacing (reference: PdfModels.java:59-73 RawLine.text()) ---
WORD_SPACE_FACTOR = 0.5   # insert ' ' when gap > 0.5 * avg char width

# --- budgets (reference: PdfTextChunkExtractor.java:28-31,
#     PdfContentExtractor.java:50) ---
MAX_CHUNKS_PER_DOC = 2000
MAX_CHARS_PER_CHUNK = 500
MAX_CHARS_PER_PAGE = 4000

# --- z-order bases (reference: PdfJsonConversionService.java:5174,5590:
#     images draw at -1_000_000 + i, text at 1_000_000 + i; mergeDrawables
#     sorts (zOrder, sequence) so per page all images precede all text) ---
IMAGE_Z_BASE = -1_000_000
TEXT_Z_BASE = 1_000_000

# --- page geometry of the synthetic corpus (reference fixture style:
#     testing/cucumber/features/steps/step_definitions.py:25-74 uses
#     Letter 612x792) ---
PAGE_WIDTH = 612.0
PAGE_HEIGHT = 792.0

# Synthetic glyph-run width model: width = len(content) * CHAR_WIDTH_FACTOR
# * font_size (monospace-ish; makes the 0.5*avg-char-width word-space rule
# and the 14 pt column-gap rule both exercisable).
CHAR_WIDTH_FACTOR = 0.5

# --- attachment caps (reference: AttachmentService.java:47-49) ---
MAX_ATTACHMENT_BYTES = 50 * 1024 * 1024
MAX_DOC_ATTACHMENT_BYTES = 200 * 1024 * 1024

# --- HTML boilerplate heuristics (H7; thresholds are ours, semantics
#     H1-H3 from CustomHtmlSanitizer.java:45-67 and
#     EmlProcessingUtils.java:238-247,594-606; scoring per public
#     Readability/jusText literature, see PAPERS.md) ---
MIN_BLOCK_CHARS = 25       # keep blocks with at least this much text
MAX_LINK_DENSITY = 0.33    # drop blocks where link chars / chars exceeds
MIN_HEADING_CHARS = 5      # headings kept from this length if link-free

SPAN_KINDS = ("text", "media", "attachment", "html", "table", "bookmark", "meta")


class Span(NamedTuple):
    """One extraction-result span. ``order`` is the array index in the
    output spans column; equality contract is (kind, text, media_ref,
    order)."""

    kind: str
    text: str
    media_ref: str
    order: int


class RawSpan(NamedTuple):
    """One raw interleaved segment (input table shape, BASELINE.json
    input_hint): text runs carry a positional wire header (kernel.wire),
    media spans carry geometry + media_ref, attachments carry a
    (possibly empty) filename, html spans carry markup."""

    kind: str
    text: str
    media_ref: str
    offset: int


class TextRun(NamedTuple):
    """A positioned glyph run in screen space (origin top-left, y down —
    the stripper frame, SURVEY.md §1.2)."""

    page: int
    x: float
    y: float
    font_size: float
    font: str
    content: str

    @property
    def width(self) -> float:
        return len(self.content) * CHAR_WIDTH_FACTOR * self.font_size

    @property
    def right(self) -> float:
        return self.x + self.width

    @property
    def avg_char_width(self) -> float:
        if not self.content:
            return 0.0
        return self.width / len(self.content)


class MediaDraw(NamedTuple):
    """One image draw op (reference: PageImageLocator.java:30-86 computes
    the axis-aligned bbox of the unit square through the CTM; we carry
    the resulting bbox directly)."""

    page: int
    x: float
    y: float
    w: float
    h: float
    media_ref: str
