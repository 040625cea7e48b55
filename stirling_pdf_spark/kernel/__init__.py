"""Pure-Python extraction kernel (UDF body == test oracle)."""

from .extract import extract_doc, extract_doc_tuples
from .model import MediaDraw, RawSpan, Span, TextRun

__all__ = [
    "extract_doc",
    "extract_doc_tuples",
    "MediaDraw",
    "RawSpan",
    "Span",
    "TextRun",
]
