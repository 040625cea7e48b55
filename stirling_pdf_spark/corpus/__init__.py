"""Corpus synthesis."""

from .synth import synth_corpus, synth_doc, synth_from_text

__all__ = ["synth_corpus", "synth_doc", "synth_from_text"]
