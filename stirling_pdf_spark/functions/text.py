"""Text-kernel UDF wrappers (Arrow-batched pandas UDFs).

The sentence-packing chunker (kernel/chunker.py, E24) needs real
stateful iteration, so it is UDF territory by design — batched, never
per-row Spark UDFs.
"""

from __future__ import annotations

import pandas as pd


def chunk_text_udf(max_len: int = 512, overlap: int = 64):
    """E24 sentence-packing chunker as array<string> per document."""
    from pyspark.sql.functions import pandas_udf

    from ..kernel.chunker import chunk_text

    @pandas_udf("array<string>")
    def _chunks(s: pd.Series) -> pd.Series:
        return s.map(lambda v: chunk_text(v or "", max_len, overlap))

    return _chunks
