"""Table sources (parquet; Iceberg gated)."""

from .tables import DOCS_SCHEMA, RAW_SPAN_STRUCT, TPCH_TABLES, read_docs, read_table, register_views

__all__ = ["DOCS_SCHEMA", "RAW_SPAN_STRUCT", "TPCH_TABLES", "read_docs", "read_table", "register_views"]
