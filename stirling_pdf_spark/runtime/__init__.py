"""Runtime: metrics, lineage, resume."""
