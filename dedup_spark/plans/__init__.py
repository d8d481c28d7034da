"""Plan-level machinery: lineage/metrics recording and checkpoint management."""
