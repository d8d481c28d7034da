"""Sources & sinks: table catalog (Iceberg-or-parquet) and scan-side filters."""
