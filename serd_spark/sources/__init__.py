"""Sources and sinks: synthetic Common-Crawl-style corpus generator,
parquet-backed warehouse with snapshot/lineage semantics."""
