"""Driver-contract implementation package: helpers, per-family query
modules, and the DuckDB oracle mirrors. ``__spark_entry__`` at the repo
root re-exports everything and assembles queries()/oracle_sql().
"""
