"""Vectorized Arrow/pandas UDF operator stages (SURVEY.md §2)."""
