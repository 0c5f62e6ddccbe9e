"""Scalar/aggregate function surface (SURVEY.md §2.4).

The reference delegates every scalar function to the source database's
dialect (P1); this engine's transform dialect is Spark SQL itself, so the
whole ``pyspark.sql.functions`` library is the function surface. The
``library`` module pins representative slices of it (string, date/time,
array, percentile, approximate sketches) against the DuckDB oracle.
"""
