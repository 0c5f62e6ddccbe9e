"""Extension operators beyond the reference surface (SURVEY.md §2.10):
event-time windowing, as-of joins, dedup family, similarity search, text
analysis, multimodal columns. Each module exposes QUERIES/ORACLE dicts
merged by ``__spark_entry__``."""
