"""Data sources: parquet test tables, DictReader-compatible CSV, HTTP
staging, and the partitioned-JSON lake reader (SURVEY.md §2.1)."""

from jhu_data_parser_spark.sources.tables import TABLE_NAMES, load_table, load_tables

__all__ = ["TABLE_NAMES", "load_table", "load_tables"]
