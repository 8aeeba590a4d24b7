"""Reusable column-expression builders (pure functions, no I/O)."""

from jhu_data_parser_spark.functions.exprs import dec_sum, dec_avg, day_str, revenue

__all__ = ["dec_sum", "dec_avg", "day_str", "revenue"]
