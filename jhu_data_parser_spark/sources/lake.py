"""Partitioned-JSON lake reader (SURVEY.md §2.1 S6) — the engine's
replacement for the reference's Glue-crawler + Athena setup
(``src/README.md:5,11``): read the lake, get a temp view, query with
full Spark SQL. Partition pruning on ``type=`` is automatic (dynamic
partition pruning included)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_partitioned_lake", "register_lake_view"]


def read_partitioned_lake(spark: SparkSession, lake_dir: str) -> DataFrame:
    """Read the ``type=<category>/`` JSON lake. Schema is inferred across
    partitions (categories share the record shape); the synthetic
    ``type`` partition column materializes from the directory names, as
    it did for Athena."""
    return spark.read.option("basePath", lake_dir).json(lake_dir)


def register_lake_view(spark: SparkSession, lake_dir: str, view: str = "covid") -> DataFrame:
    df = read_partitioned_lake(spark, lake_dir)
    df.createOrReplaceTempView(view)
    return df
