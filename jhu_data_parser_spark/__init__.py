"""jhu_data_parser_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo ``stefancaspersz/jhu-data-parser`` (a single-threaded
CSV→nested-JSON→S3 ETL whose query side was delegated to AWS Athena;
see ``SURVEY.md``), extended with the operators a large-scale
training-data pipeline needs (dedup, similarity search, text analysis,
multimodal column plumbing) — every operator designed for a
multi-executor cluster at 100 TB, tested locally on synthetic data.

Layout
------
- ``session``    : tuned ``SparkSession`` builder (AQE, Arrow, shuffle sizing)
- ``sources``    : CSV (DictReader-compatible), parquet tables, HTTP staging,
                   partitioned-JSON lake reader
- ``operators``  : reshape (wide→nested unpivot), joins (first-match enrich,
                   as-of, range), dedup (exact/MinHash/SimHash/Jaccard),
                   similarity (cosine top-k, LSH-bucketed), text analysis,
                   multimodal plumbing
- ``functions``  : reusable column-expression builders (pure, no I/O)
- ``plans``      : the named query catalog (queries + DuckDB oracle SQL twins)
- ``streaming``  : Structured Streaming variants (watermarks, windows,
                   availableNow trigger)
- ``etl``        : the reference-parity pipelines (parser.py / parser2.py
                   contracts re-expressed as DataFrame plans)
"""

__version__ = "0.1.0"
