"""markt_database_analyzer_spark — a PySpark-native analytics engine.

A ground-up re-expression of the query/data-processing capabilities of the
reference repo ``Elwii04/Markt-Database-Analyzer`` (``analyse.py``, 513 LoC of
eager pandas over SQLite) as a lazy, distributed, Catalyst-optimized Spark
engine, plus the large-scale data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) a 100 TB training-data pipeline
needs.

Layout
------
- ``session``    : SparkSession factory (AQE on, ANSI-safe coercion stance).
- ``sources``    : schema-declared readers for the at-rest Parquet tables and
                   reference-shaped fixtures (monitor_records / profiles).
- ``functions``  : scalar/cleaning/binning/aggregation column helpers
                   (SURVEY.md §2.7, §2.8).
- ``operators``  : relational building blocks — dedup, first/last-by-order,
                   lag deltas, spine joins, rolling means, HAVING semi-joins,
                   top-k (SURVEY.md §2.3–§2.6, §2.9).
- ``plans``      : the reference's three end-to-end analyses (A, B1, B2, C)
                   rebuilt as single lazy DataFrame pipelines.
- ``datapipe``   : scale extensions — dedup (exact/MinHash/SimHash/Jaccard),
                   ANN similarity search, text analysis, multimodal columns.
- ``streaming``  : Structured Streaming variants of the batch shapes.
"""

__version__ = "0.1.0"
