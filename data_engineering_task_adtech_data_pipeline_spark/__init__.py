"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference adtech pipeline
(`jagochi/data_engineering_task_adtech_data_pipeline`), re-expressed
Spark-first.

Layout
------
- ``session``    — tuned SparkSession factory
- ``schemas``    — explicit StructTypes (no inference anywhere)
- ``sources``    — parquet/JDBC readers + deterministic synthetic generators
- ``operators``  — upsert (ReplacingMergeTree semantics), CDC delta,
                   dedup (exact/minhash/simhash/jaccard), similarity search,
                   text analysis, multimodal plumbing
- ``functions``  — scalar helpers incl. ClickHouse-compat zero-fill joins
- ``plans``      — silver/gold builders (the reference's two DAGs) + the
                   testdata query battery
- ``streaming``  — Structured Streaming variant of the incremental path
"""

__version__ = "0.1.0"
