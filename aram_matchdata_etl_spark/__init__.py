"""PySpark-native analytics engine with the query/data-processing
capabilities of boaz-lol/aram-matchdata-etl (reference at /root/reference),
re-expressed Spark-first.

Layout:
  session.py    SparkSession factory (AQE on, UTC, Arrow on)
  sources/      parquet table loaders + the deterministic match-shaped view
  operators/    the query registry (relational breadth, match pipeline,
                dedup, similarity, text analysis, multimodal plumbing)
  streaming/    Structured Streaming re-expressions of the reference's
                Redis/Celery crawl-loop semantics
  ml/           Spark ML ranking pipeline (reference's 5-model ensemble flow)
  registry.py   query-name -> callable + DuckDB oracle SQL

Everything here uses the public Apache Spark API only.
"""

__version__ = "0.1.0"
