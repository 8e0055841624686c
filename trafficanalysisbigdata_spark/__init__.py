"""PySpark-native analytics engine with the query surface of
ShiroW0lf/TrafficAnalysisBigData, rebuilt Spark-first.

The reference (see SURVEY.md) is a single-node pandas pipeline; this package
re-expresses every operator it computes as declarative Spark DataFrame / SQL
plans so Catalyst + Tungsten own the physical execution, plus the
large-scale-pipeline extensions (dedup, similarity search, text analysis,
multimodal plumbing) required for the 100 TB design target.

Layout:
    session    — SparkSession factory (AQE, Arrow, UTC, shuffle sizing)
    io         — parquet table loaders / sinks
    functions  — scalar column expression library (SURVEY §2.8)
    operators  — relational operators (aggs, top-k, joins, windows, unpivot,
                 dedup, similarity, multimodal)
    sources    — ingest normalization for the reference's native schemas
    plans      — the named-query registry consumed by __spark_entry__.py
    streaming  — snapshot-refresh + watermarked window jobs (SURVEY §2.9)
    ml         — pyspark.ml pipelines M1–M7 (SURVEY §2.11)
"""

__version__ = "0.1.0"
