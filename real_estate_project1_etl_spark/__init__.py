"""PySpark-native analytics engine with the query/data-processing surface of
the reference ETL pipeline (hconst/real-estate-project1-etl), re-expressed
Spark-first, plus large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing).

Layout
------
- ``session``    : SparkSession factory tuned for scale-out defaults.
- ``schemas``    : declared StructTypes (bronze/silver properties, testdata).
- ``sources``    : scans — parquet/CSV/JDBC readers, HTML record parser,
                   file-discovery (batch + Structured Streaming).
- ``sinks``      : CSV / partitioned-Parquet / JDBC writers.
- ``functions``  : native Column-expression building blocks (no Python UDFs
                   in the hot path — everything stays in whole-stage codegen).
- ``operators``  : composed dataflow operators — cleaning chain, relational
                   (join/agg/window/topk), dedup, similarity, text stats,
                   multimodal plumbing.
- ``plans``      : end-to-end pipeline assembly (bronze -> silver -> gold).
- ``streaming``  : Structured Streaming equivalents of the reference's
                   sensor/archive micro-batch protocol + event-time windows.
"""

__version__ = "0.1.0"
