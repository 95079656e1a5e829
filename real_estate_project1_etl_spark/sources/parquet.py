"""Parquet scans over the driver testdata (and any parquet lake).

Spark's parquet source gives predicate pushdown, column pruning, and
vectorized decoding for free — at 100 TB the scan reads only the row-groups
and columns a query touches (check ``PushedFilters`` / ``ReadSchema`` in
``df.explain``). The reference's scan-equivalent reads a whole CSV into
memory (reference: transform.py:15-22) with no pruning at all.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, e.g. ``load_table(spark, sf, 'lineitem')``.

    Spark has no nanosecond timestamp type, so parquet TIMESTAMP(NANOS)
    columns (the ``events.ts`` column) are read as long nanos
    (``legacy.parquet.nanosAsLong``) and converted to microsecond
    timestamps with exact integer division (``div`` — no double round-trip,
    which would lose sub-microsecond precision at 1e18 nanos).
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # TIMESTAMP(NANOS) file read as long nanos
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # TIMESTAMP(MICROS, isAdjustedToUTC=false) file. The session tz
            # is pinned UTC (session.get_spark), so NTZ -> LTZ is the
            # identity on values; the cast restores the plain TIMESTAMP type
            # the engine's time functions (unix_millis, window, watermark)
            # expect. DuckDB reads the same column as naive TIMESTAMP, so
            # oracle compares stay exact.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    from ..schemas import TESTDATA_TABLES

    names = names or tuple(TESTDATA_TABLES)
    return {n: load_table(spark, sf_dir, n) for n in names}
