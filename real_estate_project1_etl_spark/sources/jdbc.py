"""JDBC source — the read side of the reference's PostgreSQL table
(reference: load_db.py:23-47 writes ``properties_data``; a dashboard-like
consumer reads it back).

Untestable in this container (no database, no JDBC driver jar) — the
functions are structural: they encode the partitioned-read discipline a
100 TB-adjacent OLTP extract needs (never a single-connection full scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 16,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Partitioned JDBC read: with a numeric ``partition_column`` and
    bounds, Spark issues ``num_partitions`` range-predicated queries in
    parallel instead of one full scan through one connection."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound or 0))
            .option("upperBound", str(upper_bound or 1))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()
