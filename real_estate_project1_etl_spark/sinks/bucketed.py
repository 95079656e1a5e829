"""Bucketed tables — shuffle-free co-located joins (north-star scale
discipline).

Writing both fact tables bucketed by the join key means every future join
on that key reads co-located buckets: no exchange on either side, at any
size. This is the 100 TB answer to 'this join shuffles every run' — pay
the shuffle once at write time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    writer = df.write.bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.mode(mode).format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables — with matching bucket specs Spark
    plans a SortMergeJoin with NO Exchange on either side (assert with
    .explain; tests do)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
