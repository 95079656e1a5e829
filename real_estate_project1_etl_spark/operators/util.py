"""Operator-level utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition only when the input is under-parallel.

    Single-file / single-row-group scans arrive as one task; CPU-heavy
    operators (minhash signatures, cosine scoring) would then serialize.
    On a real cluster the scan is already split, the partition count
    exceeds the floor, and this is a no-op — so the extra shuffle is paid
    exactly when it buys parallelism.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df
