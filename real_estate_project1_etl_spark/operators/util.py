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


def assign_global_ids(
    df: DataFrame, order_col: str, id_name: str = "global_id"
) -> DataFrame:
    """Contiguous ids 0..n-1 in ``order_col`` order, WITHOUT the
    single-task bottleneck of ``row_number() OVER (ORDER BY ...)`` — the
    naive window funnels the entire table through one partition, which is
    the canonical 100 TB deadlock (training pipelines need global sample
    ids on corpora far past single-task memory).

    Mechanics: range-repartition on the order key (partitions hold
    contiguous, ordered key ranges), count rows per partition (a tiny
    aggregate — one row per partition), turn the counts into cumulative
    offsets on the driver (partition-count-sized, not data-sized), then
    id = offset[partition] + per-partition row_number. The per-partition
    window parallelizes across partitions; everything stays JVM-side.

    Result is value-identical to the global window (oracle-checked by the
    ``global_ids_documents`` query) for a unique order key.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    spark = df.sparkSession
    # localCheckpoint pins the range boundaries: the counts job and the
    # output job must see the SAME partitioning, and the range sampler is
    # not guaranteed to re-draw identical boundaries across evaluations
    # LAZY: the per-partition counts job right below scans every
    # partition, so it is the materializing action — the boundaries are
    # still drawn exactly once (blocks stored during that job) and the
    # separate eager-checkpoint job is gone
    arranged = (
        df.repartitionByRange(F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    counts = sorted(
        (r["_pid"], r["n"])
        for r in arranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    offsets, acc = [], 0
    for pid, n in counts:
        offsets.append((pid, acc))
        acc += n
    off = spark.createDataFrame(offsets, "_pid int, _offset bigint")
    w = Window.partitionBy("_pid").orderBy(order_col)
    return (
        arranged.join(F.broadcast(off), "_pid")
        .withColumn(id_name, F.col("_offset") + F.row_number().over(w) - 1)
        .drop("_pid", "_offset")
    )
