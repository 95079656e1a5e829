"""Sketch-while-ingest: mergeable sketches maintained CONTINUOUSLY as
facts arrive — the streaming twin of the ``operators.sketch`` rollup
family (KMV / CMS / log2-histogram), mirroring the incremental-dedup
and train-while-ingest loops.

Because the histogram sketch is ADDITIVE (bucket counters sum), the
streaming story is strictly simpler than the classifier's: a
micro-batch's contribution is a pure function of that batch's rows
ALONE — no read of the predecessor's state, no fold order. Each batch
writes its own delta partition (``batch_id``-partitioned parquet,
dynamic overwrite), so a replayed micro-batch overwrites its partition
with identical bytes — exactly-once under the checkpoint replay
contract — and readers merge partitions by summing counters, which is
exactly :func:`~..operators.sketch.hist_merge_quantiles`'s merge step.
Stream == batch therefore holds not just for the final estimate but for
the merged counter table itself (pinned in
tests/test_streaming_sketch.py, across a restart).

Scale shape per micro-batch: one batch-sized aggregation to <= 63
cells per group; the store grows by (groups x <= 63) rows per batch and
compacts by the same additive merge whenever convenient. Quantile
queries never touch the fact stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.sketch import log2_hist_sketch

__all__ = ["load_merged_sketch", "start_sketch_maintenance"]


def load_merged_sketch(
    spark: SparkSession, store_path: str, group_cols: list[str]
) -> DataFrame:
    """Merge every committed delta partition into the current sketch
    table ``(group_cols..., bucket, cnt)`` — one additive aggregation
    over (groups x <= 63 x batches) rows, never the fact stream."""
    return (
        spark.read.parquet(store_path)
        .groupBy(*group_cols, "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def start_sketch_maintenance(
    spark: SparkSession,
    inbox_path: str,
    schema,
    *,
    group_cols: list[str],
    value_col: str,
    store_path: str,
    checkpoint_path: str,
    max_files_per_trigger: int = 1,
    available_now: bool = True,
    batch_id_offset: int = 0,
) -> StreamingQuery:
    """readStream over a JSON inbox -> per-batch log2-histogram delta ->
    commit under the batch's own ``batch_id`` partition.

    ``batch_id_offset`` shifts sink partition ids for a rebuilt
    checkpoint (tools/migrate_state_checkpoint.py passes last
    committed + 1), same as the dedup and classifier stores.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        bid = int(batch_id) + int(batch_id_offset)
        sk = log2_hist_sketch(batch_df, group_cols, value_col)
        (
            sk.withColumn("batch_id", F.lit(bid))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(store_path)
        )

    reader = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(inbox_path)
    )
    writer = (
        reader.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
