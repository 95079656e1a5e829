"""Distinct-count monitoring WHILE INGESTING — the streaming twin of
the HLL family (operators/sketch.py hll_registers / hll_estimate).

HLL registers merge by MAX, which is commutative, associative AND
idempotent — strictly stronger than the additive contingency stores
(streaming/eval_monitor.py): a replayed delta cannot overcount even
before the idempotent-overwrite discipline kicks in. The maintenance
loop still follows the sketch-store shape (streaming/sketch_store.py)
for uniformity: each micro-batch writes its own ``(group, bucket,
rho)`` register delta under a ``batch_id`` partition — no predecessor
read, no fold order — and the reader merges partitions by
``max(rho)``. Merged registers are bit-identical to the from-scratch
sketch over everything arrived so far (max-associativity — the same
identity the batch rollup query ``hll_weekly_rollup_users`` pins as
data), so stream == batch holds for registers, the exact dyadic
denominator, and the estimate, across restarts
(tests/test_streaming_hll.py).

Scale shape per micro-batch: one batch-sized partial aggregation to at
most ``2^p`` rows per group — duplicates absorbed map-side, nothing
distinct-shuffled; the store grows by that bounded delta per batch and
the estimate query reads only register rows, never the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.sketch import hll_estimate, hll_registers

__all__ = [
    "current_distinct_estimate",
    "load_merged_registers",
    "start_hll_maintenance",
]


def start_hll_maintenance(
    spark: SparkSession,
    inbox_path: str,
    schema,
    *,
    group_col: str = "event_type",
    value_col: str = "user_id",
    p: int = 6,
    store_path: str,
    checkpoint_path: str,
    max_files_per_trigger: int = 1,
    available_now: bool = True,
    batch_id_offset: int = 0,
) -> StreamingQuery:
    """readStream over a JSON inbox -> per-batch HLL register delta ->
    commit under the batch's own ``batch_id`` partition (idempotent
    overwrite on replay)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        bid = int(batch_id) + int(batch_id_offset)
        delta = hll_registers(batch_df, [group_col], value_col, p=p)
        (
            delta.withColumn("batch_id", F.lit(bid))
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


def load_merged_registers(
    spark: SparkSession, store_path: str, group_col: str = "event_type"
) -> DataFrame:
    """The merged register table ``(group, bucket, rho)`` over every
    committed delta partition — one max-aggregation over bounded
    register rows, never the ingested stream."""
    return (
        spark.read.parquet(store_path)
        .groupBy(group_col, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def current_distinct_estimate(
    spark: SparkSession,
    store_path: str,
    group_col: str = "event_type",
    p: int = 6,
) -> DataFrame:
    """Per-group distinct estimate over everything ingested so far —
    exact reconstruction (registers, dyadic denominator, estimate) from
    the register store."""
    return hll_estimate(
        load_merged_registers(spark, store_path, group_col),
        [group_col],
        p=p,
    )
