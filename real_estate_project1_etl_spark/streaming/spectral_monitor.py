"""Spectral drift monitoring WHILE INGESTING embeddings — the streaming
twin of the batch spectral family (round-12 verdict item 6: direction
drift is a natural per-batch monitor).

The quantized scatter's sufficient statistics (Gram cells, dimension
sums, row count — :func:`~..operators.spectral.scatter_partials`) are
ADDITIVE, so the maintenance loop is the sketch-store shape exactly
(streaming/sketch_store.py): each micro-batch writes its OWN delta
partition (``batch_id``-partitioned parquet, dynamic overwrite) with no
read of predecessor state and no fold order.  A replayed micro-batch
overwrites its partition with identical bytes — exactly-once under the
checkpoint replay contract — and the reader merges partitions by
summing, which reconstructs the EXACT full-corpus statistics:
``scatter_from_partials(store)`` is value-identical to
``quantized_scatter(all_rows_so_far, accumulate='decimal')``, so stream
== batch holds for the scatter, the extracted direction, and the drift
statistic, across restarts (pinned in tests/test_streaming_spectral.py).

The monitor itself: :func:`current_direction` extracts the top
principal direction from the merged store;
:func:`~..operators.spectral.direction_drift` against a pinned
reference direction (yesterday's snapshot, the training-corpus
direction) yields the one-row ``cos2_ppm`` drift report — a
distribution shift between crawls rotates the dominant direction long
before aggregate norms move.

Scale shape per micro-batch: one batch-sized scan + partial aggregation
to <= d^2/2 + d + 1 decimal cells; the store grows by that model-sized
delta per batch and the drift query never touches the embedding stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.spectral import (
    power_iteration_top_component,
    scatter_from_partials,
    scatter_partials,
)

__all__ = [
    "current_direction",
    "load_merged_partials",
    "start_scatter_maintenance",
]


def start_scatter_maintenance(
    spark: SparkSession,
    inbox_path: str,
    schema,
    *,
    vec_col: str = "embedding",
    scale_pow2: int = 8,
    store_path: str,
    checkpoint_path: str,
    max_files_per_trigger: int = 1,
    available_now: bool = True,
    batch_id_offset: int = 0,
) -> StreamingQuery:
    """readStream over a JSON inbox of embedding rows -> per-batch
    additive scatter partials -> commit under the batch's own
    ``batch_id`` partition (idempotent overwrite on replay).

    ``batch_id_offset`` shifts sink partition ids for a rebuilt
    checkpoint (tools/migrate_state_checkpoint.py), same as the dedup /
    classifier / sketch stores.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        bid = int(batch_id) + int(batch_id_offset)
        delta = scatter_partials(batch_df, vec_col, scale_pow2)
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


def load_merged_partials(spark: SparkSession, store_path: str) -> DataFrame:
    """Every committed delta partition, ready for
    :func:`~..operators.spectral.scatter_from_partials` (which performs
    the additive merge itself)."""
    return spark.read.parquet(store_path).select("kind", "i", "j", "val")


def current_direction(
    spark: SparkSession, store_path: str, dim: int, n_iters: int = 8
) -> DataFrame:
    """Top principal direction ``(i, v_ppm)`` of everything ingested so
    far — exact reconstruction from the delta store, never a rescan of
    the embedding stream."""
    scatter = scatter_from_partials(load_merged_partials(spark, store_path))
    return power_iteration_top_component(scatter, dim=dim, n_iters=n_iters)
