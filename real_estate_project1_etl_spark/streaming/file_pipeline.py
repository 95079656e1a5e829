"""Structured-Streaming file pipeline — replaces the reference's
S3KeySensor poll loops and archive/delete exactly-once protocol
(reference: dag.py:45-53,61-69; transform.py:133-139; load_db.py:49-58).

The file-source checkpoint log *is* the processed-file tracker: a file is
consumed exactly once across restarts with no hand-rolled moves. The
optional ``cleanSource='archive'`` reproduces the reference's archival
side-effect natively. ``Trigger.AvailableNow`` gives the daily-batch
semantics (process everything present, then stop) while keeping streaming's
bookkeeping — the direct upgrade of the reference's cron+sensor design.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.cleaning import clean_properties
from ..schemas import PROPERTIES_RAW


def start_file_pipeline(
    spark: SparkSession,
    inbox_path: str,
    silver_path: str,
    checkpoint_path: str,
    archive_path: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """readStream over the TSV inbox -> clean -> append silver parquet.

    At scale: maxFilesPerTrigger bounds each micro-batch; the clean chain
    is the same single narrow stage as batch (code reuse is total — the
    transformation is the same function object).
    """
    reader = (
        spark.readStream.schema(PROPERTIES_RAW)
        .option("sep", "\t")
        .option("header", True)
        .option("maxFilesPerTrigger", 100)
    )
    if archive_path:
        reader = reader.option("cleanSource", "archive").option(
            "sourceArchiveDir", archive_path
        )
    bronze = reader.csv(inbox_path)

    silver = clean_properties(bronze, streaming=True).withColumn(
        "ingest_date", F.to_date("dump_date")
    )

    writer = (
        silver.writeStream.format("parquet")
        .option("path", silver_path)
        .option("checkpointLocation", checkpoint_path)
        .partitionBy("ingest_date")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_foreach_batch_load(
    spark: SparkSession,
    inbox_path: str,
    checkpoint_path: str,
    batch_sink,
    available_now: bool = True,
) -> StreamingQuery:
    """Stream -> ``foreachBatch`` gold load — the streaming form of the
    reference's EP3 DB append (load_db.py:60-73).

    ``batch_sink(df, batch_id)`` receives each micro-batch as a plain
    DataFrame, so any batch writer works — ``write_jdbc`` for the Postgres
    sink, parquet for the lakehouse path. Exactly-once contract: the
    checkpoint replays an unacknowledged batch with the SAME batch_id after
    a crash, so a sink keyed on batch_id (idempotent overwrite / upsert /
    staging-table swap) never double-loads — the principled version of the
    reference's archive-then-delete protocol.
    """
    reader = (
        spark.readStream.schema(PROPERTIES_RAW)
        .option("sep", "\t")
        .option("header", True)
        .option("maxFilesPerTrigger", 100)
    )
    bronze = reader.csv(inbox_path)
    silver = clean_properties(bronze, streaming=True)

    writer = (
        silver.writeStream.foreachBatch(batch_sink)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def idempotent_parquet_batch_sink(base_path: str):
    """A ``batch_sink`` for ``start_foreach_batch_load`` that writes each
    micro-batch to ``base_path/batch_id=N`` with dynamic-overwrite, making
    replays of the same batch_id harmless (JDBC equivalent: DELETE WHERE
    batch_id = N in the same transaction as the INSERT)."""

    def sink(df, batch_id: int) -> None:
        (
            df.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(base_path)
        )

    return sink
