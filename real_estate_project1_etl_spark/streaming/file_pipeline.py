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
