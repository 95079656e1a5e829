"""End-to-end pipeline assembly — the reference's three Airflow stages
(EP1 extract -> EP2 transform -> EP3 load, dag.py:78) collapsed into one
Spark application (SURVEY.md §3 "Spark lifecycle replacing this").

The XCom CSV hop, both S3 sensors, and all manual archive/delete moves
disappear: DataFrames pass between stages natively, and the streaming
variant (streaming/file_pipeline.py) owns exactly-once file tracking.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cleaning import clean_properties
from ..sinks.writers import write_jdbc, write_silver, write_tsv
from ..sources.csv import read_tsv


@dataclass
class PipelineResult:
    bronze_rows: int
    silver_rows: int
    silver_df: DataFrame


def run_batch_pipeline(
    spark: SparkSession,
    inbox_path: str,
    silver_path: str | None = None,
    silver_tsv_path: str | None = None,
    jdbc_url: str | None = None,
) -> PipelineResult:
    """Read every TSV in the inbox (no one-file-per-run limit —
    transform.py:8-13's single-key assumption is gone), clean, and write
    the configured sinks. One job, one logical plan per sink action."""
    bronze = read_tsv(spark, inbox_path)
    silver = clean_properties(bronze).cache()

    silver_rows = silver.count()
    if silver_path:
        write_silver(silver, silver_path)
    if silver_tsv_path:
        write_tsv(
            silver.withColumn(
                # the reference persists dump_date pre-formatted
                # (transform.py:107-111); we format only at this boundary
                "dump_date",
                F.date_format("dump_date", "yyyy_MM_dd_HHmmss"),
            ),
            silver_tsv_path,
        )
    if jdbc_url:
        write_jdbc(silver, jdbc_url)

    result = PipelineResult(
        bronze_rows=bronze.count(), silver_rows=silver_rows, silver_df=silver
    )
    return result
