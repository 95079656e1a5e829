"""JSON-lines scan with a declared schema and an explicit bad-record
policy.

The reference has no JSON source (its interchange is tab-sep CSV,
extract.py:52), but the events table carries a JSON ``props`` payload and
any log-shaped feed arrives as JSONL — so the engine completes the source
matrix. Design rules, same as the TSV source:

- schema is DECLARED, never inferred: inference needs an extra full pass
  over the data (a second 100 TB scan) and drifts when a batch happens to
  miss a rare field;
- malformed rows must be visible, not silently dropped: PERMISSIVE mode
  routes them to a ``_corrupt_record`` column so a quarantine filter can
  count/divert them (the quality_quarantine pattern), while FAILFAST is
  available for contract-enforcing loads;
- one file per line-delimited shard — Spark splits large JSONL files by
  byte ranges, so a single huge shard still parallelizes (unlike
  multiLine JSON, which is one-task-per-file and is deliberately NOT the
  default here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructType


CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Read line-delimited JSON (file, dir, or glob; s3a:// unchanged on a
    cluster). ``mode`` is PERMISSIVE (default: bad rows -> CORRUPT_COL,
    good fields null-padded), DROPMALFORMED, or FAILFAST."""
    full = schema
    if mode.upper() == "PERMISSIVE" and CORRUPT_COL not in schema.fieldNames():
        # build a NEW field list — StructType.add mutates the list it
        # wraps, which would silently grow the caller's schema object
        from pyspark.sql.types import StructField

        full = StructType(
            list(schema.fields) + [StructField(CORRUPT_COL, StringType())]
        )
    return (
        spark.read.schema(full)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine) split on the corrupt-record column.

    Spark refuses plans that reference ONLY the corrupt column of a raw
    JSON scan (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), so
    the parsed batch is cached first — both branches then derive from one
    materialized scan, which is also what you want operationally: the
    quarantine count and the clean load must describe the SAME read, not
    two reads of a possibly-changing prefix. At 100 TB the cache becomes
    a staging parquet write (parse once, split from the staged table);
    callers should ``unpersist()`` the returned clean frame's source when
    done."""
    if CORRUPT_COL not in df.columns:
        return df, df.limit(0)
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, bad
