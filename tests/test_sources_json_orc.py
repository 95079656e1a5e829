"""JSONL source (declared schema + corrupt-record quarantine) and ORC
format round-trip — completing the source/sink format matrix beyond
parquet/TSV."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from real_estate_project1_etl_spark.sources.json import (
    CORRUPT_COL,
    read_jsonl,
    split_corrupt,
)

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _write_jsonl(tmp_path, rows, bad_lines=()):
    p = os.path.join(str(tmp_path), "events.jsonl")
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
        for line in bad_lines:
            f.write(line + "\n")
    return p


def test_jsonl_clean_read(spark, tmp_path):
    rows = [
        {"event_id": i, "user_id": i % 3, "event_type": "click", "value": i * 1.5}
        for i in range(20)
    ]
    p = _write_jsonl(tmp_path, rows)
    df = read_jsonl(spark, p, SCHEMA)
    clean, bad = split_corrupt(df)
    assert bad.count() == 0
    got = {r["event_id"]: (r["user_id"], r["value"]) for r in clean.collect()}
    assert got == {i: (i % 3, i * 1.5) for i in range(20)}
    assert CORRUPT_COL not in clean.columns


def test_jsonl_corrupt_rows_quarantined_not_dropped(spark, tmp_path):
    rows = [{"event_id": 1, "user_id": 2, "event_type": "view", "value": 3.0}]
    bad = ['{"event_id": broken', "not json at all"]
    p = _write_jsonl(tmp_path, rows, bad)
    df = read_jsonl(spark, p, SCHEMA)
    clean, quarantine = split_corrupt(df)
    assert clean.count() == 1
    q = [r[CORRUPT_COL] for r in quarantine.collect()]
    assert sorted(q) == sorted(bad)


def test_jsonl_missing_fields_null_padded(spark, tmp_path):
    p = _write_jsonl(tmp_path, [{"event_id": 7}])
    clean, bad = split_corrupt(read_jsonl(spark, p, SCHEMA))
    row = clean.collect()[0]
    assert row["event_id"] == 7 and row["user_id"] is None and bad.count() == 0


def test_jsonl_failfast_raises(spark, tmp_path):
    p = _write_jsonl(tmp_path, [], bad_lines=["{bad"])
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    with _pytest.raises(Exception) as ei:
        read_jsonl(spark, p, SCHEMA, mode="FAILFAST").collect()
    assert isinstance(ei.value, Py4JJavaError) or "Malformed" in str(ei.value)


def test_orc_round_trip_matches_parquet(spark, sf_dir, tmp_path):
    # ORC is the second columnar format Spark ships natively; assert a
    # lossless round-trip of a representative slice (doubles, strings,
    # timestamps stay value-identical)
    from real_estate_project1_etl_spark.sources.parquet import load_table

    src = load_table(spark, sf_dir, "orders")
    p = os.path.join(str(tmp_path), "orders_orc")
    src.write.mode("overwrite").orc(p)
    back = spark.read.orc(p)
    assert back.schema == src.schema
    a = src.orderBy("o_orderkey").collect()
    b = back.orderBy("o_orderkey").collect()
    assert a == b


def test_orc_predicate_pushdown_in_plan(spark, sf_dir, tmp_path):
    from real_estate_project1_etl_spark.sources.parquet import load_table

    src = load_table(spark, sf_dir, "orders")
    p = os.path.join(str(tmp_path), "orders_orc2")
    src.write.mode("overwrite").orc(p)
    q = spark.read.orc(p).filter(F.col("o_custkey") == 42).select("o_orderkey")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "o_custkey" in plan
