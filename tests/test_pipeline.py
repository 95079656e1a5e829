"""End-to-end batch + streaming pipeline tests (EP1-EP3 collapsed)."""

from __future__ import annotations

import csv
import os

from real_estate_project1_etl_spark.plans.pipeline import run_batch_pipeline
from real_estate_project1_etl_spark.streaming.file_pipeline import (
    idempotent_parquet_batch_sink,
    start_file_pipeline,
    start_foreach_batch_load,
)

HEADER = ["purpose", "address", "size_m2", "design", "price_czk", "link"]
ROWS = [
    ["Prodej bytu 2+kk", "Sokolovska, Praha 8", "43 m2", "2+kk", "5 500 000 Kc", "/n/1"],
    ["Prodej domu", "Brno, Jihomoravsky kraj", "120 m2", "4+1", "9 000 000 Kc", "/n/2"],
    ["Prodej bytu 1+kk", "Bratislava", "30 m2", "1+kk", "450 EUR", "/n/3"],
]


def _write_inbox(tmp_path, name="raw_properties_1.csv"):
    inbox = tmp_path / "inbox"
    inbox.mkdir(exist_ok=True)
    with open(inbox / name, "w", newline="") as f:
        w = csv.writer(f, delimiter="\t")
        w.writerow(HEADER)
        w.writerows(ROWS)
    return str(inbox)


def test_batch_pipeline(spark, tmp_path):
    inbox = _write_inbox(tmp_path)
    silver_path = str(tmp_path / "silver")
    res = run_batch_pipeline(spark, inbox, silver_path=silver_path)
    assert res.bronze_rows == 3
    assert res.silver_rows == 2  # EUR row dropped
    back = spark.read.parquet(silver_path)
    assert back.count() == 2
    assert "ingest_date" in back.columns  # partitioned layout
    # lineage column came from the real scanned file name
    names = {r.file_name for r in back.select("file_name").collect()}
    assert names == {"raw_properties_1.csv"}


def test_streaming_file_pipeline_exactly_once(spark, tmp_path):
    inbox = _write_inbox(tmp_path)
    silver = str(tmp_path / "ssilver")
    ckpt = str(tmp_path / "ckpt")

    q = start_file_pipeline(spark, inbox, silver, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(silver).count() == 2

    # restart with no new files -> checkpoint prevents reprocessing
    q = start_file_pipeline(spark, inbox, silver, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(silver).count() == 2

    # drop a second file -> only the new one is consumed
    _write_inbox(tmp_path, "raw_properties_2.csv")
    q = start_file_pipeline(spark, inbox, silver, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(silver).count() == 4


def test_foreach_batch_load_idempotent(spark, tmp_path):
    # streaming EP3: foreachBatch gold load keyed on batch_id — replaying
    # the same inbox (fresh checkpoint, same data) overwrites, not appends
    inbox = _write_inbox(tmp_path)
    gold = str(tmp_path / "gold")
    sink = idempotent_parquet_batch_sink(gold)

    q = start_foreach_batch_load(spark, inbox, str(tmp_path / "fb_ckpt"), sink)
    q.awaitTermination(120)
    assert spark.read.parquet(gold).count() == 2  # EUR row dropped

    # restart with same checkpoint -> no new batches, nothing double-loaded
    q = start_foreach_batch_load(spark, inbox, str(tmp_path / "fb_ckpt"), sink)
    q.awaitTermination(120)
    assert spark.read.parquet(gold).count() == 2

    # simulate a replay of batch 0 (crash before commit): same batch_id
    # re-delivered -> dynamic overwrite keeps the load exactly-once
    replay = spark.read.parquet(gold).drop("batch_id")
    sink(replay, 0)
    assert spark.read.parquet(gold).count() == 2
