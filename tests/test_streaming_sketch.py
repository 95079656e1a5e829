"""Sketch-while-ingest (streaming/sketch_store.py): per-batch additive
log2-histogram deltas committed under batch_id partitions; the merged
store equals the batch-built sketch of all arrived rows — counter table
AND derived quantiles, across a stream restart."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from real_estate_project1_etl_spark.operators.sketch import (
    hist_merge_quantiles,
    log2_hist_sketch,
)
from real_estate_project1_etl_spark.streaming.sketch_store import (
    load_merged_sketch,
    start_sketch_maintenance,
)

SCHEMA = StructType(
    [StructField("day", StringType()), StructField("v", LongType())]
)


def _rows(start: int, n: int):
    return [
        (f"d{(start + i) % 3}", ((start + i) * 2654435761) % 100_000 + 1)
        for i in range(n)
    ]


def _write(path, rows, mtime):
    with open(path, "w") as f:
        for day, v in rows:
            f.write(json.dumps({"day": day, "v": v}) + "\n")
    os.utime(path, (mtime, mtime))


@pytest.fixture()
def paths(tmp_path):
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    return {
        "inbox": str(inbox),
        "store": str(tmp_path / "skstore"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def _run(spark, p):
    q = start_sketch_maintenance(
        spark,
        p["inbox"],
        SCHEMA,
        group_cols=["day"],
        value_col="v",
        store_path=p["store"],
        checkpoint_path=p["ckpt"],
    )
    q.awaitTermination(300)


def _sketch_dict(df):
    return {
        (r["day"], r["bucket"]): r["cnt"]
        for r in df.select("day", "bucket", "cnt").collect()
    }


def test_streaming_sketch_equals_batch_across_restart(spark, paths):
    now = time.time()
    b1, b2, b3 = _rows(0, 40), _rows(100, 40), _rows(200, 40)
    _write(os.path.join(paths["inbox"], "f1.json"), b1, now - 60)
    _write(os.path.join(paths["inbox"], "f2.json"), b2, now - 30)
    _run(spark, paths)

    # RESTART: a third file arrives, the stream resumes from checkpoint
    _write(os.path.join(paths["inbox"], "f3.json"), b3, now)
    _run(spark, paths)

    merged = load_merged_sketch(spark, paths["store"], ["day"])
    batch = log2_hist_sketch(
        spark.createDataFrame(b1 + b2 + b3, "day string, v bigint"),
        ["day"],
        "v",
    )
    assert _sketch_dict(merged) == _sketch_dict(batch)

    # derived quantiles agree too (same merge feeds hist_merge_quantiles)
    via_stream = {
        r["day"]: (r["n"], r["p500_est"], r["p900_est"], r["p990_est"])
        for r in hist_merge_quantiles(merged, ["day"]).collect()
    }
    via_batch = {
        r["day"]: (r["n"], r["p500_est"], r["p900_est"], r["p990_est"])
        for r in hist_merge_quantiles(batch, ["day"]).collect()
    }
    assert via_stream == via_batch
    # three files -> three committed delta partitions
    parts = {
        p
        for p in os.listdir(paths["store"])
        if p.startswith("batch_id=")
    }
    assert parts == {"batch_id=0", "batch_id=1", "batch_id=2"}
