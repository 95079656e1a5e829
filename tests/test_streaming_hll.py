"""Distinct-count-while-ingest (streaming/hll_monitor.py): per-batch
HLL register deltas committed under batch_id partitions; the merged
store reconstructs the from-scratch sketch bit-for-bit — registers,
exact dyadic denominator and estimate — across a stream restart."""

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
    hll_estimate,
    hll_registers,
)
from real_estate_project1_etl_spark.streaming.hll_monitor import (
    current_distinct_estimate,
    load_merged_registers,
    start_hll_maintenance,
)

SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("user_id", LongType()),
    ]
)


def _rows(start: int, n: int):
    out = []
    for i in range(n):
        h = ((start + i) * 2654435761) % 2**32
        out.append((["click", "view", "buy"][h % 3], h % 700))
    return out


def _write(path, rows, mtime):
    with open(path, "w") as f:
        for et, uid in rows:
            f.write(json.dumps({"event_type": et, "user_id": uid}) + "\n")
    os.utime(path, (mtime, mtime))


@pytest.fixture()
def paths(tmp_path):
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    return {
        "inbox": str(inbox),
        "store": str(tmp_path / "hllstore"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def _run(spark, p):
    q = start_hll_maintenance(
        spark,
        p["inbox"],
        SCHEMA,
        store_path=p["store"],
        checkpoint_path=p["ckpt"],
    )
    q.awaitTermination(300)


def test_streaming_hll_equals_batch_across_restart(spark, paths):
    now = time.time()
    b1, b2, b3 = _rows(0, 300), _rows(900, 300), _rows(1800, 300)
    _write(os.path.join(paths["inbox"], "f1.json"), b1, now - 60)
    _write(os.path.join(paths["inbox"], "f2.json"), b2, now - 30)
    _run(spark, paths)

    # RESTART: a third file arrives, the stream resumes from checkpoint
    _write(os.path.join(paths["inbox"], "f3.json"), b3, now)
    _run(spark, paths)

    all_rows = spark.createDataFrame(
        b1 + b2 + b3, "event_type string, user_id bigint"
    )

    # registers: merged store == from-scratch, bit for bit
    merged = {
        (r["event_type"], r["bucket"]): r["rho"]
        for r in load_merged_registers(spark, paths["store"]).collect()
    }
    scratch = {
        (r["event_type"], r["bucket"]): r["rho"]
        for r in hll_registers(
            all_rows, ["event_type"], "user_id"
        ).collect()
    }
    assert merged == scratch

    # estimate row (v_zero, exact denominator, double estimate)
    got = sorted(
        map(tuple, current_distinct_estimate(spark, paths["store"]).collect())
    )
    want = sorted(
        map(
            tuple,
            hll_estimate(
                hll_registers(all_rows, ["event_type"], "user_id"),
                ["event_type"],
            ).collect(),
        )
    )
    assert got == want

    parts = {
        p for p in os.listdir(paths["store"]) if p.startswith("batch_id=")
    }
    assert parts == {"batch_id=0", "batch_id=1", "batch_id=2"}
