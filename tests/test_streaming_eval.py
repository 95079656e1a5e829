"""Eval-while-ingest (streaming/eval_monitor.py): per-batch additive
contingency deltas committed under batch_id partitions; the weighted
report over the merged store equals the row-level report on everything
arrived so far — every metric, across a stream restart."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql.types import LongType, StructField, StructType

from real_estate_project1_etl_spark.operators.evalmetrics import (
    binary_classifier_eval,
)
from real_estate_project1_etl_spark.streaming.eval_monitor import (
    current_eval_report,
    load_merged_counts,
    start_eval_maintenance,
)

SCHEMA = StructType(
    [
        StructField("score_milli", LongType()),
        StructField("label", LongType()),
        StructField("p_milli", LongType()),
    ]
)


def _rows(start: int, n: int):
    out = []
    for i in range(n):
        h = ((start + i) * 2654435761) % 2**32
        s = (h % 2001) - 1000
        y = 1 if (h >> 8) % 3 else 0
        p = min(max(500 + s // 4, 0), 1000)
        out.append((s, y, p))
    return out


def _write(path, rows, mtime):
    with open(path, "w") as f:
        for s, y, p in rows:
            f.write(
                json.dumps({"score_milli": s, "label": y, "p_milli": p})
                + "\n"
            )
    os.utime(path, (mtime, mtime))


@pytest.fixture()
def paths(tmp_path):
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    return {
        "inbox": str(inbox),
        "store": str(tmp_path / "evstore"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def _run(spark, p):
    q = start_eval_maintenance(
        spark,
        p["inbox"],
        SCHEMA,
        store_path=p["store"],
        checkpoint_path=p["ckpt"],
    )
    q.awaitTermination(300)


def test_weighted_eval_equals_rowlevel(spark):
    # the weight_col contract by itself: a contingency table evaluates
    # identically to its expanded rows
    from pyspark.sql import functions as F

    rows = _rows(0, 400)
    df = spark.createDataFrame(
        rows, "score_milli bigint, label bigint, p_milli bigint"
    )
    counts = df.groupBy("score_milli", "label", "p_milli").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    want = binary_classifier_eval(df).collect()
    got = binary_classifier_eval(
        counts,
        score_col="score_milli",
        label_col="label",
        p_milli_col="p_milli",
        weight_col="cnt",
    ).collect()
    assert got == want


def test_streaming_eval_equals_batch_across_restart(spark, paths):
    now = time.time()
    b1, b2, b3 = _rows(0, 150), _rows(500, 150), _rows(1000, 150)
    _write(os.path.join(paths["inbox"], "f1.json"), b1, now - 60)
    _write(os.path.join(paths["inbox"], "f2.json"), b2, now - 30)
    _run(spark, paths)

    # RESTART: a third file arrives, the stream resumes from checkpoint
    _write(os.path.join(paths["inbox"], "f3.json"), b3, now)
    _run(spark, paths)

    all_rows = spark.createDataFrame(
        b1 + b2 + b3, "score_milli bigint, label bigint, p_milli bigint"
    )
    got = current_eval_report(spark, paths["store"]).collect()
    want = binary_classifier_eval(all_rows).collect()
    assert got == want

    # the merged contingency table equals the batch-built one
    from pyspark.sql import functions as F

    merged = {
        (r["s"], r["y"], r["p"]): r["cnt"]
        for r in load_merged_counts(spark, paths["store"]).collect()
    }
    batch = {
        (r["s"], r["y"], r["p"]): r["cnt"]
        for r in all_rows.groupBy(
            F.col("score_milli").alias("s"),
            F.col("label").alias("y"),
            F.col("p_milli").alias("p"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert merged == batch

    parts = {
        p for p in os.listdir(paths["store"]) if p.startswith("batch_id=")
    }
    assert parts == {"batch_id=0", "batch_id=1", "batch_id=2"}
