"""Spectral-drift-while-ingest (streaming/spectral_monitor.py): per-batch
additive scatter partials committed under batch_id partitions; the
reconstructed scatter, the extracted direction, and the drift statistic
all equal their batch twins on everything arrived so far — across a
stream restart (round-12 verdict item 6)."""

from __future__ import annotations

import json
import math
import os
import time

import pytest
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from real_estate_project1_etl_spark.operators.spectral import (
    direction_drift,
    power_iteration_top_component,
    quantized_scatter,
    scatter_from_partials,
    scatter_partials,
)
from real_estate_project1_etl_spark.streaming.spectral_monitor import (
    current_direction,
    load_merged_partials,
    start_scatter_maintenance,
)

DIM = 8
SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(DoubleType())),
    ]
)


def _vec(seed: int) -> list[float]:
    # deterministic spiky vectors: a strong common direction plus noise,
    # so the top component is well-defined and drift is meaningful
    base = [math.sin(0.7 * d + 1.3) for d in range(DIM)]
    return [
        0.8 * base[d]
        + 0.2 * ((((seed * 2654435761 + d * 40503) % 1000) / 500.0) - 1.0)
        for d in range(DIM)
    ]


def _rows(start: int, n: int):
    return [(start + i, _vec(start + i)) for i in range(n)]


def _write(path, rows, mtime):
    with open(path, "w") as f:
        for vid, emb in rows:
            f.write(json.dumps({"vec_id": vid, "embedding": emb}) + "\n")
    os.utime(path, (mtime, mtime))


@pytest.fixture()
def paths(tmp_path):
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    return {
        "inbox": str(inbox),
        "store": str(tmp_path / "scstore"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def _run(spark, p):
    q = start_scatter_maintenance(
        spark,
        p["inbox"],
        SCHEMA,
        scale_pow2=8,
        store_path=p["store"],
        checkpoint_path=p["ckpt"],
    )
    q.awaitTermination(300)


def _cells(df):
    return {(r["i"], r["j"]): r["c"] for r in df.collect()}


def _dirs(df):
    return {r["i"]: r["v_ppm"] for r in df.collect()}


def test_partials_reconstruction_equals_decimal_scatter(spark):
    rows = _rows(0, 60)
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    want = _cells(quantized_scatter(df, "embedding", accumulate="decimal"))
    # split into 3 arbitrary slices; partials merge must reconstruct
    parts = None
    for k in range(3):
        sl = df.filter((df.vec_id % 3) == k)
        p = scatter_partials(sl, "embedding")
        parts = p if parts is None else parts.unionByName(p)
    got = _cells(scatter_from_partials(parts))
    assert got == want


def test_streaming_spectral_equals_batch_across_restart(spark, paths):
    now = time.time()
    b1, b2, b3 = _rows(0, 30), _rows(30, 30), _rows(60, 30)
    _write(os.path.join(paths["inbox"], "f1.json"), b1, now - 60)
    _write(os.path.join(paths["inbox"], "f2.json"), b2, now - 30)
    _run(spark, paths)

    # RESTART: a third file arrives, the stream resumes from checkpoint
    _write(os.path.join(paths["inbox"], "f3.json"), b3, now)
    _run(spark, paths)

    all_rows = spark.createDataFrame(
        b1 + b2 + b3, "vec_id bigint, embedding array<double>"
    )
    # scatter: stream-store reconstruction == batch decimal scatter
    merged = scatter_from_partials(
        load_merged_partials(spark, paths["store"])
    )
    want_sc = _cells(
        quantized_scatter(all_rows, "embedding", accumulate="decimal")
    )
    assert _cells(merged) == want_sc

    # direction: monitor == batch twin, exactly
    got_dir = current_direction(spark, paths["store"], dim=DIM)
    want_dir = power_iteration_top_component(
        quantized_scatter(all_rows, "embedding", accumulate="decimal"),
        dim=DIM,
    )
    assert _dirs(got_dir) == _dirs(want_dir)

    # drift report: the monitor direction vs the batch twin is exactly
    # aligned (cos2 = 1e6); vs the first-batch-only direction it is a
    # real statistic strictly below perfect alignment
    self_drift = direction_drift(got_dir, want_dir).collect()[0]
    assert self_drift["cos2_ppm"] == 1_000_000
    first = power_iteration_top_component(
        quantized_scatter(
            spark.createDataFrame(
                b1, "vec_id bigint, embedding array<double>"
            ),
            "embedding",
            accumulate="decimal",
        ),
        dim=DIM,
    )
    d = direction_drift(got_dir, first).collect()[0]
    assert d["cos2_ppm"] is not None and 0 <= d["cos2_ppm"] <= 1_000_000
    # the planted common direction dominates both slices: high alignment
    assert d["cos2_ppm"] > 900_000

    # three files -> three committed delta partitions
    parts = {
        p for p in os.listdir(paths["store"]) if p.startswith("batch_id=")
    }
    assert parts == {"batch_id=0", "batch_id=1", "batch_id=2"}


def test_replayed_batch_partition_is_idempotent(spark, paths):
    # writing the same batch's delta twice (checkpoint replay) leaves
    # the merged statistics unchanged — dynamic partition overwrite
    now = time.time()
    b1 = _rows(0, 30)
    _write(os.path.join(paths["inbox"], "f1.json"), b1, now - 60)
    _run(spark, paths)
    before = _cells(
        scatter_from_partials(load_merged_partials(spark, paths["store"]))
    )
    # simulate the replay: re-commit batch 0's delta by hand
    df = spark.createDataFrame(b1, "vec_id bigint, embedding array<double>")
    from pyspark.sql import functions as F

    (
        scatter_partials(df, "embedding")
        .withColumn("batch_id", F.lit(0))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(paths["store"])
    )
    after = _cells(
        scatter_from_partials(load_merged_partials(spark, paths["store"]))
    )
    assert after == before
