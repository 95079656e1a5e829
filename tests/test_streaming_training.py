"""Train-while-ingest (streaming/incremental_training.py): the quality
classifier's deterministic mini-batch SGD runs as a streaming fold over
arriving micro-batches, and the committed weight trajectory equals the
batch trainer folded over the same batches — including across a stream
RESTART (round-10 verdict item 7, mirroring the incremental-dedup
pattern)."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from real_estate_project1_etl_spark.operators.quality import (
    train_hashed_classifier,
)
from real_estate_project1_etl_spark.streaming.incremental_training import (
    load_classifier_weights,
    start_incremental_classifier_training,
)

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("label", IntegerType()),
    ]
)

DIM = 32
KW = dict(n_iters=2, n_batches=2, lr_den=32, fit_bias=True, l2_num=1,
          l2_den=1024)

GOOD = "clear prose with varied useful words about real topics"
BAD = "buy buy buy cheap cheap pills pills pills now now now"


def _rows(start_id: int, n: int) -> list[tuple[int, str, int]]:
    return [
        (
            start_id + i,
            (GOOD if (start_id + i) % 2 == 0 else BAD) + f" tail{start_id + i}",
            1 if (start_id + i) % 2 == 0 else 0,
        )
        for i in range(n)
    ]


def _write_inbox_file(path: str, rows, mtime: float) -> None:
    with open(path, "w") as f:
        for doc_id, text, label in rows:
            f.write(
                json.dumps({"doc_id": doc_id, "text": text, "label": label})
                + "\n"
            )
    os.utime(path, (mtime, mtime))


@pytest.fixture()
def paths(tmp_path):
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    return {
        "inbox": str(inbox),
        "store": str(tmp_path / "wstore"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def _run(spark, p):
    q = start_incremental_classifier_training(
        spark, p["inbox"], SCHEMA, dim=DIM, store_path=p["store"],
        checkpoint_path=p["ckpt"], **KW,
    )
    q.awaitTermination(300)


def _weights(df) -> dict:
    return {r["feature_id"]: r["weight_milli"] for r in df.collect()}


def test_streaming_training_equals_batch_fold_across_restart(spark, paths):
    now = time.time()
    b1, b2, b3 = _rows(0, 6), _rows(10, 6), _rows(20, 6)
    _write_inbox_file(os.path.join(paths["inbox"], "f1.json"), b1, now - 60)
    _write_inbox_file(os.path.join(paths["inbox"], "f2.json"), b2, now - 30)
    _run(spark, paths)

    # batch twin: fold train_hashed_classifier over the same batches
    def df_of(rows):
        return spark.createDataFrame(rows, SCHEMA)

    w0 = train_hashed_classifier(df_of(b1), DIM, **KW)
    w1 = train_hashed_classifier(df_of(b2), DIM, initial_weights=w0, **KW)
    assert _weights(load_classifier_weights(spark, paths["store"], 0)) == _weights(w0)
    assert _weights(load_classifier_weights(spark, paths["store"], 1)) == _weights(w1)
    # the model did learn something by now
    assert any(v != 0 for v in _weights(w1).values())

    # RESTART: a third file arrives, the stream resumes on the same
    # checkpoint and must continue the trajectory from partition 1
    _write_inbox_file(os.path.join(paths["inbox"], "f3.json"), b3, time.time())
    _run(spark, paths)
    w2 = train_hashed_classifier(df_of(b3), DIM, initial_weights=w1, **KW)
    assert _weights(load_classifier_weights(spark, paths["store"], 2)) == _weights(w2)

    # replay idempotence: re-running batch 2's step from partition 1
    # yields byte-identical weights (the crash-replay path)
    w2_replay = train_hashed_classifier(
        df_of(b3), DIM,
        initial_weights=load_classifier_weights(spark, paths["store"], 1),
        **KW,
    )
    assert _weights(w2_replay) == _weights(w2)

    # loud failure: a missing predecessor partition must raise, never
    # silently restart the trajectory from zeros
    with pytest.raises(RuntimeError, match="no partition"):
        load_classifier_weights(spark, paths["store"], 7)


def test_initial_weights_validation(spark):
    docs = spark.createDataFrame(_rows(0, 4), SCHEMA)
    bad = spark.range(3).select(
        F.col("id").alias("feature_id"), F.lit(0).alias("weight_milli")
    )
    with pytest.raises(ValueError, match="rows"):
        train_hashed_classifier(docs, DIM, initial_weights=bad, **KW)
    # right row COUNT but duplicate ids + a missing bucket: a bare count
    # check passes this and the margin join silently fans out (ADVICE r11)
    dup = spark.range(DIM + 1).select(
        F.when(F.col("id") == 0, F.lit(1))
        .otherwise(F.col("id"))
        .cast("bigint")
        .alias("feature_id"),
        F.lit(0).cast("bigint").alias("weight_milli"),
    )
    with pytest.raises(ValueError, match="distinct"):
        train_hashed_classifier(docs, DIM, initial_weights=dup, **KW)
    # right count and distinct, but shifted out of [0, n_weights-1]
    shifted = spark.range(1, DIM + 2).select(
        F.col("id").cast("bigint").alias("feature_id"),
        F.lit(0).cast("bigint").alias("weight_milli"),
    )
    with pytest.raises(ValueError, match="distinct"):
        train_hashed_classifier(docs, DIM, initial_weights=shifted, **KW)
    with pytest.raises(ValueError, match="columns"):
        train_hashed_classifier(
            docs, DIM, initial_weights=spark.range(DIM + 1), **KW
        )

    # initial_weights=zeros == fresh start (the base case of the fold)
    zeros = spark.range(DIM + 1).select(
        F.col("id").cast("bigint").alias("feature_id"),
        F.lit(0).cast("bigint").alias("weight_milli"),
    )
    a = train_hashed_classifier(docs, DIM, **KW)
    b = train_hashed_classifier(docs, DIM, initial_weights=zeros, **KW)
    assert _weights(a) == _weights(b)
