"""Continuous-ingestion near-dup filtering (streaming/incremental_dedup.py):
survivors accumulate across micro-batches, each batch is mined against the
signature STORE (never raw corpus text), and the store persists across
restarts of the stream."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from real_estate_project1_etl_spark.operators.dedup import minhash_signature_table
from real_estate_project1_etl_spark.streaming.incremental_dedup import (
    incremental_dedup_batch,
    start_incremental_dedup,
)

SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)

# word pools chosen so unrelated docs share zero 3-word shingles
_POOLS = {
    "A": [f"alpha{i}" for i in range(30)],
    "B": [f"bravo{i}" for i in range(30)],
    "C": [f"carol{i}" for i in range(30)],
    "D": [f"delta{i}" for i in range(30)],
}


def _doc(pool: str, variant: int = 0) -> str:
    words = list(_POOLS[pool])
    if variant:
        words[-1] = f"mut{variant}"  # one-word change -> jaccard ~0.8
    return " ".join(words)


def _write_inbox_file(path: str, rows: list[tuple[int, str]], mtime: float) -> None:
    with open(path, "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
    os.utime(path, (mtime, mtime))


@pytest.fixture()
def paths(tmp_path):
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    return {
        "inbox": str(inbox),
        "store": str(tmp_path / "sigstore"),
        "survivors": str(tmp_path / "survivors"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def _run(spark, p):
    q = start_incremental_dedup(
        spark,
        p["inbox"],
        SCHEMA,
        "text",
        "doc_id",
        p["store"],
        p["survivors"],
        p["ckpt"],
        jaccard_threshold=0.6,
    )
    q.awaitTermination(300)


def _survivor_ids(spark, p):
    return sorted(
        r.doc_id for r in spark.read.parquet(p["survivors"]).select("doc_id").collect()
    )


def test_incremental_dedup_across_batches_and_restart(spark, paths):
    now = time.time()
    # batch 1: A kept, A-variant dropped (within batch), B kept
    _write_inbox_file(
        os.path.join(paths["inbox"], "f1.json"),
        [(0, _doc("A")), (1, _doc("A", 1)), (2, _doc("B"))],
        now - 60,
    )
    # batch 2: dup-of-A dropped (vs STORE), C kept, C-variant dropped
    # (within batch), dup-of-B dropped (vs store)
    _write_inbox_file(
        os.path.join(paths["inbox"], "f2.json"),
        [(10, _doc("A", 2)), (11, _doc("C")), (12, _doc("C", 1)), (13, _doc("B", 1))],
        now - 30,
    )
    _run(spark, paths)
    assert _survivor_ids(spark, paths) == [0, 2, 11]

    store = spark.read.parquet(paths["store"])
    assert sorted(r.id for r in store.select("id").collect()) == [0, 2, 11]
    # store carries signatures, not text: schema is (id, sh, sig) + batch_id
    assert set(store.columns) == {"id", "sh", "sig", "batch_id"}

    # restart the stream (same checkpoint): a third file arrives later —
    # dups against batch-1/2 survivors are caught purely from the store
    _write_inbox_file(
        os.path.join(paths["inbox"], "f3.json"),
        [(20, _doc("A", 3)), (21, _doc("D"))],
        time.time(),
    )
    _run(spark, paths)
    assert _survivor_ids(spark, paths) == [0, 2, 11, 21]
    assert sorted(r.id for r in spark.read.parquet(paths["store"]).select("id").collect()) == [
        0,
        2,
        11,
        21,
    ]


def test_batch_step_corpus_wins_regardless_of_id_order(spark):
    # the corpus doc has the GREATER id: the new smaller-id doc must still
    # lose (drop_lo path) — corpus membership, not id order, decides
    base = spark.createDataFrame([(100, _doc("A"))], SCHEMA)
    base_sig = minhash_signature_table(base, "text", "doc_id")
    batch = spark.createDataFrame([(5, _doc("A", 1)), (6, _doc("B"))], SCHEMA)
    survivors, survivor_sig = incremental_dedup_batch(
        batch, base_sig, "text", "doc_id", jaccard_threshold=0.6
    )
    assert [r.doc_id for r in survivors.collect()] == [6]
    assert [r.id for r in survivor_sig.collect()] == [6]


def test_batch_step_bootstrap_empty_store(spark):
    base = spark.createDataFrame([], SCHEMA)
    base_sig = minhash_signature_table(base, "text", "doc_id")
    batch = spark.createDataFrame([(1, _doc("A")), (2, _doc("A", 1))], SCHEMA)
    survivors, _ = incremental_dedup_batch(
        batch, base_sig, "text", "doc_id", jaccard_threshold=0.6
    )
    assert [r.doc_id for r in survivors.collect()] == [1]
