"""RocksDB checkpoint migration (round-4 verdict item 5): a stateful
checkpoint born under the HDFS-backed provider cannot restart under the
RocksDB default — tools/migrate_state_checkpoint.py drains the old
checkpoint to AvailableNow completion, retires its consumed input, and
hands the rebuilt query a fresh checkpoint + batch-id offset. The test
migrates a LIVE incremental-dedup checkpoint across the provider switch
and proves the pre-migration row set survives intact with exactly-once
held (no loss, no double-processing, no partition clobbering)."""

from __future__ import annotations

import importlib.util
import json
import os

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from real_estate_project1_etl_spark.streaming.incremental_dedup import (
    start_incremental_dedup,
)

_SPEC = importlib.util.spec_from_file_location(
    "migrate_state_checkpoint",
    os.path.join(os.path.dirname(__file__), "..", "tools", "migrate_state_checkpoint.py"),
)
mig = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(mig)

SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)

_POOLS = {
    "A": [f"alpha{i}" for i in range(30)],
    "B": [f"bravo{i}" for i in range(30)],
    "C": [f"carol{i}" for i in range(30)],
    "D": [f"delta{i}" for i in range(30)],
}


def _doc(pool: str) -> str:
    return " ".join(_POOLS[pool])


def _write(path: str, rows: list[tuple[int, str]], mtime: float) -> None:
    with open(path, "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
    os.utime(path, (mtime, mtime))


_HDFS_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
)
_ROCKS_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


def test_drain_and_rebuild_migrates_checkpoint_without_loss(spark, tmp_path):
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    archive = str(tmp_path / "archive")
    store = str(tmp_path / "sigstore")
    survivors = str(tmp_path / "survivors")
    ckpt_old = str(tmp_path / "ckpt_old")
    ckpt_new = str(tmp_path / "ckpt_new")

    def start(ckpt, offset=0):
        return start_incremental_dedup(
            spark, str(inbox), SCHEMA, "text", "doc_id",
            store, survivors, ckpt,
            jaccard_threshold=0.6, batch_id_offset=offset,
        )

    # ---- life under the OLD (HDFS) provider: two micro-batches ----
    _write(str(inbox / "f1.json"), [(0, _doc("A")), (1, _doc("B"))], 1000)
    _write(str(inbox / "f2.json"), [(10, _doc("C")), (11, _doc("A"))], 2000)
    old_provider = spark.conf.get(_PROVIDER_CONF, None)
    spark.conf.set(_PROVIDER_CONF, _HDFS_PROVIDER)
    try:
        start(ckpt_old).awaitTermination(300)

        pre_rows = {
            (r.doc_id, r.batch_id)
            for r in spark.read.parquet(survivors).collect()
        }
        # doc 11 is an exact dup of doc 0 -> dropped; 2 committed batches
        assert {d for d, _ in pre_rows} == {0, 1, 10}
        assert mig.committed_batch_ids(ckpt_old) == [0, 1]
        consumed = mig.consumed_source_files(ckpt_old)
        assert sorted(os.path.basename(p) for p in consumed) == [
            "f1.json", "f2.json",
        ]

        # ---- migration: drain (old provider) + retire input ----
        info = mig.migrate(lambda: start(ckpt_old), ckpt_old, archive)
    finally:
        if old_provider is None:
            spark.conf.unset(_PROVIDER_CONF)
        else:
            spark.conf.set(_PROVIDER_CONF, old_provider)

    assert info["batch_id_offset"] == 2
    assert sorted(os.path.basename(p) for p in info["retired_files"]) == [
        "f1.json", "f2.json",
    ]
    assert os.listdir(str(inbox)) == []  # inbox empty post-retire
    assert sorted(os.listdir(archive)) == ["f1.json", "f2.json"]

    # ---- rebuilt life under the RocksDB default ----
    # doc 20 duplicates doc 0's text: the signature STORE must still drop
    # it (state survived the migration); doc 21 is fresh and survives
    _write(str(inbox / "f3.json"), [(20, _doc("A")), (21, _doc("D"))], 3000)
    spark.conf.set(_PROVIDER_CONF, _ROCKS_PROVIDER)
    try:
        start(ckpt_new, offset=info["batch_id_offset"]).awaitTermination(300)
    finally:
        if old_provider is None:
            spark.conf.unset(_PROVIDER_CONF)
        else:
            spark.conf.set(_PROVIDER_CONF, old_provider)

    post = spark.read.parquet(survivors).collect()
    post_rows = {(r.doc_id, r.batch_id) for r in post}
    # exactly-once across the switch: every pre-migration row intact
    # (same doc, same batch partition), nothing re-processed
    assert pre_rows <= post_rows, (pre_rows, post_rows)
    assert {d for d, _ in post_rows} == {0, 1, 10, 21}
    assert len(post) == len(post_rows) == 4  # no duplicate rows anywhere
    # the rebuilt batch landed in the OFFSET partition, clobbering nothing
    assert {b for d, b in post_rows if d == 21} == {2}


def test_rebuild_offset_and_virgin_checkpoint(tmp_path):
    # a checkpoint that never committed anything: offset 0, no files
    ck = str(tmp_path / "nope")
    assert mig.committed_batch_ids(ck) == []
    assert mig.last_committed_batch(ck) is None
    assert mig.rebuild_offset(ck) == 0
    assert mig.consumed_source_files(ck) == []
    assert mig.retire_consumed_files(ck, str(tmp_path / "arch")) == []


def test_capped_corpus_counter_state_migration(spark, tmp_path):
    # round-5 verdict item 8: the admitted-counter state shape.  Unlike
    # incremental-dedup (whose state is externalized to the signature
    # store), the cap's counter lives ONLY in the state store — migration
    # must reconstruct it from the drained sink (admitted_counts) and
    # seed the rebuilt query via initial_counts, or every key's cap
    # resets to 0 and the corpus over-admits after the provider switch.
    from real_estate_project1_etl_spark.streaming.stateful import (
        capped_corpus_stream,
    )

    src = tmp_path / "cap_inbox"
    src.mkdir()
    out = str(tmp_path / "cap_out")
    ckpt_old = str(tmp_path / "cap_ckpt_old")
    ckpt_new = str(tmp_path / "cap_ckpt_new")
    archive = str(tmp_path / "cap_archive")
    schema = "domain string, doc_id long"

    def write_file(name, rows, mtime):
        with open(str(src / name), "w") as f:
            for domain, doc_id in rows:
                f.write(json.dumps({"domain": domain, "doc_id": doc_id}) + "\n")
        os.utime(str(src / name), (mtime, mtime))

    def start(ckpt, initial_counts=None, offset=0):
        # foreachBatch sink partitioned by SHIFTED batch id — the plain
        # parquet file sink is unusable across a rebuild (its
        # _spark_metadata log keys on batch id, and a fresh checkpoint
        # restarts the counter at 0, so the rebuilt query's batches are
        # silently skipped as "already committed"); per-batch-dir
        # overwrite keeps replays idempotent, the offset keeps rebuilt
        # batches off the retired checkpoint's partitions
        def sink(batch_df, batch_id):
            batch_df.write.mode("overwrite").parquet(
                f"{out}/batch_id={batch_id + offset}"
            )

        stream = spark.readStream.schema(schema).json(str(src))
        return (
            capped_corpus_stream(
                stream, "domain", "doc_id", n=3, initial_counts=initial_counts
            )
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    # ---- life under the OLD (HDFS) provider: key a fills its cap (5>3),
    # key b stays under it (2<3) ----
    write_file(
        "c1.json", [("a", i) for i in range(5)] + [("b", 100), ("b", 101)], 1000
    )
    old_provider = spark.conf.get(_PROVIDER_CONF, None)
    spark.conf.set(_PROVIDER_CONF, _HDFS_PROVIDER)
    try:
        start(ckpt_old).awaitTermination(300)
        pre = {(r.domain, r.doc_id) for r in spark.read.parquet(out).collect()}
        assert {d for d, _ in pre} == {"a", "b"}
        assert sum(1 for d, _ in pre if d == "a") == 3
        assert sum(1 for d, _ in pre if d == "b") == 2

        # ---- migration: drain + retire input + reconstruct counters ----
        info = mig.migrate(lambda: start(ckpt_old), ckpt_old, archive)
        counts = mig.admitted_counts(spark.read.parquet(out), ["domain"])
    finally:
        if old_provider is None:
            spark.conf.unset(_PROVIDER_CONF)
        else:
            spark.conf.set(_PROVIDER_CONF, old_provider)

    assert counts == {("a",): 3, ("b",): 2}
    assert sorted(os.path.basename(p) for p in info["retired_files"]) == [
        "c1.json"
    ]
    assert os.listdir(str(src)) == []

    # ---- rebuilt life under the RocksDB default, counters seeded ----
    # a is AT the cap (must admit 0 of its 2 new docs), b has room for
    # exactly 1 more, c is unseen and admits up to the cap
    write_file(
        "c2.json",
        [("a", 50), ("a", 51), ("b", 150), ("b", 151), ("c", 200), ("c", 201)],
        2000,
    )
    spark.conf.set(_PROVIDER_CONF, _ROCKS_PROVIDER)
    try:
        start(
            ckpt_new,
            initial_counts=counts,
            offset=info["batch_id_offset"],
        ).awaitTermination(300)
    finally:
        if old_provider is None:
            spark.conf.unset(_PROVIDER_CONF)
        else:
            spark.conf.set(_PROVIDER_CONF, old_provider)

    post = spark.read.parquet(out).collect()
    post_rows = {(r.domain, r.doc_id) for r in post}
    assert pre <= post_rows  # pre-migration admitted set intact
    assert len(post) == len(post_rows)  # no double-processing anywhere
    from collections import Counter

    per_key = Counter(d for d, _ in post_rows)
    # caps enforced ACROSS the provider switch: a stays at 3, b tops up
    # to 3, c admits 2 (all it has)
    assert per_key == {"a": 3, "b": 3, "c": 2}
    # b's top-up admitted exactly one of its two new docs; a admitted none
    assert not {("a", 50), ("a", 51)} & post_rows
    assert len({("b", 150), ("b", 151)} & post_rows) == 1
    # rebuilt batches landed in the OFFSET partition, clobbering nothing
    assert {
        r.batch_id for r in post if (r.domain, r.doc_id) not in pre
    } == {info["batch_id_offset"]}


def test_capped_corpus_initial_counts_validation(spark):
    from real_estate_project1_etl_spark.streaming.stateful import (
        capped_corpus_stream,
    )

    batch = spark.createDataFrame([("a", 1)], "domain string, doc_id long")
    # batch fallback has no state to seed
    with pytest.raises(ValueError, match="batch fallback"):
        capped_corpus_stream(
            batch, "domain", "doc_id", n=3, initial_counts={("a",): 1}
        )
    # keys must be tuples matching the key-column arity
    with pytest.raises(ValueError, match="tuples"):
        capped_corpus_stream(
            batch, "domain", "doc_id", n=3, initial_counts={"a": 1}
        )
