"""Sequence packing (operators/packing.py) and per-source quality
calibration (quality.calibrated_quality_gate): layout invariants,
determinism under repartitioning, edge/error paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_estate_project1_etl_spark.operators.packing import (
    pack_sequences,
    packing_summary,
)
from real_estate_project1_etl_spark.operators.quality import (
    calibrated_quality_gate,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_pack_sequences_layout_invariants(spark):
    rows = [(i, (i * 37) % 900 + 1) for i in range(200)]
    plan = pack_sequences(
        _docs(spark, rows), "doc_id", "n_tokens", seq_len=256, n_shards=4
    ).collect()
    assert len(plan) == 200
    by_shard: dict[int, list] = {}
    for r in plan:
        by_shard.setdefault(r.shard, []).append(r)
    assert set(by_shard) <= set(range(4))
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r.offset)
        # offsets tile the stream exactly: each doc starts where the
        # previous ended — no gaps, no overlaps
        expect = 0
        for r in shard_rows:
            assert r.offset == expect
            expect += r.n_tokens
            # sequence span arithmetic
            assert r.first_seq == r.offset // 256
            assert r.last_seq == (r.offset + r.n_tokens - 1) // 256
            assert r.n_seqs == r.last_seq - r.first_seq + 1


def test_pack_sequences_deterministic_under_repartition(spark):
    rows = [(i, i % 50 + 1) for i in range(300)]
    df = _docs(spark, rows)
    a = pack_sequences(df, "doc_id", "n_tokens", 128, 8).collect()
    b = pack_sequences(
        df.repartition(13), "doc_id", "n_tokens", 128, 8
    ).collect()
    assert {tuple(r) for r in a} == {tuple(r) for r in b}


def test_pack_sequences_drops_empty_docs_and_validates(spark):
    df = _docs(spark, [(1, 10), (2, 0), (3, -5), (4, None)])
    got = pack_sequences(df, "doc_id", "n_tokens", 16, 2).collect()
    assert [r.doc_id for r in got] == [1]
    with pytest.raises(ValueError, match="seq_len"):
        pack_sequences(df, "doc_id", "n_tokens", 0, 2)
    with pytest.raises(ValueError, match="n_shards"):
        pack_sequences(df, "doc_id", "n_tokens", 16, 0)


def test_packing_summary_economics(spark):
    # one shard keeps arithmetic auditable: 3 docs of 100/200/300 tokens,
    # seq_len 256 -> total 600, 3 sequences, 168 pad
    rows = [(1, 100), (2, 200), (3, 300)]
    plan = pack_sequences(_docs(spark, rows), "doc_id", "n_tokens", 256, 1)
    s = packing_summary(plan, 256).collect()[0]
    assert (s.n_docs, s.total_tokens, s.n_seqs) == (3, 600, 3)
    assert s.pad_tokens == 3 * 256 - 600
    assert abs(s.efficiency - 600 / 768) < 1e-12
    # boundary docs: from the plan itself (order is hash-determined)
    crossing = sum(1 for r in plan.collect() if r.n_seqs > 1)
    assert s.boundary_docs == crossing
    with pytest.raises(ValueError, match="seq_len"):
        packing_summary(plan, -1)


def test_calibrated_quality_gate_per_group_fraction(spark):
    # group A: 10 rows scores 0..9 -> keep ceil(3) = 3 best (9,8,7);
    # group B: 1 row -> ceil(0.3) = 1 (tiny source never eliminated)
    rows = [("A", i, float(i)) for i in range(10)] + [("B", 100, 0.5)]
    df = spark.createDataFrame(rows, "source string, doc_id long, score double")
    got = calibrated_quality_gate(df, "score", ["source"], 0.3, ["doc_id"])
    kept = {(r.source, r.doc_id) for r in got.collect()}
    assert kept == {("A", 9), ("A", 8), ("A", 7), ("B", 100)}


def test_calibrated_quality_gate_ties_and_errors(spark):
    # equal scores: the doc_id tiebreak makes the kept set deterministic
    rows = [("A", i, 1.0) for i in range(4)]
    df = spark.createDataFrame(rows, "source string, doc_id long, score double")
    kept = {
        r.doc_id
        for r in calibrated_quality_gate(
            df, "score", ["source"], 0.5, ["doc_id"]
        ).collect()
    }
    assert kept == {0, 1}
    with pytest.raises(ValueError, match="keep_frac"):
        calibrated_quality_gate(df, "score", ["source"], 0.0, ["doc_id"])
    with pytest.raises(ValueError, match="outside group_cols"):
        calibrated_quality_gate(df, "score", ["source"], 0.5, ["source"])
    with pytest.raises(ValueError, match="reserved"):
        calibrated_quality_gate(
            df.withColumn("__cqg_rn", F.lit(1)),
            "score", ["source"], 0.5, ["doc_id"],
        )


# ---------------------------------------------------------------------------
# streaming twin: packed_corpus_stream
# ---------------------------------------------------------------------------


def _write_src(spark, src, rows):
    spark.createDataFrame(rows, "doc_id long, n_tokens long").coalesce(
        1
    ).write.mode("append").parquet(src)


def test_packed_stream_single_batch_equals_batch_packer(spark, tmp_path):
    from real_estate_project1_etl_spark.streaming.stateful import (
        packed_corpus_stream,
    )

    src = str(tmp_path / "pk_src")
    rows = [(i, (i * 13) % 200 + 1) for i in range(120)]
    _write_src(spark, src, rows)
    stream = spark.readStream.schema("doc_id long, n_tokens long").parquet(src)
    q = (
        packed_corpus_stream(stream, "doc_id", "n_tokens", 128, 4)
        .writeStream.format("memory")
        .queryName("mem_pack_eq")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "pk_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        tuple(r) for r in spark.table("mem_pack_eq").collect()
    }
    want = {
        tuple(r)
        for r in pack_sequences(
            spark.createDataFrame(rows, "doc_id long, n_tokens long"),
            "doc_id", "n_tokens", 128, 4,
        ).collect()
    }
    assert got == want  # single-batch arrival == the batch layout


def test_packed_stream_offsets_continue_across_batches_and_restart(
    spark, tmp_path
):
    from real_estate_project1_etl_spark.streaming.stateful import (
        packed_corpus_stream,
    )

    src = str(tmp_path / "pk2_src")
    out = str(tmp_path / "pk2_out")
    ck = str(tmp_path / "pk2_ck")

    def run_once():
        stream = spark.readStream.schema(
            "doc_id long, n_tokens long"
        ).parquet(src)
        q = (
            packed_corpus_stream(stream, "doc_id", "n_tokens", 64, 2)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    _write_src(spark, src, [(i, 10 + i) for i in range(40)])
    run_once()
    first = spark.read.parquet(out).collect()
    # file 2 after a RESTART: the next-offset state must persist in the
    # checkpoint, so new docs continue each shard's stream gaplessly
    _write_src(spark, src, [(100 + i, 5 + i) for i in range(20)])
    run_once()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 60 and len(first) == 40
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r.offset)
        expect = 0
        for r in shard_rows:
            assert r.offset == expect, (r, expect)
            expect += r.n_tokens
            assert r.first_seq == r.offset // 64
            assert r.last_seq == (r.offset + r.n_tokens - 1) // 64


def test_packed_stream_migration_bootstrap_and_validation(spark, tmp_path):
    # initial_offsets seeds a FRESH checkpoint at the drained sink's
    # high-water mark: max(offset + n_tokens) per shard — the
    # counter-state migration recipe
    from real_estate_project1_etl_spark.streaming.stateful import (
        packed_corpus_stream,
    )

    src1 = str(tmp_path / "pk3_src1")
    _write_src(spark, src1, [(i, 7) for i in range(30)])
    stream = spark.readStream.schema(
        "doc_id long, n_tokens long"
    ).parquet(src1)
    q = (
        packed_corpus_stream(stream, "doc_id", "n_tokens", 32, 2)
        .writeStream.format("memory")
        .queryName("mem_pack_mig1")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "pk3_ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    drained = spark.table("mem_pack_mig1").collect()
    offsets: dict[tuple, int] = {}
    for r in drained:
        offsets[(r.shard,)] = max(
            offsets.get((r.shard,), 0), r.offset + r.n_tokens
        )
    # rebuilt life: fresh checkpoint + fresh inbox, offsets seeded
    src2 = str(tmp_path / "pk3_src2")
    _write_src(spark, src2, [(1000 + i, 3) for i in range(10)])
    stream2 = spark.readStream.schema(
        "doc_id long, n_tokens long"
    ).parquet(src2)
    q2 = (
        packed_corpus_stream(
            stream2, "doc_id", "n_tokens", 32, 2, initial_offsets=offsets
        )
        .writeStream.format("memory")
        .queryName("mem_pack_mig2")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "pk3_ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(180)
    rebuilt = spark.table("mem_pack_mig2").collect()
    assert rebuilt
    # each shard's rebuilt stream starts exactly at the drained sink's
    # high-water mark and tiles gaplessly from there
    by_shard: dict[int, list] = {}
    for r in rebuilt:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, shard_rows in by_shard.items():
        shard_rows.sort(key=lambda r: r.offset)
        expect = offsets[(shard,)]
        for r in shard_rows:
            assert r.offset == expect, (shard, r, expect)
            expect += r.n_tokens

    batch = spark.createDataFrame([(1, 2)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError, match="batch fallback"):
        packed_corpus_stream(
            batch, "doc_id", "n_tokens", 32, 2, initial_offsets={(0,): 1}
        )
    with pytest.raises(ValueError, match="1-tuples"):
        packed_corpus_stream(
            stream2, "doc_id", "n_tokens", 32, 2, initial_offsets={0: 1}
        )
    with pytest.raises(ValueError, match="seq_len"):
        packed_corpus_stream(stream2, "doc_id", "n_tokens", 0, 2)
    with pytest.raises(ValueError, match="columns not in df"):
        packed_corpus_stream(stream2, "doc_id", "nope", 32, 2)
    # batch fallback delegates to pack_sequences
    assert packed_corpus_stream(batch, "doc_id", "n_tokens", 32, 2).columns \
        == ["doc_id", "n_tokens", "shard", "offset", "first_seq",
            "last_seq", "n_seqs"]


def test_pack_sequences_plan_has_single_exchange(spark):
    # scale shape: ONE exchange (on shard) + the in-shard window sort —
    # no second shuffle, no driver funnel.  Executed plan, AQE collapsed.
    rows = [(i, i % 40 + 1) for i in range(500)]
    df = pack_sequences(_docs(spark, rows), "doc_id", "n_tokens", 128, 8)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]  # AQE echoes the pre-plan
    import re

    n_ex = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_ex == 1, plan
    assert "Exchange SinglePartition" not in plan
    assert "Window" in plan


def test_calibrated_quality_gate_plan_shares_one_partitioning(spark):
    # the row_number and count windows share ONE group-key exchange
    rows = [("s%d" % (i % 5), i, float(i % 97)) for i in range(500)]
    df = spark.createDataFrame(rows, "source string, doc_id long, score double")
    out = calibrated_quality_gate(df, "score", ["source"], 0.3, ["doc_id"])
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]  # AQE echoes the pre-plan
    import re

    n_ex = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_ex == 1, plan
    assert "Exchange SinglePartition" not in plan


def test_pack_sequences_epoch_reshuffle(spark):
    # epoch salt: fresh deterministic layout per epoch, invariants intact
    rows = [(i, i % 30 + 1) for i in range(200)]
    df = _docs(spark, rows)
    e0 = {r.doc_id: (r.shard, r.offset) for r in
          pack_sequences(df, "doc_id", "n_tokens", 64, 4).collect()}
    e0b = {r.doc_id: (r.shard, r.offset) for r in
           pack_sequences(df, "doc_id", "n_tokens", 64, 4, epoch=0).collect()}
    e1 = {r.doc_id: (r.shard, r.offset) for r in
          pack_sequences(df, "doc_id", "n_tokens", 64, 4, epoch=1).collect()}
    e1b = {r.doc_id: (r.shard, r.offset) for r in
           pack_sequences(df, "doc_id", "n_tokens", 64, 4, epoch=1).collect()}
    assert e0 == e0b          # epoch 0 == unsalted form
    assert e1 == e1b          # each epoch reproducible
    assert e0 != e1           # layouts actually move
    assert set(e0) == set(e1)  # same corpus, every doc placed
    # tiling invariant holds under the salt too
    plan = pack_sequences(df, "doc_id", "n_tokens", 64, 4, epoch=7).collect()
    by_shard: dict[int, list] = {}
    for r in plan:
        by_shard.setdefault(r.shard, []).append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r.offset)
        expect = 0
        for r in shard_rows:
            assert r.offset == expect
            expect += r.n_tokens


def test_packed_stream_matches_python_model_across_batch_splits(
    spark, tmp_path
):
    # independent differential: a pure-python simulation of the stream's
    # documented semantics (per micro-batch, docs sort by (md5-hash60,
    # id) and append to their shard's stream) vs the real stateful
    # operator over a random multi-batch arrival — catches bugs the
    # batch-equivalence test can't (cross-batch state, arrival order)
    import hashlib
    import random

    from real_estate_project1_etl_spark.streaming.stateful import (
        packed_corpus_stream,
    )

    rng = random.Random(77)
    rows = [(i, rng.randint(1, 300)) for i in range(150)]
    # random contiguous split into 4 arrival batches
    cuts = sorted(rng.sample(range(1, len(rows)), 3))
    batches = [rows[a:b] for a, b in zip([0] + cuts, cuts + [len(rows)])]

    def h60(doc_id):
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)

    seq_len, n_shards = 128, 4
    offsets = {s: 0 for s in range(n_shards)}
    model = {}
    for batch in batches:
        per_shard: dict[int, list] = {}
        for doc_id, toks in batch:
            per_shard.setdefault(h60(doc_id) % n_shards, []).append(
                (doc_id, toks)
            )
        for shard, docs in per_shard.items():
            for doc_id, toks in sorted(docs, key=lambda d: (h60(d[0]), d[0])):
                off = offsets[shard]
                model[doc_id] = (
                    toks, shard, off, off // seq_len,
                    (off + toks - 1) // seq_len,
                )
                offsets[shard] = off + toks

    src = str(tmp_path / "pkm_src")
    # one file per arrival batch; maxFilesPerTrigger makes each file its
    # own micro-batch below.  The arrival ORDER is pinned by forcing
    # distinct mtimes onto the file each write just created — identified
    # by set difference, NOT by sorted()[-1]: part filenames carry UUIDs,
    # so the lexicographically-last file is not necessarily the newest
    # (that was a ~1-in-4 flake scrambling micro-batch order vs the model)
    import os as _os

    seen: set[str] = set()
    for i, batch in enumerate(batches):
        spark.createDataFrame(
            batch, "doc_id long, n_tokens long"
        ).coalesce(1).write.mode("append").parquet(src)
        files = {
            n for n in _os.listdir(src) if n.endswith(".parquet")
        }
        new = files - seen
        assert len(new) == 1, new
        _os.utime(_os.path.join(src, new.pop()), (1000 + i, 1000 + i))
        seen = files

    stream = (
        spark.readStream.schema("doc_id long, n_tokens long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        packed_corpus_stream(stream, "doc_id", "n_tokens", seq_len, n_shards)
        .writeStream.format("memory")
        .queryName("mem_pack_model")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "pkm_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got = {
        r.doc_id: (r.n_tokens, r.shard, r.offset, r.first_seq, r.last_seq)
        for r in spark.table("mem_pack_model").collect()
    }
    assert got == model


def test_pack_sequences_null_ids_dropped(spark):
    # NULL ids hash identically and tie in the ordering — their offsets
    # would be partition-order-dependent, so they are dropped like
    # zero-token docs (assign ids first)
    df = spark.createDataFrame(
        [(None, 10), (None, 20), (1, 5), (2, 7)],
        "doc_id long, n_tokens long",
    )
    got = pack_sequences(df, "doc_id", "n_tokens", 16, 2).collect()
    assert sorted(r.doc_id for r in got) == [1, 2]


def test_calibrated_gate_null_scores_rank_last(spark):
    rows = [("A", 1, None), ("A", 2, 5.0), ("A", 3, None), ("A", 4, 1.0)]
    df = spark.createDataFrame(rows, "source string, doc_id long, score double")
    kept = {r.doc_id for r in
            calibrated_quality_gate(df, "score", ["source"], 0.5, ["doc_id"]
                                    ).collect()}
    assert kept == {2, 4}  # scored rows beat NULLs
    # quota past the scored rows: NULLs admitted in id order
    kept75 = {r.doc_id for r in
              calibrated_quality_gate(df, "score", ["source"], 0.75,
                                      ["doc_id"]).collect()}
    assert kept75 == {2, 4, 1}


def test_next_event_training_pairs_hand_computed(spark):
    import datetime

    from real_estate_project1_etl_spark.operators.packing import (
        next_event_training_pairs,
    )

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def ts(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    rows = [
        # user 1 session 0: view, click, buy -> 2 examples
        (1, 1, ts(0), "view"), (1, 2, ts(1), "click"), (1, 3, ts(2), "buy"),
        # >30min gap -> session 1: view, view -> 1 example
        (1, 4, ts(60), "view"), (1, 5, ts(61), "view"),
        # user 2: single event -> no examples
        (2, 6, ts(0), "view"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )
    out = {
        (r.user_id, r.session_id, r.step): (r.context_path, r.label)
        for r in next_event_training_pairs(ev, max_context=2).collect()
    }
    assert out == {
        (1, 0, 2): ("view", "click"),
        (1, 0, 3): ("view>click", "buy"),
        (1, 1, 2): ("view", "view"),
    }
    # max_context truncation keeps the LAST k types
    long = spark.createDataFrame(
        [(3, i, ts(i), f"t{i}") for i in range(5)],
        "user_id long, event_id long, ts timestamp, event_type string",
    )
    got = {
        r.step: r.context_path
        for r in next_event_training_pairs(long, max_context=2).collect()
    }
    assert got[5] == "t2>t3"
