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
