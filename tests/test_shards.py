"""Deterministic sharded training export (sinks/shards.py): stable
membership/order across re-runs and partitionings, verifiable delivery,
tamper detection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_estate_project1_etl_spark.sinks.shards import (
    verify_training_shards,
    write_training_shards,
)
from real_estate_project1_etl_spark.sources.parquet import load_table


def test_shards_roundtrip_balanced_and_verified(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "shards")
    manifest = write_training_shards(docs, path, n_shards=8, id_col="doc_id")
    assert len(manifest["shards"]) == 8
    counts = [s["n_rows"] for s in manifest["shards"].values()]
    assert sum(counts) == docs.count()
    # hash sharding balances within a loose band (500 docs / 8 shards)
    assert min(counts) > 0 and max(counts) < 3 * (sum(counts) // 8)
    # re-read equals input as a multiset
    back = spark.read.parquet(path).drop("shard")
    assert back.count() == docs.count()
    assert (
        docs.select("doc_id").exceptAll(back.select("doc_id")).count() == 0
    )
    assert verify_training_shards(spark, path)


def test_shards_deterministic_across_partitionings(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    a = write_training_shards(docs.repartition(3), str(tmp_path / "a"), 4, "doc_id")
    b = write_training_shards(docs.repartition(17), str(tmp_path / "b"), 4, "doc_id")
    # same data -> same manifest, regardless of input partitioning
    assert a["shards"] == b["shards"]


def test_shards_verify_detects_tamper(spark, sf_dir, tmp_path):
    import glob
    import os

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    path = str(tmp_path / "t")
    write_training_shards(docs, path, 4, "doc_id")
    # delete one shard's files -> verification must name the damage
    victim = glob.glob(os.path.join(path, "shard=2", "*.parquet"))
    assert victim
    for f in victim:
        os.remove(f)
    with pytest.raises(ValueError):
        verify_training_shards(spark, path)


def test_shards_reject_preexisting_shard_column(spark, tmp_path):
    import pytest

    from real_estate_project1_etl_spark.sinks.shards import write_training_shards

    df = spark.range(10).withColumnRenamed("id", "doc_id").withColumn(
        "shard", F.lit("user-data")
    )
    with pytest.raises(ValueError, match="reserved"):
        write_training_shards(df, str(tmp_path / "x"), 2, "doc_id")
