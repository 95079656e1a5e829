"""Bloom semi-join reduction (operators/bloom.py): no-false-negative
contract, actual pruning, parameter validation, and the registered
query's result-preservation vs the plain join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_estate_project1_etl_spark.operators.bloom import (
    bloom_build,
    bloom_prefilter,
)


def test_bloom_never_drops_a_member(spark):
    keys = spark.range(0, 5000, 7).select(F.col("id").alias("k"))
    bf = bloom_build(keys, "k")
    facts = spark.range(10000).select(F.col("id").alias("k"))
    kept = set(r["k"] for r in bloom_prefilter(facts, "k", bf).collect())
    members = set(range(0, 5000, 7))
    assert members <= kept  # no false negatives, ever
    # and it actually prunes: non-members mostly rejected (fpp ~ 5%)
    non_members = kept - members
    assert len(non_members) < 0.15 * (10000 - len(members))


def test_bloom_prefilter_drops_null_keys(spark):
    keys = spark.createDataFrame([(1,), (None,)], "k bigint")
    bf = bloom_build(keys, "k")
    facts = spark.createDataFrame([(1,), (None,), (2,)], "k bigint")
    kept = [r["k"] for r in bloom_prefilter(facts, "k", bf).collect()]
    assert None not in kept and 1 in kept


def test_bloom_param_validation(spark):
    df = spark.range(1).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        bloom_build(df, "k", n_bits=100)
    with pytest.raises(ValueError):
        bloom_build(df, "k", n_hashes=0)
    with pytest.raises(ValueError):
        bloom_prefilter(df, "k", df, n_bits=63)


def test_registered_bloom_query_prunes_and_preserves(spark, sf_dir):
    import __spark_entry__ as entry
    from real_estate_project1_etl_spark.operators.bloom import (
        bloom_build,
        bloom_prefilter,
    )
    from real_estate_project1_etl_spark.sources.parquet import load_table

    # result preservation vs the plain join, engine-side
    got = {
        r["o_orderpriority"]: (r["n_items"], r["revenue"])
        for r in entry.queries()["bloom_prefiltered_revenue"](
            spark, sf_dir
        ).collect()
    }
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-02-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    want = {
        r["o_orderpriority"]: (r["n_items"], r["revenue"])
        for r in li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
            )
            .cast("double")
            .alias("revenue"),
        )
        .collect()
    }
    assert got == want
    # and the prefilter really shrinks the fact stream
    bf = bloom_build(orders.select("o_orderkey"), "o_orderkey")
    n_all = li.count()
    n_pref = bloom_prefilter(li, "l_orderkey", bf).count()
    assert n_pref < 0.25 * n_all, (n_pref, n_all)
