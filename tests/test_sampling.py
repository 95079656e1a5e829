"""Sketch aggregates and stratified sampling — accuracy/proportion pins
for the rows-only queries (engine RNG / sketch internals aren't
oracle-comparable)."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from real_estate_project1_etl_spark.sources.parquet import load_table


def test_sketches_within_tolerance(spark, sf_dir):
    # round-13 form: the query itself carries exact twins + verified
    # bound flags (oracle pins them TRUE); this test re-checks the exact
    # twins independently and that every bound flag held
    got = {
        r.l_returnflag: r
        for r in entry_mod.queries()["approx_distinct_and_percentile"](
            spark, sf_dir
        ).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count_distinct("l_partkey").alias("nd"),
            F.expr(
                "percentile(cast(floor(l_extendedprice * 100) as bigint),"
                " 0.5)"
            ).alias("p50c"),
        )
        .collect()
    }
    for flag, row in got.items():
        assert row.nd_parts_exact == exact[flag].nd
        assert row.p50_exact_cents == exact[flag].p50c
        assert row.nd_approx_ok, flag
        assert row.p50_approx_ok, flag


def test_stratified_sample_proportions_and_determinism(spark, sf_dir):
    q = entry_mod.queries()["stratified_sample"]
    s1 = q(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    totals = {r.l_returnflag: r.n for r in
              li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")).collect()}
    counts = {r.l_returnflag: r.n for r in
              s1.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")).collect()}
    for flag, frac in {"A": 0.2, "N": 0.05, "R": 0.2}.items():
        got = counts.get(flag, 0) / totals[flag]
        assert abs(got - frac) < 0.06, f"{flag}: {got} vs {frac}"
    # fixed seed -> same sample on re-run
    a = sorted((r.l_orderkey, r.l_linenumber) for r in s1.collect())
    b = sorted((r.l_orderkey, r.l_linenumber) for r in q(spark, sf_dir).collect())
    assert a == b


def test_hash_sample_deterministic_and_shuffle_free(spark, sf_dir):
    q = entry_mod.queries()["hash_sample"]
    s1 = q(spark, sf_dir)
    # pure row-local predicate: no Exchange in the physical plan
    plan = s1._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    a = sorted((r.l_orderkey, r.l_linenumber) for r in s1.collect())
    # stable under re-partitioning (where seed-based sample() would diverge)
    li = load_table(spark, sf_dir, "lineitem").repartition(13)
    from real_estate_project1_etl_spark.operators.quality import (
        deterministic_sample,
    )

    b = sorted(
        (r.l_orderkey, r.l_linenumber)
        for r in deterministic_sample(
            li, ["l_orderkey", "l_linenumber"]
        ).collect()
    )
    assert a == b
    # 3/16 of the corpus within sampling tolerance
    frac = len(a) / li.count()
    assert abs(frac - 3 / 16) < 0.02, frac


def test_mixture_sample_hits_target_proportions(spark, sf_dir):
    from real_estate_project1_etl_spark.operators.quality import mixture_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # heavily skewed target over three sources (equal-sized in the data)
    weights = {"src0": 0.6, "src1": 0.3, "src2": 0.1}
    out = mixture_sample(docs, "source", weights, seed=7)
    got = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    # src0 binds (scarcest relative to target): kept in full
    n0 = got["src0"]
    total = sum(got.values())
    assert set(got) == set(weights)
    # expected shares within Bernoulli noise of the targets
    assert abs(got["src0"] / total - 0.6) < 0.15
    assert abs(got["src1"] / total - 0.3) < 0.12
    assert abs(got["src2"] / total - 0.1) < 0.08
    # binding source keeps everything (fraction 1.0)
    per_source = docs.filter(F.col("source") == "src0").count()
    assert n0 == per_source
    # deterministic for a fixed seed
    again = mixture_sample(docs, "source", weights, seed=7)
    assert {tuple(r) for r in again.collect()} == {tuple(r) for r in out.collect()}


def test_cap_per_key_deterministic_and_plan(spark):
    # C4-style per-domain cap: at most n rows per key, kept set a pure
    # function of row content (stable under repartitioning), and the
    # row_number filter must compile to WindowGroupLimit with a PARTIAL
    # stage so a skewed key pre-prunes map-side before the exchange.
    from real_estate_project1_etl_spark.operators.quality import cap_per_key

    df = spark.range(2000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("doc")
    )
    out = cap_per_key(df, ["k"], 5, ["doc"])
    rows = out.collect()
    per_key: dict = {}
    for r in rows:
        per_key.setdefault(r.k, []).append(r.doc)
    assert set(per_key) == set(range(7))
    assert all(len(v) == 5 for v in per_key.values())

    # under-populated keys keep everything
    small = spark.range(3).select(F.lit(0).alias("k"), F.col("id").alias("doc"))
    assert cap_per_key(small, ["k"], 5, ["doc"]).count() == 3

    # content-deterministic: a different physical layout keeps the SAME set
    re_out = cap_per_key(df.repartition(13, "doc"), ["k"], 5, ["doc"])
    assert {(r.k, r.doc) for r in re_out.collect()} == {
        (r.k, r.doc) for r in rows
    }

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan  # map-side pre-prune before the shuffle


def test_temperature_sample_rebalances_toward_small_sources(spark):
    from real_estate_project1_etl_spark.operators.quality import (
        temperature_sample,
    )

    rows = (
        [(i, "big") for i in range(1600)]
        + [(10_000 + i, "mid") for i in range(400)]
        + [(20_000 + i, "small") for i in range(100)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = (
        temperature_sample(df, "source", ["doc_id"], alpha=0.5)
        .groupBy("source")
        .count()
        .collect()
    )
    by = {r["source"]: r["count"] for r in kept}
    # smallest source keeps everything (rate 1.0)
    assert by["small"] == 100
    # kept counts ~ sqrt(n): big -> sqrt(100*1600)=400, mid -> 200
    assert abs(by["big"] - 400) < 60
    assert abs(by["mid"] - 200) < 45
    # deterministic: repartitioned input keeps the identical row set
    kept_ids = sorted(
        r["doc_id"]
        for r in temperature_sample(df, "source", ["doc_id"]).collect()
    )
    kept_ids2 = sorted(
        r["doc_id"]
        for r in temperature_sample(
            df.repartition(7), "source", ["doc_id"]
        ).collect()
    )
    assert kept_ids == kept_ids2


def test_temperature_sample_alpha_one_keeps_everything(spark):
    from real_estate_project1_etl_spark.operators.quality import (
        temperature_sample,
    )

    df = spark.createDataFrame(
        [(i, "a") for i in range(50)] + [(100 + i, "b") for i in range(10)],
        "doc_id long, source string",
    )
    assert temperature_sample(df, "source", ["doc_id"], alpha=1.0).count() == 60


def test_temperature_sample_schema_and_null_source_contract(spark):
    import pytest as _pytest

    from real_estate_project1_etl_spark.operators.quality import (
        temperature_sample,
    )

    df = spark.createDataFrame(
        [(i, "a") for i in range(50)]
        + [(100 + i, "b") for i in range(10)]
        + [(200, None)],
        "doc_id long, source string",
    )
    out = temperature_sample(df, "source", ["doc_id"], alpha=1.0)
    # output schema is exactly the input schema — no internal columns leak
    assert out.columns == df.columns
    # NULL-source rows are dropped (documented inner-join semantics)
    assert out.filter(out.source.isNull()).count() == 0
    assert out.count() == 60
    # internal-name collisions are rejected, not silently shadowed
    with _pytest.raises(ValueError):
        temperature_sample(
            df.withColumn("_ts_thr", df.doc_id), "source", ["doc_id"]
        )
