"""Tests for the shared session cache (plans/session_cache.py).

Round-11 verdict item 3 (IVF-PQ index must be keyed on its generator's
plan fingerprint, via ONE utility shared with the PSL mapping) and
round-11 ADVICE #5 (the old lambda strip ``\\b[xyz]_\\d+#`` also
normalized REAL columns named x_1/y_2/z_3, so two generators differing
only in such a column could silently share one cache entry).
"""
from __future__ import annotations

from pyspark.sql import functions as F

from real_estate_project1_etl_spark.plans.session_cache import (
    get_or_build,
    plan_fingerprint,
)


def test_fingerprint_stable_across_rebuilds(spark):
    # the same expression tree built twice gets fresh expression IDs and
    # fresh lambda-variable counters; the fingerprint must not see them.
    # (Range source: its identity is in the plan text, unlike LogicalRDD)
    def gen():
        df = spark.range(5).select(
            F.col("id").alias("a"), F.array(F.col("id")).alias("arr")
        )
        return df.select(
            F.transform("arr", lambda x: x + F.col("a")).alias("t")
        )

    assert plan_fingerprint(gen()) == plan_fingerprint(gen())


def test_fingerprint_distinguishes_real_xyz_columns(spark):
    # ADVICE #5: a REAL column named x_1 vs x_2 (or y_2/z_3) must yield
    # DIFFERENT fingerprints — only `lambda `-bound variables are
    # normalized, never bare attribute names
    df = spark.range(3)
    for a, b in [("x_1", "x_2"), ("y_2", "y_7"), ("z_3", "z_30")]:
        fa = plan_fingerprint(df.select(F.col("id").alias(a)))
        fb = plan_fingerprint(df.select(F.col("id").alias(b)))
        assert fa != fb, f"real columns {a} vs {b} aliased into one entry"


def test_fingerprint_normalizes_lambda_vars_but_not_bodies(spark):
    # two plans that differ ONLY in the auto-generated lambda arg id
    # must match; a different lambda BODY must not
    df = spark.range(3).select(F.array(F.col("id")).alias("arr"))
    t1 = df.select(F.transform("arr", lambda x: x * 2).alias("t"))
    t2 = df.select(F.transform("arr", lambda x: x * 2).alias("t"))
    assert plan_fingerprint(t1) == plan_fingerprint(t2)
    t3 = df.select(F.transform("arr", lambda x: x * 3).alias("t"))
    assert plan_fingerprint(t1) != plan_fingerprint(t3)


def test_fingerprint_extra_params_key_the_entry(spark):
    df = spark.range(3)
    assert plan_fingerprint(df, extra=("k=1",)) != plan_fingerprint(
        df, extra=("k=2",)
    )


def test_fingerprint_volatile_leaf_never_aliases(spark):
    # createDataFrame leaves print NO data (LogicalRDD [c#N]) — two
    # different datasets with one schema must not share an entry, so
    # volatile-leaf plans keep their exprIds: same OBJECT fingerprints
    # stably, a NEW object (even with identical data) is a miss
    d1 = spark.createDataFrame([("a",)], "host string")
    d2 = spark.createDataFrame([("b",)], "host string")
    assert plan_fingerprint(d1) == plan_fingerprint(d1)
    # re-selecting an existing column keeps its exprId: the same object
    # wrapped the same way twice (the PSL call-site shape) still HITS
    assert plan_fingerprint(d1.select("host")) == plan_fingerprint(
        d1.select("host")
    )
    assert plan_fingerprint(d1) != plan_fingerprint(d2)


def test_get_or_build_hits_on_identical_generator(spark):
    df = spark.createDataFrame([(1,), (2,)], "a int")
    calls = []

    def build():
        calls.append(1)
        return df.groupBy().agg(F.sum("a").alias("s"))

    r1 = get_or_build(df, "t_hit", build)
    r2 = get_or_build(df, "t_hit", build)
    assert len(calls) == 1, "identical generator must be a cache hit"
    assert r1.first()["s"] == r2.first()["s"] == 3


def test_get_or_build_rebuilds_on_generator_drift(spark):
    # verdict item 3's acceptance: a CHANGED generator rebuilds instead
    # of serving stale — here the drifted generator filters a row out,
    # and the rebuilt artifact reflects it
    base = spark.createDataFrame([(1,), (2,)], "a int")
    drifted = base.filter(F.col("a") < 2)
    calls = []

    def mk(src):
        def build():
            calls.append(1)
            return src.groupBy().agg(F.sum("a").alias("s"))

        return build

    r1 = get_or_build(base, "t_drift", mk(base))
    r2 = get_or_build(drifted, "t_drift", mk(drifted))
    assert len(calls) == 2, "drifted generator must MISS, not serve stale"
    assert r1.first()["s"] == 3 and r2.first()["s"] == 1


def test_get_or_build_label_isolates_entries(spark):
    df = spark.createDataFrame([(1,)], "a int")
    calls = []

    def build():
        calls.append(1)
        return df

    get_or_build(df, "t_lbl_a", build)
    get_or_build(df, "t_lbl_b", build)
    assert len(calls) == 2


def test_psl_mapping_rebuilds_on_host_generator_drift(spark):
    # end-to-end through the PSL call site: same label + rules, drifted
    # host set -> fresh mapping that COVERS the new host (the round-10
    # staleness bug was a NULL-domain LEFT join for missing hosts)
    import __spark_entry__ as entry

    pages1 = spark.createDataFrame(
        [("a.example.com",), ("b.example.org",)], "host string"
    )
    m1 = entry._shared_psl_mapping(
        pages1, "host", list(entry._PSL_RULES), "t_psl_drift"
    )
    hosts1 = {r["_h"] for r in m1.collect()}
    assert "a.example.com" in hosts1 and "new.example.net" not in hosts1

    pages2 = spark.createDataFrame(
        [("a.example.com",), ("new.example.net",)], "host string"
    )
    m2 = entry._shared_psl_mapping(
        pages2, "host", list(entry._PSL_RULES), "t_psl_drift"
    )
    hosts2 = {r["_h"] for r in m2.collect()}
    assert "new.example.net" in hosts2, "stale mapping served after drift"
