"""Leakage-free component-atomic split: atomicity invariant, audit
counts vs a hand-built pair graph, and the naive-split leak it exists
to prevent."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_estate_project1_etl_spark.operators.quality import (
    component_atomic_split,
    split_leakage_count,
)

HALF = 1 << 59  # 50% test cutoff — makes cross-side components likely


def _hash60_py(v) -> int:
    import hashlib

    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)


def test_atomic_split_components_never_straddle(spark):
    # 3 components: {1,2,3} (chain), {10,11}, singletons 20, 21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a bigint, id_b bigint"
    )
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)], "id bigint, comp bigint"
    )
    ids = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 10, 11, 20, 21)], "doc_id bigint"
    )
    sp = component_atomic_split(ids, labels, HALF)
    rows = {r["doc_id"]: (r["comp"], r["split"]) for r in sp.collect()}
    assert rows[1] == rows[2] == rows[3] == (1, rows[1][1])
    assert rows[10] == rows[11]
    assert rows[20][0] == 20 and rows[21][0] == 21  # singleton = own comp
    # split equals the python-model hash decision on the component rep
    for d, (comp, s) in rows.items():
        assert s == ("test" if _hash60_py(comp) < HALF else "train")
    audit = split_leakage_count(pairs, sp).collect()[0]
    assert audit["leaked_pairs"] == 0
    assert audit["n_train"] + audit["n_test"] == 7


def test_naive_split_leaks_on_cross_hash_component(spark):
    # find two ids whose own-hash sides differ, then pair them: the
    # naive per-doc split must leak exactly that pair
    a = next(i for i in range(1000) if _hash60_py(i) < HALF)
    b = next(i for i in range(1000) if _hash60_py(i) >= HALF)
    pairs = spark.createDataFrame([(a, b)], "id_a bigint, id_b bigint")
    ids = spark.createDataFrame([(a,), (b,)], "doc_id bigint")
    naive = ids.select(
        "doc_id",
        F.when(
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
                16,
                10,
            ).cast("long")
            < F.lit(HALF),
            F.lit("test"),
        )
        .otherwise(F.lit("train"))
        .alias("split"),
    )
    assert split_leakage_count(pairs, naive).collect()[0]["leaked_pairs"] == 1
    # the atomic split on the same pair graph cannot leak
    labels = spark.createDataFrame(
        [(a, min(a, b)), (b, min(a, b))], "id bigint, comp bigint"
    )
    atomic = component_atomic_split(ids, labels, HALF)
    assert (
        split_leakage_count(pairs, atomic).collect()[0]["leaked_pairs"] == 0
    )


def test_registered_split_audit_invariants(spark, sf_dir):
    import __spark_entry__ as entry

    rows = {
        r["method"]: r
        for r in entry.queries()["leakage_free_split_audit"](
            spark, sf_dir
        ).collect()
    }
    n_docs = rows["atomic"]["n_train"] + rows["atomic"]["n_test"]
    assert n_docs == rows["naive"]["n_train"] + rows["naive"]["n_test"]
    assert rows["atomic"]["leaked_pairs"] == 0
    assert rows["naive"]["leaked_pairs"] >= 0


def test_atomic_split_rejects_duplicate_label_ids(spark):
    import pytest as _pytest

    ids = spark.createDataFrame([(1,), (2,)], "doc_id bigint")
    bad = spark.createDataFrame(
        [(1, 1), (1, 2)], "id bigint, comp bigint"
    )
    with _pytest.raises(ValueError, match="duplicate ids"):
        component_atomic_split(ids, bad, HALF)


def test_atomic_split_string_ids_keep_native_comp(spark):
    # r12 ADVICE: non-numeric string ids must NOT yield NULL comp for
    # singletons — comp stays in the id's native type, and the hash
    # decision still runs on the string form of the component rep
    ids = spark.createDataFrame(
        [("doc-a",), ("doc-b",), ("doc-solo",)], "doc_id string"
    )
    labels = spark.createDataFrame(
        [("doc-a", 7), ("doc-b", 7)], "id string, comp bigint"
    )
    sp = component_atomic_split(ids, labels, HALF)
    assert dict(sp.dtypes)["comp"] == "string"
    rows = {r["doc_id"]: (r["comp"], r["split"]) for r in sp.collect()}
    assert rows["doc-a"][0] == rows["doc-b"][0] == "7"
    assert rows["doc-solo"][0] == "doc-solo"  # own id, not NULL
    for d, (comp, s) in rows.items():
        assert s == ("test" if _hash60_py(comp) < HALF else "train")


def test_atomic_split_labels_id_col_param(spark):
    ids = spark.createDataFrame([(1,), (2,), (3,)], "doc_id bigint")
    labels = spark.createDataFrame(
        [(1, 1), (2, 1)], "member_id bigint, comp bigint"
    )
    sp = component_atomic_split(
        ids, labels, HALF, labels_id_col="member_id"
    )
    rows = {r["doc_id"]: r["comp"] for r in sp.collect()}
    assert rows == {1: 1, 2: 1, 3: 3}
