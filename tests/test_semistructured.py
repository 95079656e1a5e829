"""Spark 4 VARIANT semi-structured surface (functions/semistructured.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_estate_project1_etl_spark.functions.semistructured import (
    extract_typed,
    invalid_json,
    to_variant,
    variant_schema_census,
)


def _payloads(spark):
    return spark.createDataFrame(
        [
            (1, '{"k": 87}'),
            (2, '{"k": 3}'),
            (3, '{"k": "not a number"}'),
            (4, '{"other": true}'),
            (5, "not json at all"),
            (6, None),
            (7, '{"k": 1, "nested": {"a": [1, 2]}}'),
        ],
        "id long, props string",
    )


def test_extract_typed_is_lenient(spark):
    df = _payloads(spark)
    out = {
        r["id"]: r["k"]
        for r in df.select(
            "id", extract_typed(to_variant("props"), "$.k", "bigint").alias("k")
        ).collect()
    }
    assert out[1] == 87 and out[2] == 3 and out[7] == 1
    # uncastable value, missing path, malformed payload, NULL payload -> NULL
    assert out[3] is None and out[4] is None
    assert out[5] is None and out[6] is None


def test_invalid_json_quarantine_predicate(spark):
    df = _payloads(spark)
    bad = sorted(
        r["id"] for r in df.filter(invalid_json("props")).collect()
    )
    assert bad == [5]  # NULL payload is absent, not invalid


def test_variant_schema_census_counts_shapes(spark):
    df = _payloads(spark)
    out = {r["schema"]: r["n_rows"] for r in variant_schema_census(df, "props").collect()}
    assert out["OBJECT<k: BIGINT>"] == 2
    assert out["<invalid>"] == 1
    assert out["<null>"] == 1
    assert sum(out.values()) == 7


def test_variant_expressions_stay_jvm(spark):
    df = _payloads(spark)
    plan = (
        df.select(extract_typed(to_variant("props"), "$.k", "bigint"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
