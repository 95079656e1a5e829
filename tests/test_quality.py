"""Data-quality split and parquet compaction utilities."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from real_estate_project1_etl_spark.operators.quality import (
    properties_rules,
    validate,
)
from real_estate_project1_etl_spark.sinks.writers import compact_parquet


def test_validate_routes_and_names_violations(spark):
    df = spark.createDataFrame(
        [
            (100, 50, "Praha", "/n/1"),
            (-5, 50, "Praha", "/n/2"),      # price_positive
            (100, -1, "", "/n/3"),          # size_nonnegative + region_known
            (100, 50, "Praha", None),       # link_present (NULL-safe)
        ],
        "price_czk int, size_m2 int, region string, link string",
    )
    valid, quarantined = validate(df, properties_rules())
    assert [r.link for r in valid.collect()] == ["/n/1"]
    bad = {r.link: sorted(r._violations) for r in quarantined.collect()}
    assert bad["/n/2"] == ["price_positive"]
    assert bad["/n/3"] == ["region_known", "size_nonnegative"]
    assert bad[None] == ["link_present"]
    # no row lost: the two sides partition the input
    assert valid.count() + quarantined.count() == df.count()


def test_compaction_reduces_file_count(spark, tmp_path):
    path = str(tmp_path / "frag")
    # 40 tiny files (streaming-append pattern)
    spark.range(0, 40_000).repartition(40).write.parquet(path)
    before = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert before == 40
    after = compact_parquet(spark, path)
    assert after < before
    back = spark.read.parquet(path)
    assert back.count() == 40_000
    assert back.agg(F.sum("id")).collect()[0][0] == sum(range(40_000))
