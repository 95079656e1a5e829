"""Partition-independence: the registry's determinism rules claim results
are bit-identical under ANY partitioning (exact decimal sums, total-order
ranks, hash-based sampling, scaled-integer stats). Assert it directly by
running representative queries under two very different shuffle-partition
settings and comparing canonical results — the cross-check the oracle
diff can't provide (DuckDB has no partitioning to vary)."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entry_mod
from tools.driver_sim import canon

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

#: queries chosen to cover every determinism mechanism: decimal sums,
#: window ranks with tiebreaks, top-k cuts, hash sampling, scaled-int
#: stats, iterative graph state, median interpolation, array reassembly
SENSITIVE = [
    "pricing_summary",
    "top3_orders_per_priority",
    "global_top10_lineitems",
    "hash_sample",
    "per_group_sample",
    "source_lang_chi2",
    "value_mad_per_event_type",
    "copurchase_pagerank",
    "induced_stopword_removal",
    "decayed_user_value",
    "robust_outliers_per_type",
    "customer_pareto_80",
    "bm25_topk_docs",
]


@pytest.mark.parametrize("name", SENSITIVE)
def test_result_invariant_under_partitioning(spark, name):
    q = entry_mod.queries()[name]
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = canon(q(spark, SF_DIR).toPandas())
        spark.conf.set("spark.sql.shuffle.partitions", "31")
        b = canon(q(spark, SF_DIR).toPandas())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert a == b, f"{name}: result depends on shuffle partitioning"
