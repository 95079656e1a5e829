"""Blanket physical-plan lint over EVERY declared query: no row-at-a-time
Python, no shuffle cartesian product — anywhere, ever. Arrow-batched
Python (MapInPandas / FlatMapGroupsInPandas / ArrowEvalPython) and
broadcast nested-loop joins (bounded: one side is a broadcast of a small
query set) are the sanctioned escape hatches and remain allowed."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
QUERIES = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_plan_antipatterns(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    assert "CartesianProduct" not in plan, f"{name}: shuffle cartesian product"
