"""Docs-vs-registry drift guard: the counts NOTES.md claims must equal the
live registry (the round-1 stale-header failure mode — the driver snapshot
gap was invisible because the docs said 50 when the registry had 109)."""

from __future__ import annotations

import os
import re

import __spark_entry__ as entry_mod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_notes_header_counts_match_registry():
    notes = open(os.path.join(REPO, "NOTES.md")).read()
    m = re.search(r"COUNTS:\s*(\d+)\s+queries\s*/\s*(\d+)\s+oracles", notes)
    assert m, "NOTES.md must carry a 'COUNTS: N queries / M oracles' line"
    assert (int(m.group(1)), int(m.group(2))) == (
        len(entry_mod.queries()),
        len(entry_mod.oracle_sql()),
    ), "NOTES.md COUNTS line is stale — update it to match the registry"


def test_every_oracle_has_a_query():
    q, o = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(o) <= set(q), set(o) - set(q)


def test_bench_headline_queries_are_registered():
    import bench

    q = entry_mod.queries()
    missing = [n for n in bench.HEADLINE if n not in q]
    assert not missing, missing


def test_readme_counts_match_registry():
    readme = open(os.path.join(REPO, "README.md")).read()
    m = re.search(r"(\d+) named queries, (\d+) matched", readme)
    assert m, "README.md must state 'N named queries, M matched'"
    assert (int(m.group(1)), int(m.group(2))) == (
        len(entry_mod.queries()),
        len(entry_mod.oracle_sql()),
    ), "README.md query counts are stale — update them to match the registry"


def test_bench_count_prunes_detector(spark):
    # the bench honesty guard (round-11): a final left join back to the
    # corpus prunes under count() and must be detected; a plain
    # aggregate must not false-positive
    import bench
    from pyspark.sql import functions as F

    df = spark.range(100).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v")
    )
    agg = df.groupBy("k").agg(F.sum("v").alias("s"))
    joined = df.select("k").distinct().join(agg, "k", "left")
    assert bench._count_prunes(joined) is True
    assert bench._count_prunes(agg) is False
