"""Local twin of the driver's DuckDB-oracle correctness gate
(CORRECTNESS_r{N}.json): run every ``queries()`` entry and its
``oracle_sql()`` side-by-side, compare row count, schema (column names),
and order-insensitive values — exactly, NaN-equal.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

QUERIES = entry_mod.queries()
ORACLE = entry_mod.oracle_sql()


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


from tools.driver_sim import canon as _canon  # noqa: E402

# the repo gate MUST use the driver-sim's STRICT canonicalization (floats
# keep their float form): a lossy local fold (5.0 -> "5") let a DuckDB
# HUGEINT-sum dtype drift pass here and fail on the driver
# (dwell_time_per_type, round 2c) — one canon, imported, never forked.


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_match(spark, name):
    sdf = QUERIES[name](spark, SF_DIR).toPandas()
    ddf = _duck(SF_DIR).execute(ORACLE[name]).df()
    scols, srows = _canon(sdf)
    dcols, drows = _canon(ddf)
    assert scols == dcols, f"schema mismatch: spark={scols} duck={dcols}"
    assert len(srows) == len(drows), f"rowcount: spark={len(srows)} duck={len(drows)}"
    if srows != drows:
        diffs = [
            (a, b) for a, b in zip(srows, drows) if a != b
        ][:5]
        raise AssertionError(f"value mismatch, first diffs: {diffs}")


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_runs(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0


def test_queries_survive_ansi_on_session(spark):
    # the driver may hand over a session with Spark 4's default ANSI mode
    # still ON; _t must flip it so lenient casts return NULL, not throw
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        out = QUERIES["digits_extract"](spark, SF_DIR).collect()
        assert out  # contains try-cast results, no exception raised
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "false")
