"""Differential fuzzing of integer arithmetic: random expression trees
over lineitem's integer columns evaluated by both engines and compared
exactly. Guards the arithmetic layer (truncated division/modulo signs,
precedence, abs/greatest/least) the same way the text fuzzer guards the
string layer. Every binary result is range-bounded with a modulus so
chains can't overflow int64 in either engine."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from tools.driver_sim import canon

N_CASES = 30

_COLS = [
    "cast(l_quantity as bigint)",
    "l_orderkey",
    "cast(l_linenumber as bigint)",
    "l_partkey",
]
#: op -> (spark token, duckdb token); `div`/`//` is the only dialect split
_BINOPS = [("+", "+"), ("-", "-"), ("*", "*"), ("div", "//"), ("%", "%")]


def _gen(rng: random.Random, depth: int):
    if depth == 0 or rng.random() < 0.3:
        c = rng.choice(_COLS)
        return c, c
    shape = rng.random()
    if shape < 0.15:
        s, d = _gen(rng, depth - 1)
        return f"abs({s})", f"abs({d})"
    if shape < 0.3:
        fn = rng.choice(["greatest", "least"])
        s1, d1 = _gen(rng, depth - 1)
        s2, d2 = _gen(rng, depth - 1)
        return f"{fn}({s1}, {s2})", f"{fn}({d1}, {d2})"
    sop, dop = rng.choice(_BINOPS)
    s1, d1 = _gen(rng, depth - 1)
    s2, d2 = _gen(rng, depth - 1)
    if sop in ("div", "%"):
        # guard division by zero identically on both sides
        s2 = f"(abs({s2}) + 1)"
        d2 = f"(abs({d2}) + 1)"
    # bound the magnitude so chained products can't overflow int64
    return (
        f"(({s1}) {sop} ({s2})) % 1000003",
        f"(({d1}) {dop} ({d2})) % 1000003",
    )


def _gen_case(seed: int):
    rng = random.Random(seed)
    return _gen(rng, rng.randint(1, 3))


@pytest.fixture(scope="module")
def duck_li(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{sf_dir}/lineitem.parquet')"
    )
    yield con
    con.close()


@pytest.fixture(scope="module")
def li(spark, sf_dir):
    from real_estate_project1_etl_spark.sources.parquet import load_table

    spark.conf.set("spark.sql.ansi.enabled", "false")
    return load_table(spark, sf_dir, "lineitem")


@pytest.mark.parametrize("seed", range(N_CASES))
def test_fuzz_integer_arithmetic_matches_duckdb(seed, spark, duck_li, li):
    s_expr, d_expr = _gen_case(seed)
    s = canon(
        li.select(
            "l_orderkey", "l_linenumber", F.expr(s_expr).cast("bigint").alias("v")
        ).toPandas()
    )
    o = canon(
        duck_li.execute(
            f"SELECT l_orderkey, l_linenumber, cast({d_expr} AS bigint) AS v FROM lineitem"
        ).df()
    )
    assert s == o, f"seed {seed}: {s_expr}"
