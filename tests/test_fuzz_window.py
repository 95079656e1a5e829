"""Differential window-FRAME fuzzer: randomized window specifications run
by BOTH the Spark engine and DuckDB from one generated spec, compared
exactly (canon from tools/driver_sim — the driver's strict form).

The relational fuzzer covers the basic window shapes (row_number / lag /
running sum / partition total); this one sweeps the FRAME grammar, where
engine semantics have the most corners:

    frame  := ROWS BETWEEN {UNBOUNDED|n} PRECEDING | CURRENT ROW | n FOLLOWING
                     AND   (same, >= start)
            | RANGE BETWEEN n PRECEDING AND CURRENT ROW   (int order key)
    func   := sum | count | min | max   (decimal-exact value column)
            | lead/lag with offset and explicit default
            | first_value / last_value over the frame
            | rank | dense_rank | ntile(k)  (no explicit frame)

Determinism: the window ORDER BY is the full projected tuple, so ties only
occur between output-identical rows — any frame content is then a function
of position, and per-row outputs are invariant under tie reordering (the
same argument as the relational fuzzer's _WIN_ORDER). Empty frames (e.g.
3 FOLLOWING .. 5 FOLLOWING at a partition tail) are deliberately reachable:
sum/min/max go NULL, count goes 0 — a classic engine-divergence corner.
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from tools.driver_sim import canon

N_CASES = 60

_PARTS = ["l_returnflag", "l_linestatus"]
_ORDER = ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"]
_DEC = "cast(l_quantity AS decimal(18,2))"


def _gen_bound(rng: random.Random, is_start: bool):
    """One frame bound -> (sql fragment, spark offset)."""
    kind = rng.choice(
        ["unbounded", "preceding", "current", "following"]
        if is_start
        else ["preceding", "current", "following", "unbounded"]
    )
    if kind == "unbounded":
        if is_start:
            return "UNBOUNDED PRECEDING", Window.unboundedPreceding
        return "UNBOUNDED FOLLOWING", Window.unboundedFollowing
    if kind == "current":
        return "CURRENT ROW", 0
    n = rng.randint(1, 5)
    if kind == "preceding":
        return f"{n} PRECEDING", -n
    return f"{n} FOLLOWING", n


def _gen_frame(rng: random.Random):
    while True:
        s_sql, s_off = _gen_bound(rng, True)
        e_sql, e_off = _gen_bound(rng, False)
        lo = -(10**9) if s_off == Window.unboundedPreceding else s_off
        hi = 10**9 if e_off == Window.unboundedFollowing else e_off
        if lo <= hi:
            return f"ROWS BETWEEN {s_sql} AND {e_sql}", (s_off, e_off)


def _gen_case(seed: int):
    rng = random.Random(seed)
    part = rng.choice(_PARTS)
    order_sql = ", ".join(_ORDER)
    shape = rng.choices(
        ["agg_rows", "agg_range", "leadlag", "firstlast", "rankfam"],
        weights=[4, 2, 2, 2, 2],
    )[0]

    if shape == "agg_rows":
        frame_sql, (s, e) = _gen_frame(rng)
        fn = rng.choice(["sum", "count", "min", "max"])
        if fn == "sum":
            wsql = (
                f"cast(sum({_DEC}) OVER (PARTITION BY {part} "
                f"ORDER BY {order_sql} {frame_sql}) AS double)"
            )
        elif fn == "count":
            wsql = (
                f"count(*) OVER (PARTITION BY {part} "
                f"ORDER BY {order_sql} {frame_sql})"
            )
        else:
            wsql = (
                f"{fn}(l_quantity) OVER (PARTITION BY {part} "
                f"ORDER BY {order_sql} {frame_sql})"
            )

        def wexpr():
            w = Window.partitionBy(part).orderBy(*_ORDER).rowsBetween(s, e)
            if fn == "sum":
                return F.sum(F.col("l_quantity").cast("decimal(18,2)")).over(w).cast("double")
            if fn == "count":
                return F.count(F.lit(1)).over(w)
            return getattr(F, fn)("l_quantity").over(w)

    elif shape == "agg_range":
        # RANGE frames need a single numeric order key; peers (ties) all
        # share the window value, so determinism is free.
        span = rng.randint(0, 2000)
        fn = rng.choice(["sum", "count"])
        if fn == "sum":
            wsql = (
                f"cast(sum({_DEC}) OVER (PARTITION BY {part} ORDER BY l_orderkey "
                f"RANGE BETWEEN {span} PRECEDING AND CURRENT ROW) AS double)"
            )
        else:
            wsql = (
                f"count(*) OVER (PARTITION BY {part} ORDER BY l_orderkey "
                f"RANGE BETWEEN {span} PRECEDING AND CURRENT ROW)"
            )

        def wexpr():
            w = (
                Window.partitionBy(part)
                .orderBy("l_orderkey")
                .rangeBetween(-span, 0)
            )
            if fn == "sum":
                return F.sum(F.col("l_quantity").cast("decimal(18,2)")).over(w).cast("double")
            return F.count(F.lit(1)).over(w)

    elif shape == "leadlag":
        fn = rng.choice(["lead", "lag"])
        off = rng.randint(1, 4)
        dflt = rng.choice([None, 0, 999])
        d_sql = "" if dflt is None else f", {dflt}"
        wsql = (
            f"{fn}(l_quantity, {off}{d_sql}) OVER "
            f"(PARTITION BY {part} ORDER BY {order_sql})"
        )

        def wexpr():
            w = Window.partitionBy(part).orderBy(*_ORDER)
            f_ = F.lead if fn == "lead" else F.lag
            if dflt is None:
                return f_("l_quantity", off).over(w)
            return f_("l_quantity", off, dflt).over(w)

    elif shape == "firstlast":
        frame_sql, (s, e) = _gen_frame(rng)
        fn = rng.choice(["first_value", "last_value"])
        wsql = (
            f"{fn}(l_quantity) OVER (PARTITION BY {part} "
            f"ORDER BY {order_sql} {frame_sql})"
        )

        def wexpr():
            w = Window.partitionBy(part).orderBy(*_ORDER).rowsBetween(s, e)
            f_ = F.first if fn == "first_value" else F.last
            return f_("l_quantity").over(w)

    else:  # rankfam — no explicit frame
        fn = rng.choice(["rank", "dense_rank", "ntile"])
        if fn == "ntile":
            k = rng.randint(2, 7)
            wsql = (
                f"cast(ntile({k}) OVER (PARTITION BY {part} "
                f"ORDER BY {order_sql}) AS int)"
            )
        else:
            wsql = f"{fn}() OVER (PARTITION BY {part} ORDER BY {order_sql})"

        def wexpr():
            w = Window.partitionBy(part).orderBy(*_ORDER)
            if fn == "ntile":
                return F.ntile(k).over(w)
            return getattr(F, fn)().over(w)

    cols = [part, *_ORDER]
    sql = f"SELECT {', '.join(cols)}, {wsql} AS wv FROM lineitem"

    def build(li):
        return li.select(*cols, wexpr().alias("wv"))

    return build, sql


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{sf_dir}/lineitem.parquet')"
    )
    yield con
    con.close()


@pytest.fixture(scope="module")
def li(spark, sf_dir):
    from real_estate_project1_etl_spark.sources.parquet import load_table

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    return load_table(spark, sf_dir, "lineitem")


@pytest.mark.parametrize("seed", range(N_CASES))
def test_window_frame_matches_duckdb(seed, spark, duck, li):
    build, sql = _gen_case(seed)
    sdf = build(li).toPandas()
    ddf = duck.execute(sql).df()
    assert canon(sdf) == canon(ddf), f"divergence on seed={seed}\nSQL: {sql}"
