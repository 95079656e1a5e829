"""Differential fuzzing: randomized relational plans executed by BOTH the
Spark engine and DuckDB from one generated spec, results compared exactly.

The 117 hand-written oracles pin the operators we thought to test; the
fuzzer covers the combinations we didn't.  Every case is generated from a
seeded RNG (fully deterministic, no flaky reruns) over a small grammar:

    base   := lineitem | lineitem JOIN orders ON orderkey
    filter := 0-2 of {numeric cmp, string IN-list, date range}
    shape  := GROUP BY subset + aggregates [+ HAVING]
            | project + total-order LIMIT
            | window function over string partition (row_number / lag /
              running decimal sum / partition total)
            | bag-semantics set op of two filtered projections
              (UNION ALL / INTERSECT ALL / EXCEPT ALL)
            | ROLLUP grouping with per-key GROUPING() markers
            | LEFT OUTER join against pre-filtered orders + null-aware
              aggregates (count(*) vs count(o_orderkey))
            | correlated [NOT] EXISTS subquery (semi/anti join plan)
            | decorrelated scalar subquery via exact cross-multiplication
              (x * count(*) vs sum(x) — avg() result types differ between
              engines, the cross-multiplied form is decimal-exact)

Determinism rules match the production queries (NOTES.md): money sums are
exact decimal cast double at the boundary, conditional counts are
engine-exact int64, sorts carry a unique tiebreak, no float rounding.
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from tools.driver_sim import canon

N_CASES = 40

_NUM_COLS = {
    "l_quantity": (1, 50),
    "l_extendedprice": (900, 60000),
    "l_discount": (0.0, 0.1),
}
_STR_COLS = {
    "l_returnflag": ["A", "N", "R"],
    "l_linestatus": ["F", "O"],
}
_ORDERS_STR = {"o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW"]}
_GROUP_KEYS = ["l_returnflag", "l_linestatus"]
_DEC = "cast({c} AS decimal(18,2))"


def _gen_filters(rng: random.Random, joined: bool):
    """Returns (spark_condition_builder, sql_where_fragments)."""
    conds, sqls = [], []
    for _ in range(rng.randint(0, 2)):
        kind = rng.choice(["num", "str", "date"] + (["onum"] if joined else []))
        if kind == "num":
            col, (lo, hi) = rng.choice(list(_NUM_COLS.items()))
            op = rng.choice([">", "<", ">=", "<="])
            val = round(rng.uniform(lo, hi), 2)
            conds.append((col, op, val))
            sqls.append(f"{col} {op} {val}")
        elif kind == "onum":
            val = round(rng.uniform(1000, 400000), 2)
            op = rng.choice([">", "<"])
            conds.append(("o_totalprice", op, val))
            sqls.append(f"o_totalprice {op} {val}")
        elif kind == "str":
            col, domain = rng.choice(list(_STR_COLS.items()))
            vals = rng.sample(domain, rng.randint(1, len(domain) - 1))
            conds.append((col, "in", vals))
            quoted = ", ".join(f"'{v}'" for v in vals)
            sqls.append(f"{col} IN ({quoted})")
        else:
            m = rng.randint(1, 12)
            y = rng.choice([1995, 1996, 1997])
            bound = f"{y}-{m:02d}-01"
            op = rng.choice([">=", "<"])
            conds.append(("l_shipdate", op, bound))
            sqls.append(f"l_shipdate {op} TIMESTAMP '{bound}'")
    return conds, sqls


def _apply_filters(df, conds):
    for col, op, val in conds:
        c = F.col(col)
        if op == "in":
            df = df.filter(c.isin(*val))
        elif op == ">":
            df = df.filter(c > val)
        elif op == "<":
            df = df.filter(c < val)
        elif op == ">=":
            df = df.filter(c >= val)
        else:
            df = df.filter(c <= val)
    return df


def _gen_aggs(rng: random.Random, joined: bool):
    """Returns (spark_agg_exprs, sql_agg_fragments) — 1-3 aggregates."""
    exprs, sqls = [], []
    picks = rng.sample(
        [
            "cnt",
            "sum_qty",
            "sum_rev",
            "min_q",
            "max_p",
            "cond_cnt",
            "avg_q",
            # DISTINCT aggregates: one is a distinct-agg rewrite; two over
            # DIFFERENT columns force Spark's Expand-based multi-distinct
            # plan — a physical path nothing else in the suite touches
            "cntd_supp",
            "cntd_part",
            "sumd_qty",
        ],
        rng.randint(1, 3),
    )
    for i, p in enumerate(picks):
        a = f"a{i}"
        if p == "cnt":
            exprs.append(F.count(F.lit(1)).alias(a))
            sqls.append(f"count(*) AS {a}")
        elif p == "sum_qty":
            exprs.append(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias(a))
            sqls.append(f"cast(sum({_DEC.format(c='l_quantity')}) AS double) AS {a}")
        elif p == "sum_rev":
            exprs.append(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
                ).cast("double").alias(a)
            )
            sqls.append(
                f"cast(sum({_DEC.format(c='l_extendedprice')}"
                f" * (1 - {_DEC.format(c='l_discount')})) AS double) AS {a}"
            )
        elif p == "min_q":
            exprs.append(F.min("l_quantity").alias(a))
            sqls.append(f"min(l_quantity) AS {a}")
        elif p == "max_p":
            exprs.append(F.max("l_extendedprice").alias(a))
            sqls.append(f"max(l_extendedprice) AS {a}")
        elif p == "cond_cnt":
            col, domain = rng.choice(list(_STR_COLS.items()))
            v = rng.choice(domain)
            exprs.append(F.count(F.when(F.col(col) == v, 1)).alias(a))
            sqls.append(f"count(*) FILTER (WHERE {col} = '{v}') AS {a}")
        elif p == "cntd_supp":
            exprs.append(F.countDistinct("l_suppkey").alias(a))
            sqls.append(f"count(DISTINCT l_suppkey) AS {a}")
        elif p == "cntd_part":
            exprs.append(F.countDistinct("l_partkey").alias(a))
            sqls.append(f"count(DISTINCT l_partkey) AS {a}")
        elif p == "sumd_qty":
            # distinct decimals sum exactly in any order — boundary double
            exprs.append(
                F.sum_distinct(
                    F.col("l_quantity").cast("decimal(18,2)")
                ).cast("double").alias(a)
            )
            sqls.append(
                f"cast(sum(DISTINCT {_DEC.format(c='l_quantity')})"
                f" AS double) AS {a}"
            )
        else:  # avg_q — exact-decimal sum over exact count, double at boundary
            exprs.append(
                (
                    F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
                    / F.count(F.lit(1))
                ).alias(a)
            )
            sqls.append(
                f"cast(sum({_DEC.format(c='l_quantity')}) AS double)"
                f" / count(*) AS {a}"
            )
    return exprs, sqls


# window ORDER BY == the full projection, so tied rows are output-identical
# and every windowed expression is a function of the ordering columns —
# tie reorderings cannot change row_number/lag/prefix-sum outputs as a
# multiset (same argument as the LIMIT shape; see NOTES.md pitfalls).
_WIN_ORDER = ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"]


def _gen_window(rng: random.Random):
    part = rng.choice(list(_STR_COLS))
    func = rng.choice(["row_number", "lag_qty", "run_sum", "part_sum"])
    order_sql = ", ".join(_WIN_ORDER)
    if func == "row_number":
        wsql = f"row_number() OVER (PARTITION BY {part} ORDER BY {order_sql})"
    elif func == "lag_qty":
        wsql = f"lag(l_quantity) OVER (PARTITION BY {part} ORDER BY {order_sql})"
    elif func == "run_sum":
        wsql = (
            f"cast(sum({_DEC.format(c='l_quantity')}) OVER ("
            f"PARTITION BY {part} ORDER BY {order_sql} "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS double)"
        )
    else:
        wsql = (
            f"cast(sum({_DEC.format(c='l_quantity')}) "
            f"OVER (PARTITION BY {part}) AS double)"
        )

    def expr():
        from pyspark.sql import Window

        w = Window.partitionBy(part).orderBy(*_WIN_ORDER)
        if func == "row_number":
            return F.row_number().over(w)
        if func == "lag_qty":
            return F.lag("l_quantity").over(w)
        q = F.col("l_quantity").cast("decimal(18,2)")
        if func == "run_sum":
            return (
                F.sum(q)
                .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
                .cast("double")
            )
        return F.sum(q).over(Window.partitionBy(part)).cast("double")

    return part, wsql, expr


_SETOP_COLS = ["l_returnflag", "l_linestatus", "l_quantity"]


def _gen_setop(rng: random.Random):
    """Bag-semantics set op of two differently-filtered projections of
    lineitem — multiplicity handling is where engines diverge, so compare
    the full multiset."""
    op = rng.choice(["UNION ALL", "INTERSECT ALL", "EXCEPT ALL"])
    conds_a, sql_a = _gen_filters(rng, joined=False)
    conds_b, sql_b = _gen_filters(rng, joined=False)
    cols = ", ".join(_SETOP_COLS)
    wa = f" WHERE {' AND '.join(sql_a)}" if sql_a else ""
    wb = f" WHERE {' AND '.join(sql_b)}" if sql_b else ""
    sql = (
        f"SELECT {cols} FROM lineitem{wa} {op} "
        f"SELECT {cols} FROM lineitem{wb}"
    )

    def build(li):
        a = _apply_filters(li, conds_a).select(*_SETOP_COLS)
        b = _apply_filters(li, conds_b).select(*_SETOP_COLS)
        if op == "UNION ALL":
            return a.unionAll(b)
        if op == "INTERSECT ALL":
            return a.intersectAll(b)
        return a.exceptAll(b)

    return build, sql


def _gen_case(seed: int):
    """One random plan: (build_spark(spark, tables) -> DataFrame, sql)."""
    rng = random.Random(seed)
    joined = rng.random() < 0.4
    conds, where_sql = _gen_filters(rng, joined)
    shape = rng.choices(
        ["group", "limit", "window", "setop", "rollup", "louter", "exists", "scalarsub"],
        weights=[4, 2, 3, 2, 2, 2, 2, 2],
    )[0]
    grouped = shape == "group"
    windowed = shape == "window"

    if shape == "setop":
        build_setop, sql = _gen_setop(rng)

        def build(spark, li, orders):
            return build_setop(li)

        return build, sql

    if shape == "rollup":
        # NO WHERE here, deliberately: on EMPTY input Spark's rollup/cube
        # emits no rows while DuckDB/Postgres (and the SQL standard) emit
        # the grand-total row of the () grouping set — a real engine
        # divergence this fuzzer discovered (NOTES.md pitfalls). Random
        # filters can produce an empty input, so the rollup shape runs
        # over the full table, which is never empty.
        keys = rng.sample(_GROUP_KEYS, rng.randint(1, 2))
        aggs, agg_sql = _gen_aggs(rng, joined=False)
        gmarks_sql = [f"grouping({k}) AS g_{k}" for k in keys]
        select_sql = ", ".join(keys + gmarks_sql + agg_sql)
        sql = (
            f"SELECT {select_sql} FROM lineitem "
            f"GROUP BY ROLLUP ({', '.join(keys)})"
        )

        def build(spark, li, orders):
            marks = [F.grouping(k).cast("bigint").alias(f"g_{k}") for k in keys]
            return li.rollup(*keys).agg(*marks, *aggs)

        return build, sql

    if shape == "louter":
        # orders pre-filtered in a subquery (filters on the outer side of
        # a LEFT join are NOT equivalent to post-join filters — the
        # classic outer-join rewrite trap, exercised here on purpose).
        # Left-side filters regenerate with joined=False: they are applied
        # to bare lineitem, so o_totalprice must not appear.
        conds, where_sql = _gen_filters(rng, joined=False)
        cut = round(rng.uniform(1000, 400000), 2)
        keys = rng.sample(_GROUP_KEYS, rng.randint(1, 2))
        where = f" WHERE {' AND '.join(where_sql)}" if where_sql else ""
        sql = (
            f"SELECT {', '.join(keys)}, count(*) AS n_rows, "
            f"count(o_orderkey) AS n_matched FROM (SELECT * FROM lineitem{where}) l "
            f"LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > {cut}) o "
            f"ON l.l_orderkey = o.o_orderkey GROUP BY {', '.join(keys)}"
        )

        def build(spark, li, orders):
            left = _apply_filters(li, conds)
            right = orders.filter(F.col("o_totalprice") > cut)
            return (
                left.join(right, F.col("l_orderkey") == F.col("o_orderkey"), "left")
                .groupBy(*keys)
                .agg(
                    F.count(F.lit(1)).alias("n_rows"),
                    F.count("o_orderkey").alias("n_matched"),
                )
            )

        return build, sql

    if shape == "exists":
        # correlated [NOT] EXISTS — planned as a semi/anti join. The
        # subquery's own filter makes the key set a strict subset, so the
        # NOT EXISTS branch exercises the null-safe anti-join path too.
        # filters apply to bare lineitem here — regenerate without the
        # joined-only o_totalprice condition (same trap as louter)
        conds, where_sql = _gen_filters(rng, joined=False)
        negated = rng.random() < 0.5
        cut = round(rng.uniform(1000, 400000), 2)
        keys = rng.sample(_GROUP_KEYS, rng.randint(1, 2))
        kw = "NOT EXISTS" if negated else "EXISTS"
        where = f" AND {' AND '.join(where_sql)}" if where_sql else ""
        sql = (
            f"SELECT {', '.join(keys)}, count(*) AS n FROM lineitem l "
            f"WHERE {kw} (SELECT 1 FROM orders o "
            f"WHERE o.o_orderkey = l.l_orderkey AND o.o_totalprice > {cut})"
            f"{where} GROUP BY {', '.join(keys)}"
        )

        def build(spark, li, orders):
            right = orders.filter(F.col("o_totalprice") > cut)
            df = _apply_filters(li, conds)
            df = df.join(
                right,
                F.col("l_orderkey") == F.col("o_orderkey"),
                "left_anti" if negated else "left_semi",
            )
            return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))

        return build, sql

    if shape == "scalarsub":
        # above/below-global-average via EXACT cross-multiplication:
        # x * count > sum  avoids the engine-specific avg() result type
        # (DuckDB avg(decimal) -> double, Spark -> wider decimal) while
        # testing the same decorrelated scalar-subquery plan shape.
        conds, where_sql = _gen_filters(rng, joined=False)
        col = rng.choice(["l_quantity", "l_extendedprice"])
        op_sql, op_is_gt = rng.choice([(">", True), ("<=", False)])
        keys = rng.sample(_GROUP_KEYS, rng.randint(1, 2))
        where = f" AND {' AND '.join(where_sql)}" if where_sql else ""
        dcol = _DEC.format(c=col)
        sql = (
            f"SELECT {', '.join(keys)}, count(*) AS n FROM lineitem "
            f"WHERE {dcol} * (SELECT count(*) FROM lineitem) {op_sql} "
            f"(SELECT sum({dcol}) FROM lineitem)"
            f"{where} GROUP BY {', '.join(keys)}"
        )

        def build(spark, li, orders):
            tot = li.agg(
                F.count(F.lit(1)).alias("_cnt"),
                F.sum(F.col(col).cast("decimal(18,2)")).alias("_tot"),
            )
            lhs = F.col(col).cast("decimal(18,2)") * F.col("_cnt")
            cond = lhs > F.col("_tot") if op_is_gt else lhs <= F.col("_tot")
            df = _apply_filters(li, conds).crossJoin(F.broadcast(tot)).filter(cond)
            return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))

        return build, sql

    if windowed:
        part, wsql, wexpr = _gen_window(rng)
        out_cols = [part, *_WIN_ORDER]
        select_sql = ", ".join(out_cols) + f", {wsql} AS wv"
        tail_sql = ""
    elif grouped:
        keys = rng.sample(_GROUP_KEYS, rng.randint(1, 2))
        if joined and rng.random() < 0.5:
            keys.append("o_orderpriority")
        aggs, agg_sql = _gen_aggs(rng, joined)
        select_sql = ", ".join(keys + agg_sql)
        tail_sql = f" GROUP BY {', '.join(keys)}"
        having_n = rng.randint(1, 500) if rng.random() < 0.3 else None
        if having_n is not None:
            tail_sql += f" HAVING count(*) > {having_n}"
    else:
        # ORDER BY covers EVERY output column: the synthetic lineitem has
        # duplicate (l_orderkey, l_linenumber) pairs (unlike real TPC-H —
        # fuzzer-discovered), so no short prefix is a total order.  Sorting
        # on the full projection makes the LIMIT cut deterministic as a
        # multiset: rows tied at the cut line are output-identical.
        cols = ["l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"]
        k = rng.randint(5, 50)
        select_sql = ", ".join(cols)
        tail_sql = f" ORDER BY {', '.join(cols)} LIMIT {k}"

    base_sql = (
        "lineitem JOIN orders ON l_orderkey = o_orderkey" if joined else "lineitem"
    )
    where = f" WHERE {' AND '.join(where_sql)}" if where_sql else ""
    sql = f"SELECT {select_sql} FROM {base_sql}{where}{tail_sql}"

    def build(spark, li, orders):
        df = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")) if joined else li
        df = _apply_filters(df, conds)
        if windowed:
            return df.select(*out_cols, wexpr().alias("wv"))
        if grouped:
            if having_n is not None:
                return (
                    df.groupBy(*keys)
                    .agg(*aggs, F.count(F.lit(1)).alias("_n"))
                    .filter(F.col("_n") > having_n)
                    .drop("_n")
                )
            return df.groupBy(*keys).agg(*aggs)
        return df.select(*cols).orderBy(*cols).limit(k)

    return build, sql


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.fixture(scope="module")
def tables(spark, sf_dir):
    from real_estate_project1_etl_spark.sources.parquet import load_table

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    return load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "orders")


@pytest.mark.parametrize("seed", range(N_CASES))
def test_fuzz_case_matches_duckdb(seed, spark, duck, tables):
    build, sql = _gen_case(seed)
    sdf = build(spark, *tables).toPandas()
    ddf = duck.execute(sql).df()
    assert canon(sdf) == canon(ddf), f"divergence on seed={seed}\nSQL: {sql}"
