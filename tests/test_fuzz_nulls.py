"""NULL-semantics differential fuzzer: randomized plans over a generated
nullable table executed by BOTH Spark and DuckDB, compared exactly.

The parquet testdata has no NULLs, so the hand-written oracles never
exercise the semantics where engines classically diverge:

  - NULL as a GROUP BY key (one group, not dropped)
  - count(*) vs count(col) vs count(DISTINCT col) null-skipping
  - equi-join keys: NULL never matches NULL...
  - ...unless null-safe equality (Spark <=> / DuckDB IS NOT DISTINCT FROM)
  - set operations: NULLs compare EQUAL in INTERSECT/EXCEPT (unlike =)
  - DISTINCT over nullable tuples
  - ORDER BY ... LIMIT with explicit NULLS FIRST/LAST (Spark's default is
    nulls-first ASC, DuckDB's is nulls-last — every ordered LIMIT over a
    nullable column MUST pin it; this fuzzer proves the pinned forms agree)

Each seed builds the same typed rows in both engines (Arrow for DuckDB,
explicit schema for Spark — pandas would silently float-promote nullable
ints) and one random shape over them.
"""

from __future__ import annotations

import random

import duckdb
import pyarrow as pa
import pytest

from pyspark.sql import functions as F

from tools.driver_sim import canon

N_CASES = 40
N_ROWS = 120


def _gen_rows(rng: random.Random):
    rows = []
    for i in range(N_ROWS):
        k1 = rng.choice([None, "a", "b", "c"])
        k2 = rng.choice([None, 1, 2, 3, 4])
        v = rng.choice([None, *range(0, 50)])
        rows.append((i, k1, k2, v))
    return rows


def _mk_tables(rng, spark, con):
    rows_t = _gen_rows(rng)
    rows_u = _gen_rows(rng)
    sdf_t = spark.createDataFrame(rows_t, "id int, k1 string, k2 int, v int")
    sdf_u = spark.createDataFrame(rows_u, "id int, k1 string, k2 int, v int")
    for name, rows in (("t", rows_t), ("u", rows_u)):
        tbl = pa.table(
            {
                "id": pa.array([r[0] for r in rows], pa.int32()),
                "k1": pa.array([r[1] for r in rows], pa.string()),
                "k2": pa.array([r[2] for r in rows], pa.int32()),
                "v": pa.array([r[3] for r in rows], pa.int32()),
            }
        )
        con.register(name, tbl)
    return sdf_t, sdf_u


def _gen_case(rng):
    shape = rng.choice(
        [
            "group",
            "join",
            "nullsafe_join",
            "setop",
            "distinct",
            "order_limit",
            "agg_distinct",
            "semi_anti",
            "not_in",
        ]
    )

    if shape == "group":
        keys = rng.sample(["k1", "k2"], rng.randint(1, 2))
        # cast: DuckDB sum(int32) is HUGEINT (pandas float-prints it);
        # Spark's is bigint — pin both to bigint
        sql = (
            f"SELECT {', '.join(keys)}, count(*) AS n, count(v) AS nv, "
            f"cast(sum(v) AS bigint) AS sv, min(v) AS mn, max(v) AS mx "
            f"FROM t GROUP BY {', '.join(keys)}"
        )

        def build(t, u):
            return t.groupBy(*keys).agg(
                F.count(F.lit(1)).alias("n"),
                F.count("v").alias("nv"),
                F.sum("v").alias("sv"),
                F.min("v").alias("mn"),
                F.max("v").alias("mx"),
            )

    elif shape == "join":
        how = rng.choice(["inner", "left", "full"])
        kw = {"inner": "JOIN", "left": "LEFT JOIN", "full": "FULL JOIN"}[how]
        key = rng.choice(["k1", "k2"])
        sql = (
            f"SELECT t.id AS tid, u.id AS uid FROM t {kw} u ON t.{key} = u.{key}"
        )

        def build(t, u):
            return t.alias("t").join(
                u.alias("u"), F.col(f"t.{key}") == F.col(f"u.{key}"), how
            ).select(F.col("t.id").alias("tid"), F.col("u.id").alias("uid"))

    elif shape == "nullsafe_join":
        key = rng.choice(["k1", "k2"])
        sql = (
            f"SELECT t.id AS tid, u.id AS uid FROM t JOIN u "
            f"ON t.{key} IS NOT DISTINCT FROM u.{key}"
        )

        def build(t, u):
            return t.alias("t").join(
                u.alias("u"), F.col(f"t.{key}").eqNullSafe(F.col(f"u.{key}"))
            ).select(F.col("t.id").alias("tid"), F.col("u.id").alias("uid"))

    elif shape == "setop":
        op = rng.choice(["INTERSECT ALL", "EXCEPT ALL", "UNION ALL"])
        cols = rng.sample(["k1", "k2", "v"], rng.randint(1, 3))
        c = ", ".join(cols)
        sql = f"SELECT {c} FROM t {op} SELECT {c} FROM u"

        def build(t, u):
            a, b = t.select(*cols), u.select(*cols)
            if op == "UNION ALL":
                return a.unionAll(b)
            if op == "INTERSECT ALL":
                return a.intersectAll(b)
            return a.exceptAll(b)

    elif shape == "distinct":
        cols = rng.sample(["k1", "k2", "v"], rng.randint(1, 2))
        sql = f"SELECT DISTINCT {', '.join(cols)} FROM t"

        def build(t, u):
            return t.select(*cols).distinct()

    elif shape == "order_limit":
        nulls = rng.choice(["FIRST", "LAST"])
        desc = rng.random() < 0.5
        k = rng.randint(5, 40)
        d = "DESC" if desc else "ASC"
        sql = (
            f"SELECT id, v FROM t ORDER BY v {d} NULLS {nulls}, id LIMIT {k}"
        )

        def build(t, u):
            c = F.col("v")
            c = (
                (c.desc_nulls_first() if nulls == "FIRST" else c.desc_nulls_last())
                if desc
                else (c.asc_nulls_first() if nulls == "FIRST" else c.asc_nulls_last())
            )
            return t.select("id", "v").orderBy(c, F.col("id")).limit(k)

    elif shape == "semi_anti":
        # EXISTS / NOT EXISTS over a nullable key: NULL keys never match,
        # so NULL-keyed t rows are always anti-side survivors
        negated = rng.random() < 0.5
        key = rng.choice(["k1", "k2"])
        kw = "NOT EXISTS" if negated else "EXISTS"
        sql = (
            f"SELECT id, {key} FROM t WHERE {kw} "
            f"(SELECT 1 FROM u WHERE u.{key} = t.{key})"
        )

        def build(t, u):
            how = "left_anti" if negated else "left_semi"
            return t.alias("t").join(
                u.alias("u"), F.col(f"t.{key}") == F.col(f"u.{key}"), how
            ).select("id", key)

    elif shape == "not_in":
        # the classic trap: NOT IN over a subquery CONTAINING NULLs is
        # empty (three-valued logic) — Spark plans a null-aware anti
        # join; both engines must implement the same standard semantics
        key = rng.choice(["k1", "k2"])
        sql = (
            f"SELECT id, {key} FROM t "
            f"WHERE {key} NOT IN (SELECT {key} FROM u)"
        )

        def build(t, u):
            t.createOrReplaceTempView("fz_t")
            u.createOrReplaceTempView("fz_u")
            return t.sparkSession.sql(
                f"SELECT id, {key} FROM fz_t "
                f"WHERE {key} NOT IN (SELECT {key} FROM fz_u)"
            )

    else:  # agg_distinct
        key = rng.choice(["k1", "k2"])
        sql = (
            f"SELECT {key}, count(DISTINCT v) AS ndv, "
            f"cast(sum(DISTINCT v) AS bigint) AS sdv FROM t GROUP BY {key}"
        )

        def build(t, u):
            return t.groupBy(key).agg(
                F.countDistinct("v").alias("ndv"),
                F.sum_distinct(F.col("v")).alias("sdv"),
            )

    return build, sql


@pytest.mark.parametrize("seed", range(N_CASES))
def test_null_semantics_match_duckdb(seed, spark):
    rng = random.Random(10_000 + seed)
    con = duckdb.connect()
    try:
        t, u = _mk_tables(rng, spark, con)
        build, sql = _gen_case(rng)
        sdf = build(t, u).toPandas()
        ddf = con.execute(sql).df()
        assert canon(sdf) == canon(ddf), f"divergence on seed={seed}\nSQL: {sql}"
    finally:
        con.close()
