"""Grouped-map (applyInPandas) operators and document chunking."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from real_estate_project1_etl_spark.operators.groups import (
    group_linear_fit,
    minmax_normalize,
)
from real_estate_project1_etl_spark.operators.textstats import chunk_documents


def test_linear_fit_recovers_exact_line(spark):
    # property: an exactly-linear group is recovered (slope 3, intercept -2)
    rows = [(g, float(x), 3.0 * x - 2.0 + g) for g in (1, 2) for x in range(10)]
    df = spark.createDataFrame(rows, "g int, x double, y double")
    out = {r.g: r for r in group_linear_fit(df, ["g"], "x", "y").collect()}
    for g in (1, 2):
        assert abs(out[g].slope - 3.0) < 1e-9
        assert abs(out[g].intercept - (-2.0 + g)) < 1e-9
        assert out[g].n_points == 10


def test_linear_fit_degenerate_group_is_nan(spark):
    df = spark.createDataFrame([(1, 5.0, 2.0)], "g int, x double, y double")
    row = group_linear_fit(df, ["g"], "x", "y").collect()[0]
    assert row.slope is None  # NaN -> null across the Arrow boundary


def test_minmax_constant_group_is_null(spark):
    df = spark.createDataFrame(
        [(1, 7.0), (1, 7.0), (2, 1.0), (2, 3.0)], "g int, v double"
    )
    out = {(r.g, r.v): r.value_norm for r in minmax_normalize(df, ["g"], "v").collect()}
    assert out[(1, 7.0)] is None
    assert out[(2, 1.0)] == 0.0
    assert out[(2, 3.0)] == 1.0


def test_chunking_covers_text_and_skips_empty(spark):
    df = spark.createDataFrame(
        [(1, "a" * 400), (2, ""), (3, "short")], "doc_id long, text string"
    )
    out = chunk_documents(df, chunk_size=200, overlap=50)
    rows = {r.doc_id: sorted((c.chunk_id, c.chunk_text) for c in out.collect() if c.doc_id == r.doc_id)
            for r in out.select("doc_id").distinct().collect()}
    assert 2 not in rows  # empty doc -> no chunks
    assert rows[3] == [(0, "short")]
    # 400 chars, stride 150 -> starts 0,150,300 -> 3 chunks; stitch check:
    chunks = rows[1]
    assert len(chunks) == 3
    rebuilt = chunks[0][1] + "".join(c[1][50:] for c in chunks[1:])
    assert rebuilt == "a" * 400


def test_chunk_ids_are_contiguous(spark, sf_dir):
    from real_estate_project1_etl_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = chunk_documents(docs, chunk_size=200, overlap=50)
    agg = (
        out.groupBy("doc_id")
        .agg(F.min("chunk_id").alias("lo"), F.max("chunk_id").alias("hi"),
             F.count(F.lit(1)).alias("n"))
        .filter((F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1))
    )
    assert agg.count() == 0


def test_asof_join_semantics(spark):
    from real_estate_project1_etl_spark.operators.relational import asof_join

    left = spark.createDataFrame(
        [(1, 100, 10), (1, 101, 20), (2, 200, 10)],
        "lk int, lid int, lts int",
    )
    right = spark.createDataFrame(
        [(1, 900, 10), (1, 901, 10), (1, 902, 15), (2, 903, 11)],
        "rk int, rid int, rts int",
    )
    out = {
        r.lid: r.rid
        for r in asof_join(
            left, right, "lk", "rk", "lts", "rts", tiebreak="rid"
        ).collect()
    }
    assert out[100] == 901  # tie at ts=10 -> max tiebreak wins
    assert out[101] == 902  # most recent at-or-before 20
    assert out[200] is None  # right row at ts=11 is AFTER the left row


def test_asof_join_rejects_column_overlap(spark):
    import pytest as _pytest

    from real_estate_project1_etl_spark.operators.relational import asof_join

    df = spark.createDataFrame([(1, 2)], "k int, ts int")
    with _pytest.raises(ValueError):
        asof_join(df, df, "k", "k", "ts", "ts", tiebreak="k")


def test_dispersion_stats_match_numpy(spark, sf_dir):
    import numpy as np

    import __spark_entry__ as entry_mod

    got = {
        r["l_returnflag"]: r
        for r in entry_mod.queries()["dispersion_stats"](spark, sf_dir).collect()
    }
    import duckdb

    raw = duckdb.sql(
        f"SELECT l_returnflag, l_quantity FROM '{sf_dir}/lineitem.parquet'"
    ).df()
    for flag, grp in raw.groupby("l_returnflag"):
        x = grp["l_quantity"].to_numpy(dtype=float)
        n, mean = len(x), x.mean()
        m2 = ((x - mean) ** 2).mean()
        m3 = ((x - mean) ** 3).mean()
        m4 = ((x - mean) ** 4).mean()
        r = got[flag]
        assert r["n"] == n
        assert abs(r["var_qty"] - x.var(ddof=1)) < 1e-6 * max(1, x.var(ddof=1))
        assert abs(r["std_qty"] - x.std(ddof=1)) < 1e-6 * max(1, x.std(ddof=1))
        # Spark skewness/kurtosis are population moments (m3/m2^1.5,
        # m4/m2^2 - 3)
        assert abs(r["skew_qty"] - m3 / m2**1.5) < 1e-6
        assert abs(r["kurt_qty"] - (m4 / m2**2 - 3)) < 1e-6


def test_user_value_anomalies_match_numpy(spark, sf_dir):
    import numpy as np

    import __spark_entry__ as entry_mod
    import duckdb

    got = {
        r["event_id"]: r["z"]
        for r in entry_mod.queries()["user_value_anomalies"](spark, sf_dir).collect()
    }
    raw = duckdb.sql(
        f"SELECT event_id, user_id, value FROM '{sf_dir}/events.parquet'"
    ).df()
    expected = {}
    for _, grp in raw.groupby("user_id"):
        x = grp["value"].to_numpy(dtype=float)
        mean, std = x.mean(), x.std()  # population std, matching stddev_pop
        if std == 0:
            continue
        for eid, v in zip(grp["event_id"], x):
            z = (v - mean) / std
            if abs(z) > 2:
                expected[eid] = z
    assert set(got) == set(expected)
    for eid, z in expected.items():
        assert abs(got[eid] - z) < 1e-6, (eid, got[eid], z)


def test_group_linear_fit_exact_matches_bigint_model(spark):
    # exact-rational python model over the same quantized inputs —
    # slopes/intercepts as truncating ppm divisions (Spark div == //
    # toward zero; inputs here are all non-negative)
    from real_estate_project1_etl_spark.operators.groups import (
        group_linear_fit_exact,
    )

    rows = []
    for i in range(200):
        g = "ab"[i % 2]
        rows.append((g, i, 2.5 * i + 7.25 + (i % 5) * 0.125))
    rows.append(("solo", 999, 3.0))  # degenerate: one point -> NULL fit
    df = spark.createDataFrame(rows, "g string, x bigint, y double")
    got = {
        r["g"]: (r["n_points"], r["slope_ppm"], r["intercept_ppm"])
        for r in group_linear_fit_exact(df, ["g"], "x", "y").collect()
    }

    def model(pts):
        q = [(x, math.floor(y * 1_000_000)) for x, y in pts]
        n = len(q)
        sx = sum(x for x, _ in q)
        sy = sum(y for _, y in q)
        sxy = sum(x * y for x, y in q)
        sxx = sum(x * x for x, _ in q)
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        if den == 0:
            return (n, None, None)

        def tdiv(a, b):
            qq = abs(a) // abs(b)
            return qq if (a >= 0) == (b > 0) else -qq

        return (
            n,
            tdiv(1_000_000 * num, den * 1_000_000),
            tdiv(
                1_000_000 * (sy * den - num * sx),
                n * den * 1_000_000,
            ),
        )

    for g in ("a", "b", "solo"):
        pts = [(x, y) for gg, x, y in rows if gg == g]
        assert got[g] == model(pts), g
    # sanity: slope of y = 2.5x + ... is ~2_500_000 ppm
    assert abs(got["a"][1] - 2_500_000) < 30_000


def test_group_linear_fit_exact_rejects_bad_scale(spark):
    import pytest

    from real_estate_project1_etl_spark.operators.groups import (
        group_linear_fit_exact,
    )

    df = spark.createDataFrame([("g", 1, 1.0)], "g string, x bigint, y double")
    with pytest.raises(ValueError):
        group_linear_fit_exact(df, ["g"], "x", "y", y_scale=0)


def test_rfm_ntile_quartiles_deterministic(spark):
    # 6 values, ntile(4) -> bucket sizes 2,2,1,1 (SQL-standard
    # remainder-to-front); ties on the metric break by the id column
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate([10, 10, 20, 30, 40, 50])],
        "id int, v int",
    )
    w = Window.orderBy("v", "id")
    got = [
        (r.id, r.q)
        for r in df.select("id", F.ntile(4).over(w).alias("q"))
        .orderBy("id")
        .collect()
    ]
    assert got == [(0, 1), (1, 1), (2, 2), (3, 2), (4, 3), (5, 4)]
