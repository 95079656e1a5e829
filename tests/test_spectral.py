"""Spectral family: exact-integer scatter + power iteration — replayed
step-for-step by an independent python integer model, aligned with
numpy's dense eigendecomposition, and pinned on planted geometry."""

from __future__ import annotations

import math

import numpy as np
import pytest

from real_estate_project1_etl_spark.operators.spectral import (
    power_iteration_top_component,
    quantized_scatter,
)


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (toward zero) — Spark's ``div`` /
    DuckDB's ``//`` semantics, NOT python's floor ``//``."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b > 0) else -q


def _py_model(vectors, dim, n_iters=8, scale=256):
    q = [[math.floor(x * scale) for x in v] for v in vectors]
    n = len(q)
    s = [sum(row[i] for row in q) for i in range(dim)]
    c = [
        [
            n * sum(row[i] * row[j] for row in q) - s[i] * s[j]
            for j in range(dim)
        ]
        for i in range(dim)
    ]
    t = max(max(abs(x) for r in c for x in r).bit_length() - 36, 0)
    c = [[_tdiv(x, 1 << t) for x in r] for r in c]
    v = [1] * dim
    for _ in range(n_iters):
        u = [sum(c[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        sh = max(max(abs(x) for x in u).bit_length() - 20, 0)
        v = [_tdiv(x, 1 << sh) for x in u]
    m = max(abs(x) for x in v)
    if m == 0:
        return {i + 1: None for i in range(dim)}, c
    return {i + 1: _tdiv(1_000_000 * x, m) for i, x in enumerate(v)}, c


def _run(spark, vectors, dim, n_iters=8):
    df = spark.createDataFrame(
        [(i, list(map(float, v))) for i, v in enumerate(vectors)],
        "vec_id bigint, embedding array<double>",
    )
    sc = quantized_scatter(df, "embedding", scale_pow2=8)
    out = power_iteration_top_component(sc, dim=dim, n_iters=n_iters)
    return {r["i"]: r["v_ppm"] for r in out.collect()}


def test_power_iteration_replays_python_integer_model(spark):
    rng = np.random.default_rng(7)
    dim = 8
    vectors = (rng.standard_normal((40, dim)) * 0.3).tolist()
    got = _run(spark, vectors, dim)
    want, _ = _py_model(vectors, dim)
    assert got == want


def test_dominant_direction_aligns_with_numpy_eig(spark):
    rng = np.random.default_rng(11)
    dim = 12
    u = rng.standard_normal(dim)
    u /= np.linalg.norm(u)
    # planted spike: strong u component + small isotropic noise
    data = (
        np.outer(rng.standard_normal(200) * 2.0, u)
        + rng.standard_normal((200, dim)) * 0.05
    )
    got = _run(spark, data.tolist(), dim, n_iters=8)
    v = np.array([got[i + 1] for i in range(dim)], dtype=float)
    # numpy eigenvector of the SAME shifted integer scatter the engine used
    _, c = _py_model(data.tolist(), dim)
    w, vecs = np.linalg.eigh(np.array(c, dtype=float))
    top = vecs[:, np.argmax(w)]
    cos = abs(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top))
    assert cos > 0.999, cos
    # and the planted direction itself is recovered
    cos_u = abs(v @ u) / (np.linalg.norm(v) * np.linalg.norm(u))
    assert cos_u > 0.99, cos_u


def test_degenerate_zero_scatter_yields_null_direction(spark):
    vectors = [[0.25, -0.5, 0.125]] * 10  # identical rows -> C == 0
    got = _run(spark, vectors, 3)
    assert got == {1: None, 2: None, 3: None}


def test_power_iteration_validations(spark):
    df = spark.createDataFrame(
        [(0, [0.1, 0.2])], "vec_id bigint, embedding array<double>"
    )
    sc = quantized_scatter(df, "embedding")
    with pytest.raises(ValueError):
        power_iteration_top_component(sc, dim=0)
    with pytest.raises(ValueError):
        power_iteration_top_component(sc, dim=65)
    with pytest.raises(ValueError):
        power_iteration_top_component(sc, dim=2, n_iters=0)


def test_registered_query_direction_is_unit_scaled(spark, sf_dir):
    import __spark_entry__ as entry

    rows = entry.queries()["embeddings_top_component"](
        spark, sf_dir
    ).collect()
    assert len(rows) == 64
    vals = [r["v_ppm"] for r in rows]
    assert all(v is not None for v in vals)
    assert max(abs(v) for v in vals) == 1_000_000  # ppm-of-max scaling


def test_remove_component_exact_orthogonality_and_model(spark):
    from real_estate_project1_etl_spark.operators.spectral import (
        remove_component,
    )

    rng = np.random.default_rng(3)
    dim = 6
    vecs = (rng.standard_normal((30, dim)) * 0.4).tolist()
    emb = spark.createDataFrame(
        [(i, list(map(float, v))) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<double>",
    )
    comp_vals = [317, -250, 991, 12, -44, 600]
    comp = spark.createDataFrame(
        [(i + 1, v) for i, v in enumerate(comp_vals)], "i int, v_ppm bigint"
    )
    out = remove_component(emb, comp, "embedding", "vec_id").collect()
    got = {}
    for r in out:
        got.setdefault(r["vec_id"], {})[r["i"]] = r["r"]
    den = sum(v * v for v in comp_vals)
    for vid, v in enumerate(vecs):
        q = [math.floor(x * 256) for x in v]
        num = sum(qi * vi for qi, vi in zip(q, comp_vals))
        want = [den * qi - num * vi for qi, vi in zip(q, comp_vals)]
        assert [got[vid][i + 1] for i in range(dim)] == want
        # exact orthogonality: r . v == 0 (integer identity)
        assert sum(w * vi for w, vi in zip(want, comp_vals)) == 0


def test_registered_abtt_residuals_orthogonal_to_component(spark, sf_dir):
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    comp = {
        r["i"]: r["v_ppm"]
        for r in entry.queries()["embeddings_top_component"](
            spark, sf_dir
        ).collect()
    }
    res = entry.queries()["embeddings_abtt_residuals"](spark, sf_dir)
    vdf = res.sparkSession.createDataFrame(
        [(i, v) for i, v in comp.items()], "i int, v bigint"
    )
    dots = (
        res.join(F.broadcast(vdf), "i")
        .groupBy("vec_id")
        .agg(F.sum(F.col("r") * F.col("v")).alias("dot"))
        .agg(F.sum(F.abs(F.col("dot"))).alias("total"))
        .collect()[0]["total"]
    )
    assert dots == 0


def test_top2_components_match_numpy_and_deflation_identity(spark):
    from real_estate_project1_etl_spark.operators.spectral import (
        power_iteration_components,
        quantized_scatter,
    )

    rng = np.random.default_rng(19)
    dim = 10
    u1 = rng.standard_normal(dim); u1 /= np.linalg.norm(u1)
    u2 = rng.standard_normal(dim)
    u2 -= (u2 @ u1) * u1; u2 /= np.linalg.norm(u2)
    data = (
        np.outer(rng.standard_normal(300) * 3.0, u1)
        + np.outer(rng.standard_normal(300) * 1.2, u2)
        + rng.standard_normal((300, dim)) * 0.03
    )
    emb = spark.createDataFrame(
        [(i, list(map(float, v))) for i, v in enumerate(data.tolist())],
        "vec_id bigint, embedding array<double>",
    )
    out = power_iteration_components(
        quantized_scatter(emb, "embedding"), dim=dim,
        n_components=2,
    ).collect()
    comps = {1: [0] * dim, 2: [0] * dim}
    for r in out:
        comps[r["component"]][r["i"] - 1] = r["v_ppm"]
    v1 = np.array(comps[1], dtype=float)
    v2 = np.array(comps[2], dtype=float)

    def cos(a, b):
        return abs(a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))

    assert cos(v1, u1) > 0.99, cos(v1, u1)
    assert cos(v2, u2) > 0.99, cos(v2, u2)
    assert cos(v1, v2) < 0.05  # near-orthogonal directions

    # deflation identity on the exact integer model: D w == 0
    _, c = _py_model(data.tolist(), dim)
    # engine's first component == python model's
    want1, _ = _py_model(data.tolist(), dim)
    assert comps[1] == [want1[i + 1] for i in range(dim)]
    w = [_tdiv(v, 1 << 11) for v in comps[1]]
    ww = sum(x * x for x in w)
    cw = [sum(c[i][j] * w[j] for j in range(dim)) for i in range(dim)]
    dw_raw = [
        sum((ww * c[i][j] - cw[i] * w[j]) * w[j] for j in range(dim))
        for i in range(dim)
    ]
    assert all(x == 0 for x in dw_raw)


def test_components_validation(spark):
    from real_estate_project1_etl_spark.operators.spectral import (
        power_iteration_components,
        quantized_scatter,
    )
    import pytest as _pytest

    df = spark.createDataFrame(
        [(0, [0.1, 0.2])], "vec_id bigint, embedding array<double>"
    )
    sc = quantized_scatter(df, "embedding")
    with _pytest.raises(ValueError):
        power_iteration_components(sc, dim=2, n_components=0)


def _py_scatter_hp(vectors, dim, scale_pow2):
    q = [[math.floor(x * (1 << scale_pow2)) for x in v] for v in vectors]
    n = len(q)
    s = [sum(r[i] for r in q) for i in range(dim)]
    c = [
        [n * sum(r[i] * r[j] for r in q) - s[i] * s[j] for j in range(dim)]
        for i in range(dim)
    ]
    m = max(abs(x) for r in c for x in r)
    t = max((10 * len(str(m))) // 3 + 1 - 36, 0)
    return {
        (i + 1, j + 1): _tdiv(c[i][j], 1 << t)
        for i in range(dim)
        for j in range(dim)
    }


def test_decimal_scatter_exact_where_bigint_wraps(spark):
    # scale 2^20 with 5000 near-1.0 rows pushes the centered cell past
    # 2^63: the non-ANSI bigint path wraps SILENTLY; the decimal path
    # must match the python big-int model exactly
    rng = np.random.default_rng(23)
    dim = 4
    vecs = rng.uniform(0.6, 1.0, size=(5000, dim)).tolist()
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<double>",
    )
    want = _py_scatter_hp(vecs, dim, 20)
    # sanity: this really is the int64 overflow regime — the n*G and
    # s*s centering INTERMEDIATES exceed 2^63 (the final centered cell
    # may cancel back into range, which is exactly why the wrap is
    # silent and dangerous)
    q = [[math.floor(x * (1 << 20)) for x in v] for v in vecs]
    n = len(q)
    inter_max = max(
        n * max(sum(r[i] * r[j] for r in q) for i in range(dim) for j in range(dim)),
        max(sum(r[i] for r in q) for i in range(dim)) ** 2,
    )
    assert inter_max > 2**63, inter_max

    got = {
        (r["i"], r["j"]): r["c"]
        for r in quantized_scatter(
            df, "embedding", scale_pow2=20, accumulate="decimal"
        ).collect()
    }
    assert got == want

    # and the bigint path in this regime FAILS LOUD (r12 ADVICE guard):
    # n = 5000 > isqrt(2^(63-40)) = 2896, so the plan raises instead of
    # returning a silently-wrapped scatter
    with pytest.raises(Exception, match="bigint accumulation is exact only"):
        quantized_scatter(
            df, "embedding", scale_pow2=20, accumulate="bigint"
        ).collect()


def test_decimal_scatter_matches_digit_cap_model_small(spark):
    rng = np.random.default_rng(29)
    dim = 6
    vecs = (rng.standard_normal((80, dim)) * 0.4).tolist()
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<double>",
    )
    got = {
        (r["i"], r["j"]): r["c"]
        for r in quantized_scatter(
            df, "embedding", scale_pow2=8, accumulate="decimal"
        ).collect()
    }
    assert got == _py_scatter_hp(vecs, dim, 8)


def test_scatter_rejects_bad_accumulate(spark):
    df = spark.createDataFrame(
        [(0, [0.1])], "vec_id bigint, embedding array<double>"
    )
    with pytest.raises(ValueError):
        quantized_scatter(df, accumulate="float")
    with pytest.raises(ValueError):
        quantized_scatter(df, scale_pow2=31)


def test_scatter_bigint_guard_fires_just_past_bound(spark):
    # at scale 2^30 the bigint exactness bound is isqrt(2^3) = 2 rows:
    # 2 rows pass, 3 rows raise inside the plan (r12 ADVICE guard)
    ok = spark.createDataFrame(
        [(0, [0.5, 0.25]), (1, [0.125, 0.75])],
        "vec_id bigint, embedding array<double>",
    )
    assert (
        quantized_scatter(ok, "embedding", scale_pow2=30).count() == 4
    )
    bad = spark.createDataFrame(
        [(0, [0.5, 0.25]), (1, [0.125, 0.75]), (2, [0.1, 0.2])],
        "vec_id bigint, embedding array<double>",
    )
    with pytest.raises(Exception, match="bigint accumulation is exact only"):
        quantized_scatter(bad, "embedding", scale_pow2=30).collect()


def test_direction_drift_identical_orthogonal_and_planted(spark):
    from real_estate_project1_etl_spark.operators.spectral import (
        direction_drift,
    )

    def mk(vals):
        return spark.createDataFrame(
            [(i + 1, v) for i, v in enumerate(vals)], "i int, v_ppm bigint"
        )

    same = mk([1_000_000, -400_000, 250_000])
    r = direction_drift(same, same).collect()[0]
    assert r["cos2_ppm"] == 1_000_000 and r["dot"] == r["a_norm2"]

    ortho = direction_drift(
        mk([1_000_000, 0]), mk([0, 1_000_000])
    ).collect()[0]
    assert ortho["cos2_ppm"] == 0 and ortho["dot"] == 0

    # sign-flip invariance: the squared cosine ignores the iteration's
    # arbitrary sign
    flipped = direction_drift(
        mk([1_000_000, -400_000]), mk([-1_000_000, 400_000])
    ).collect()[0]
    assert flipped["cos2_ppm"] == 1_000_000

    # degenerate NULL direction -> NULL statistic
    degen = direction_drift(mk([0, 0]), mk([1_000_000, 0])).collect()[0]
    assert degen["cos2_ppm"] is None


def test_drift_detects_planted_rotation(spark):
    # two snapshots sharing a planted spike align; rotating the spike
    # in snapshot B drives the statistic toward 0
    from real_estate_project1_etl_spark.operators.spectral import (
        direction_drift,
        power_iteration_components,
        quantized_scatter,
    )

    rng = np.random.default_rng(31)
    dim = 8
    u = rng.standard_normal(dim); u /= np.linalg.norm(u)
    w = rng.standard_normal(dim)
    w -= (w @ u) * u; w /= np.linalg.norm(w)

    def snap(direction, seed):
        r = np.random.default_rng(seed)
        data = (
            np.outer(r.standard_normal(150) * 2.0, direction)
            + r.standard_normal((150, dim)) * 0.05
        )
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(data.tolist())],
            "vec_id bigint, embedding array<double>",
        )
        return power_iteration_top_component(
            quantized_scatter(df, "embedding"), dim=dim
        )

    same = direction_drift(snap(u, 1), snap(u, 2)).collect()[0]
    rotated = direction_drift(snap(u, 1), snap(w, 3)).collect()[0]
    assert same["cos2_ppm"] > 990_000, same
    assert rotated["cos2_ppm"] < 10_000, rotated


def test_registered_drift_statistic_in_range(spark, sf_dir):
    # the testdata embeddings are near-isotropic (no spectral gap), so
    # the halves' top directions are noise-determined — the registered
    # query pins the STATISTIC's contract (exact integers, in range),
    # not a geometry the corpus doesn't have
    import __spark_entry__ as entry

    r = entry.queries()["embedding_direction_drift"](
        spark, sf_dir
    ).collect()[0]
    assert r["a_norm2"] > 0 and r["b_norm2"] > 0
    assert r["cos2_ppm"] is not None and 0 <= r["cos2_ppm"] <= 1_000_000
