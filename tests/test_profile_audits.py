"""Round-13 governance audits: concentration (HHI/Gini/top-share) and
CUSUM change-point — python-fraction model parity and planted regimes."""

from __future__ import annotations

from real_estate_project1_etl_spark.operators.profile import (
    concentration_audit,
)
from real_estate_project1_etl_spark.operators.timeseries import (
    rate_changepoint,
)


def _conc_model(counts):
    n = sum(counts)
    m = len(counts)
    cs = sorted(counts)
    rc = sum((i + 1) * c for i, c in enumerate(cs))
    return (
        n,
        m,
        (1_000_000 * max(counts)) // n,
        (1_000_000 * sum(c * c for c in counts)) // (n * n),
        ((1_000_000 * (2 * rc - (m + 1) * n)) // (m * n)) if m > 1 else 0,
    )


def test_concentration_matches_model_and_regimes(spark):
    # skewed: one dominant source
    rows = [("a",)] * 70 + [("b",)] * 20 + [("c",)] * 10
    df = spark.createDataFrame(rows, "source string")
    got = concentration_audit(df, "source").collect()[0]
    want = _conc_model([70, 20, 10])
    assert tuple(got) == want
    assert got["top_share_ppm"] == 700_000
    # uniform: HHI = 1e6/m, gini ~ 0
    rows = [(s,) for s in "abcd" for _ in range(25)]
    u = concentration_audit(
        spark.createDataFrame(rows, "source string"), "source"
    ).collect()[0]
    assert u["hhi_ppm"] == 250_000 and u["gini_ppm"] == 0
    assert got["hhi_ppm"] > u["hhi_ppm"]
    # NULL source counts as its own group
    withnull = concentration_audit(
        spark.createDataFrame([("a",), (None,)], "source string"), "source"
    ).collect()[0]
    assert withnull["n_groups"] == 2


def test_changepoint_finds_planted_rate_break(spark):
    # 40 buckets: rate 5/bucket, then 15/bucket from bucket 20 — the
    # max |D_t| of the centered cusum sits exactly at the break
    rows = []
    for t in range(40):
        rate = 5 if t < 20 else 15
        for i in range(rate):
            rows.append((f"b{t:03d}",))
    df = spark.createDataFrame(rows, "bucket string")
    got = rate_changepoint(df, "bucket").collect()[0]
    assert got["n_buckets"] == 40 and got["n_events"] == 400
    assert got["cp_bucket"] == "b019"  # last steady bucket = the break
    # python model
    xs = [5] * 20 + [15] * 20
    n, t_ = sum(xs), len(xs)
    pre = 0
    best = (-1, None)
    for t, x in enumerate(xs, 1):
        pre += x
        dev = abs(t_ * pre - t * n)
        if dev > best[0]:
            best = (dev, t)
    assert got["max_dev"] == best[0]
    assert got["cusum_ppm"] == (1_000_000 * best[0]) // (t_ * n)


def test_changepoint_steady_rate_is_flat(spark):
    rows = [(f"b{t:02d}",) for t in range(10) for _ in range(7)]
    df = spark.createDataFrame(rows, "bucket string")
    got = rate_changepoint(df, "bucket").collect()[0]
    assert got["max_dev"] == 0 and got["cusum_ppm"] == 0
    assert got["cp_bucket"] == "b00"  # tie -> earliest


# ---------------------------------------------------------------- k-anonymity


def test_k_anonymity_planted_classes(spark):
    # class A: 6 rows, 3 sensitive values (passes k=5, l=3)
    # class B: 3 rows, 3 values (violates k only)
    # class C: 8 rows, 1 value  (violates l only; share = 1.0)
    from real_estate_project1_etl_spark.operators.audit import (
        k_anonymity_audit,
    )

    rows = (
        [("A", f"s{i % 3}") for i in range(6)]
        + [("B", f"s{i}") for i in range(3)]
        + [("C", "s0") for _ in range(8)]
    )
    df = spark.createDataFrame(rows, "qi string, sv string")
    got = {
        r.qi: r for r in k_anonymity_audit(df, ["qi"], "sv").collect()
    }
    a, b, c = got["A"], got["B"], got["C"]
    assert (a.class_n, a.l_div, a.violates_k, a.violates_l) == (
        6, 3, False, False
    )
    assert a.max_sensitive_share_ppm == 1000000 * 2 // 6
    assert (b.class_n, b.l_div, b.violates_k, b.violates_l) == (
        3, 3, True, False
    )
    assert (c.class_n, c.l_div, c.violates_k, c.violates_l) == (
        8, 1, False, True
    )
    assert c.max_sensitive_share_ppm == 1000000


def test_k_anonymity_null_sensitive_is_a_bucket(spark):
    # all-NULL sensitive -> homogeneous (l_div == 1), not diverse
    from real_estate_project1_etl_spark.operators.audit import (
        k_anonymity_audit,
    )

    df = spark.createDataFrame(
        [("A", None), ("A", None), ("A", "x")], "qi string, sv string"
    )
    r = k_anonymity_audit(df, ["qi"], "sv").collect()[0]
    assert (r.class_n, r.l_div) == (3, 2)
    assert r.max_sensitive_share_ppm == 1000000 * 2 // 3
