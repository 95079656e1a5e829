"""Benford first-digit audit: python-model parity, the exactly-1e6
constants invariant, planted conforming vs fabricated data, and the
<1 exclusion."""

from __future__ import annotations

from real_estate_project1_etl_spark.operators.profile import (
    BENFORD_PPM,
    benford_first_digit_audit,
)


def test_benford_constants_sum_exactly_to_one_million():
    assert sum(BENFORD_PPM.values()) == 1_000_000
    assert sorted(BENFORD_PPM) == list(range(1, 10))


def _audit(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "v bigint")
    return {
        r["digit"]: (r["n_obs"], r["obs_ppm"], r["delta_ppm"])
        for r in benford_first_digit_audit(df, "v").collect()
    }


def test_benford_matches_python_model_and_excludes_sub_one(spark):
    vals = [1, 19, 23, 250, 999, 4, 41, 0, -7, 812, 77, 1000, 65536]
    got = _audit(spark, vals)
    pos = [v for v in vals if v >= 1]
    n = len(pos)
    counts = {d: 0 for d in range(1, 10)}
    for v in pos:
        counts[int(str(v)[0])] += 1
    for d in range(1, 10):
        obs = (1_000_000 * counts[d]) // n
        assert got[d] == (counts[d], obs, obs - BENFORD_PPM[d]), d
    assert len(got) == 9  # zero-count digits still present


def test_benford_separates_natural_from_fabricated(spark):
    # multiplicative (log-uniform) data conforms; constant-leading-digit
    # data does not — the audit's reason to exist
    natural = [int(10 ** (3 + (i * 97 % 1000) / 1000.0)) for i in range(2000)]
    fabricated = [5_000 + i for i in range(1000)]  # all lead with 5
    nat = _audit(spark, natural)
    fab = _audit(spark, fabricated)
    nat_dev = max(abs(nat[d][2]) for d in range(1, 10))
    assert nat_dev < 40_000, nat_dev  # within 4% of Benford everywhere
    assert fab[5][1] > 900_000  # fabricated mass piles on one digit
    assert abs(fab[1][2] - (0 - BENFORD_PPM[1])) < 110_000
