"""HyperLogLog with engine-portable registers (operators/sketch.py).

The contract under test: registers are explicit (bucket, rho) rows over
the md5_60 hash — reproducible from hashlib in pure python — the
harmonic denominator is an exact bigint, and register tables merge
across shards by max(rho) with NO loss (merged == from-scratch,
bit-for-bit, estimate included).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from real_estate_project1_etl_spark.operators.sketch import (
    hll_estimate,
    hll_registers,
)

_P = 6
_M = 1 << _P
_WBITS = 60 - _P
_ALPHA = 0.709


def _h60(v: str) -> int:
    return int(hashlib.md5(v.encode()).hexdigest()[:15], 16)


def _py_hll(values):
    reg = {}
    for v in values:
        h = _h60(v)
        bucket, w = h % _M, h // _M
        rho = _WBITS + 1 if w == 0 else _WBITS + 1 - w.bit_length()
        reg[bucket] = max(reg.get(bucket, 0), rho)
    s = sum(1 << (_WBITS + 1 - r) for r in reg.values())
    s += (_M - len(reg)) * (1 << (_WBITS + 1))
    est = _ALPHA * float(_M * _M) * float(1 << (_WBITS + 1)) / float(s)
    return reg, s, est


def test_hll_python_model_parity(spark):
    # registers, exact denominator and the double estimate all agree
    # with the from-first-principles python model
    values = [f"user-{i}" for i in range(700)] * 3  # duplicates absorbed
    df = spark.createDataFrame(
        [("g", v) for v in values], "g string, v string"
    )
    reg = hll_registers(df, ["g"], "v", p=_P)
    got_reg = {
        (r.bucket, r.rho) for r in reg.collect()
    }
    want_reg, want_sum, want_est = _py_hll(values)
    assert got_reg == set(want_reg.items())
    row = hll_estimate(reg, ["g"], p=_P).collect()[0]
    assert row.reg_sum_2p == want_sum
    assert row.v_zero == _M - len(want_reg)
    assert row.hll_estimate == want_est


def test_hll_estimate_within_error_bound(spark):
    # RSE ~ 1.04/sqrt(64) ~ 13%; fixed hash makes this deterministic,
    # the 4-sigma bound just keeps it robust to parameter changes
    df = spark.createDataFrame(
        [("g", f"value-{i}") for i in range(5000)], "g string, v string"
    )
    reg = hll_registers(df, ["g"], "v", p=_P)
    row = hll_estimate(reg, ["g"], p=_P).collect()[0]
    assert abs(row.hll_estimate - 5000) / 5000 < 0.55


def test_hll_sharded_merge_equals_from_scratch(spark):
    # the mergeability claim as a property: per-day register tables
    # merged by max(rho) == the whole-table registers, estimate included
    rows = [(f"d{i % 7}", f"u{i % 900}") for i in range(5000)]
    df = spark.createDataFrame(rows, "day string, v string")
    daily = hll_registers(df, ["day"], "v", p=_P)
    merged = daily.groupBy("bucket").agg(F.max("rho").alias("rho"))
    direct = hll_registers(df.select(F.lit("all").alias("g"), "v"), ["g"], "v", p=_P)
    got = {(r.bucket, r.rho) for r in merged.collect()}
    want = {(r.bucket, r.rho) for r in direct.collect()}
    assert got == want
    m_est = hll_estimate(
        merged.withColumn("g", F.lit("all")), ["g"], p=_P
    ).collect()[0]
    d_est = hll_estimate(direct, ["g"], p=_P).collect()[0]
    assert (m_est.v_zero, m_est.reg_sum_2p, m_est.hll_estimate) == (
        d_est.v_zero, d_est.reg_sum_2p, d_est.hll_estimate
    )


def test_hll_partition_independence(spark):
    rows = [("g", f"v{i}") for i in range(2000)]
    a = spark.createDataFrame(rows, "g string, v string").repartition(1)
    b = spark.createDataFrame(rows, "g string, v string").repartition(16, "v")
    ra = hll_estimate(hll_registers(a, ["g"], "v"), ["g"]).collect()[0]
    rb = hll_estimate(hll_registers(b, ["g"], "v"), ["g"]).collect()[0]
    assert (ra.v_zero, ra.reg_sum_2p, ra.hll_estimate) == (
        rb.v_zero, rb.reg_sum_2p, rb.hll_estimate
    )
