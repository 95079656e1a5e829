"""Differential fuzzing of date/time arithmetic: random compositions of
timestamp shifts, truncations, date arithmetic, extracts and formatting
evaluated by BOTH engines on the events table and compared exactly.

Date/time is the classic cross-engine divergence surface (week starts,
month-end clamping, dow numbering, format dialects). The grammar is
restricted to constructs with IDENTICAL semantics once the known
numbering differences are bridged in the SQL template itself
(weekday <-> isodow-1; date_format <-> strftime with paired patterns) —
so a mismatch is a real engine/semantics bug, not a dialect artifact.

Both engines read the same parquet; the Spark session pins UTC and the
loader normalizes the micros-NTZ encoding (sources/parquet.load_table),
so wall-clock values agree by construction — the fuzz covers what the
ARITHMETIC does to them.
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from tools.driver_sim import canon

N_CASES = 40

#: timestamp -> timestamp warps: {x} is a timestamp expression
_TS_WARP = [
    ("trunc_hour", "date_trunc('hour', {x})", "date_trunc('hour', {x})"),
    ("trunc_day", "date_trunc('day', {x})", "date_trunc('day', {x})"),
    ("trunc_week", "date_trunc('week', {x})", "date_trunc('week', {x})"),
    ("trunc_month", "date_trunc('month', {x})", "date_trunc('month', {x})"),
    ("trunc_quarter", "date_trunc('quarter', {x})", "date_trunc('quarter', {x})"),
    ("trunc_year", "date_trunc('year', {x})", "date_trunc('year', {x})"),
    ("add_min", "{x} + interval 90 minutes", "{x} + interval 90 minute"),
    ("sub_hours", "{x} - interval 7 hours", "{x} - interval 7 hour"),
    ("add_days_ts", "{x} + interval 13 days", "{x} + interval 13 day"),
]

#: date -> date warps: {x} is a date expression
_DATE_WARP = [
    ("add_days", "date_add({x}, 45)", "{x} + 45"),
    ("sub_days", "date_sub({x}, 100)", "{x} - 100"),
    # month-end clamping must agree (Jan 31 + 1 month -> Feb 28 both)
    ("add_months", "add_months({x}, 1)", "cast({x} + interval 1 month as date)"),
    ("add_months7", "add_months({x}, 7)", "cast({x} + interval 7 month as date)"),
    ("sub_months", "add_months({x}, -3)", "cast({x} - interval 3 month as date)"),
    ("last_day", "last_day({x})", "last_day({x})"),
    ("trunc_mm", "trunc({x}, 'MM')", "cast(date_trunc('month', {x}) as date)"),
    ("trunc_yy", "trunc({x}, 'YEAR')", "cast(date_trunc('year', {x}) as date)"),
]

#: terminal extracts: timestamp -> int (bridging dow-numbering dialects)
_EXTRACT = [
    ("year", "year({x})", "year({x})"),
    ("month", "month({x})", "month({x})"),
    ("day", "day({x})", "day({x})"),
    ("hour", "hour({x})", "hour({x})"),
    ("minute", "minute({x})", "minute({x})"),
    ("quarter", "quarter({x})", "quarter({x})"),
    ("dayofyear", "dayofyear({x})", "dayofyear({x})"),
    # Spark weekday: 0=Monday; DuckDB isodow: 1=Monday
    ("weekday", "weekday({x})", "isodow({x}) - 1"),
    ("weekofyear", "weekofyear({x})", "weekofyear({x})"),
]

#: terminal formats: fixed pattern pairs (dialects bridged per pair)
_FORMAT = [
    ("ym", "date_format({x}, 'yyyy-MM')", "strftime({x}, '%Y-%m')"),
    ("ymd", "date_format({x}, 'yyyy-MM-dd')", "strftime({x}, '%Y-%m-%d')"),
    ("hm", "date_format({x}, 'HH:mm')", "strftime({x}, '%H:%M')"),
    (
        "iso",
        "date_format({x}, 'yyyy-MM-dd HH:mm:ss')",
        "strftime({x}, '%Y-%m-%d %H:%M:%S')",
    ),
]


def _gen_expr(seed: int):
    """Return (spark_expr, duckdb_expr) producing a comparable scalar."""
    rng = random.Random(seed)
    s = q = "ts"
    for _ in range(rng.randint(0, 2)):
        _, st, qt = rng.choice(_TS_WARP)
        s, q = st.format(x=s), qt.format(x=q)
    family = rng.choice(["extract", "format", "datechain", "datediff"])
    if family == "extract":
        _, st, qt = rng.choice(_EXTRACT)
        return st.format(x=s), qt.format(x=q)
    if family == "format":
        _, st, qt = rng.choice(_FORMAT)
        return st.format(x=s), qt.format(x=q)
    # work in date space
    sd, qd = f"cast({s} as date)", f"cast({q} as date)"
    for _ in range(rng.randint(1, 3)):
        _, st, qt = rng.choice(_DATE_WARP)
        sd, qd = st.format(x=sd), qt.format(x=qd)
    if family == "datediff":
        # days between the warped date and the plain date — pure int
        return (
            f"datediff({sd}, cast(ts as date))",
            f"date_diff('day', cast(ts as date), {qd})",
        )
    return f"cast({sd} as string)", f"cast({qd} as string)"


@pytest.fixture(scope="module")
def duck_events(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    yield con
    con.close()


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    from real_estate_project1_etl_spark.sources.parquet import load_table

    return load_table(spark, sf_dir, "events")


@pytest.mark.parametrize("seed", range(N_CASES))
def test_fuzz_datetime_matches_duckdb(seed, spark, duck_events, events):
    spark_e, sql_e = _gen_expr(seed)
    s = canon(events.select("event_id", F.expr(spark_e).alias("v")).toPandas())
    o = canon(
        duck_events.execute(f"SELECT event_id, {sql_e} AS v FROM events").df()
    )
    assert s == o, f"seed {seed}: {spark_e} vs {sql_e}"
