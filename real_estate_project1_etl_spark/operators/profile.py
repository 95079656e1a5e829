"""Single-pass table profiling — the data-quality summary every ingest
pipeline runs before trusting a new drop (the reference eyeballs dtypes
by hand, transform.py:20-28; an engine does it as a query).

One aggregation computes every column's null count, exact distinct
count, and min/max in a single scan; the per-column rows are then
unpivoted from the one aggregate row with ``stack`` (a zero-shuffle
projection). min/max are rendered to strings with type-pinned
formatting (bigint/string verbatim, doubles through an exact
decimal(18,2) cast, timestamps through a fixed format) so the profile
is bit-identical cross-engine — never raw double stringification, whose
scientific-notation thresholds differ between runtimes.

Scale note: exact ``count(distinct)`` per column expands the aggregate
buffer per distinct column (Spark plans an Expand + two-stage agg);
at 100 TB swap ``exact=False`` in, which uses ``approx_count_distinct``
(HLL++, mergeable, one pass, ~2% error) — same output schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: column kind -> (min/max rendering template)
_RENDER = {
    "int": "cast({agg} as string)",
    "string": "{agg}",
    "money": "cast(cast({agg} as decimal(18,2)) as string)",
    "ts": "date_format({agg}, 'yyyy-MM-dd HH:mm:ss')",
}


def profile_columns(
    df: DataFrame, spec: dict[str, str], exact: bool = True
) -> DataFrame:
    """Profile the columns named in ``spec`` (column -> kind, one of
    ``int | string | money | ts``). Returns one row per column:
    ``(column, n_rows, n_nulls, n_distinct, min_value, max_value)``.
    """
    aggs: list = [F.count(F.lit(1)).alias("_rows")]
    for c, kind in spec.items():
        tmpl = _RENDER[kind]
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_nn_{c}")
        )
        if exact:
            aggs.append(F.count_distinct(F.col(c)).alias(f"_nd_{c}"))
        else:
            aggs.append(F.approx_count_distinct(c).alias(f"_nd_{c}"))
        aggs.append(F.expr(tmpl.format(agg=f"min({c})")).alias(f"_mn_{c}"))
        aggs.append(F.expr(tmpl.format(agg=f"max({c})")).alias(f"_mx_{c}"))
    one = df.agg(*aggs)

    stack_args = ", ".join(
        f"'{c}', _nn_{c}, _nd_{c}, _mn_{c}, _mx_{c}" for c in spec
    )
    return one.select(
        F.expr(
            f"stack({len(spec)}, {stack_args})"
            " as (column, n_nulls, n_distinct, min_value, max_value)"
        ),
        F.col("_rows").alias("n_rows"),
    ).select("column", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")


#: Benford's law first-digit probabilities, ppm (log10(1 + 1/d) * 1e6,
#: rounded; the nine constants sum to exactly 1,000,000)
BENFORD_PPM = {
    1: 301030,
    2: 176091,
    3: 124939,
    4: 96910,
    5: 79181,
    6: 66947,
    7: 57992,
    8: 51153,
    9: 45757,
}


def benford_first_digit_audit(
    df: DataFrame, value_col: str
) -> DataFrame:
    """First-significant-digit distribution of a positive integer
    measure vs Benford's law — the forensic screen for fabricated or
    clipped numeric columns (Benford 1938; Nigrini's fraud-audit
    practice): naturally-occurring multiplicative data follows
    ``P(d) = log10(1 + 1/d)``; data that was capped, binned, defaulted
    or invented does not.

    The first digit is the head of the decimal string rendering of the
    bigint (no float ``log``/``pow`` anywhere — their rounding is
    engine-specific), the expectation constants are fixed ppm integers
    summing to exactly 1e6, and the comparison is one truncating
    division per digit — bit-identical cross-engine. Rows with
    ``value_col < 1`` are excluded (no first significant digit).

    Returns 9 rows: ``(digit, n_obs, obs_ppm, benford_ppm,
    delta_ppm)`` with ``delta_ppm = obs_ppm - benford_ppm`` (signed);
    digits with zero observations still appear (n_obs = 0).

    Scale shape: one scan + one 9-cell aggregation; the digit
    extraction is a scan-stage expression.
    """
    v = F.col(value_col).cast("bigint")
    digit = F.substring(v.cast("string"), 1, 1).cast("int")
    base = df.filter(v >= 1).select(digit.alias("digit"))
    counts = base.groupBy("digit").agg(F.count(F.lit(1)).alias("n_obs"))
    spark = df.sparkSession
    dims = spark.createDataFrame(
        [(d, p) for d, p in BENFORD_PPM.items()],
        "digit int, benford_ppm bigint",
    )
    tot = base.agg(F.count(F.lit(1)).alias("_n"))
    return (
        dims.join(counts, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce(F.col("n_obs"), F.lit(0))
            .cast("bigint")
            .alias("n_obs"),
            F.when(
                F.col("_n") > 0,
                F.expr("(1000000 * coalesce(n_obs, 0)) div _n"),
            )
            .cast("bigint")
            .alias("obs_ppm"),
            "benford_ppm",
            F.when(
                F.col("_n") > 0,
                F.expr(
                    "(1000000 * coalesce(n_obs, 0)) div _n - benford_ppm"
                ),
            )
            .cast("bigint")
            .alias("delta_ppm"),
        )
    )


def concentration_audit(
    df: DataFrame, group_col: str
) -> DataFrame:
    """Concentration report of a categorical column — the data-mixing
    governance audit a pretraining pipeline runs on ``source``/domain
    before deciding caps (the domain_capped_corpus / unimax family's
    diagnostic twin): one row ``(n_rows, n_groups, top_share_ppm,
    hhi_ppm, gini_ppm)``.

    - ``top_share_ppm``: largest group's share;
    - ``hhi_ppm``: Herfindahl–Hirschman index ``sum(share^2)`` (the
      antitrust concentration standard) — 1e6/n_groups = uniform,
      1e6 = single source;
    - ``gini_ppm``: Gini coefficient via the rank form ``(2*sum(r*c_r)
      - (m+1)*N) / (m*N)`` over counts sorted ascending (Gini 1912;
      tie-order invariant: equal counts contribute the same sum under
      any rank assignment, so the statistic is deterministic without a
      tiebreak contract).

    All three are truncating integer ppm with decimal(38,0)
    intermediates (``sum(c^2)`` crosses int64 near 3e9 rows in one
    group; HUGEINT mirror). NULL group values form their own group —
    an audit that silently dropped NULL sources would under-report
    concentration.

    Scale shape: one aggregation to the group-count table (model-sized
    — sources/domains, not rows), then rank + three scalars on it; the
    rank window is over the model-sized table only.
    """
    from pyspark.sql import Window

    c = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_c")
    )
    w = Window.orderBy("_c", "_g")
    r = c.select(
        "_c", F.row_number().over(w).cast("decimal(38,0)").alias("_r")
    )
    return r.agg(
        F.sum("_c").alias("_n"),
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_m"),
        F.max("_c").alias("_top"),
        F.sum(F.col("_c") * F.col("_c")).alias("_sq"),
        F.sum(F.col("_r") * F.col("_c")).alias("_rc"),
    ).select(
        F.expr("cast(_n as bigint)").alias("n_rows"),
        F.expr("cast(_m as bigint)").alias("n_groups"),
        F.expr("cast((1000000 * _top) div _n as bigint)").alias(
            "top_share_ppm"
        ),
        F.expr("cast((1000000 * _sq) div (_n * _n) as bigint)").alias(
            "hhi_ppm"
        ),
        F.expr(
            "cast(case when _m > 1 then"
            " (1000000 * (2 * _rc - (_m + 1) * _n)) div (_m * _n)"
            " else 0 end as bigint)"
        ).alias("gini_ppm"),
    )
