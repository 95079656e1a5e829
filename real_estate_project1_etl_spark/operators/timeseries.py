"""Time-series operators over the event stream — gap-filled resampling
with forward fill, and Markov transition mining.

The reference pipeline is batch-file ETL (dag.py:30-43); an analytics
engine over event data additionally needs the time-series primitives
BI tools expect: regular-grid resampling (missing buckets materialized,
carried-forward values) and behavioral transition counts. Both are
expressed as declarative DataFrame plans — the spine generation is
``sequence`` + ``explode`` (JVM, scan-stage), never a driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hourly_gap_fill_ffill(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Resample each key's events to an hourly grid spanning its own
    [min, max] hour, materializing empty buckets, and forward-fill the
    per-hour aggregate into the gaps.

    Returns ``(user_id, hour, filled_value, is_observed)`` — one row per
    key per hour in range; ``filled_value`` is the exact-decimal hourly
    sum (cast double at the boundary) carried forward, NULL before the
    first observed bucket.

    Scale shape: the spine is ``sequence(min_hour, max_hour, 1 hour)``
    exploded per key — generated distributed, proportional to output
    size, no driver loop and no cross join against a global calendar
    table (each key only materializes its own range). The forward fill
    is one window per key ordered by hour (``last(ignorenulls)`` over an
    unbounded-preceding frame) — a single shuffle on the key, which
    AQE-coalesces; keys are independent so skew is bounded by one key's
    hour span, not the corpus.
    """
    hour = F.date_trunc("hour", F.col(ts_col))
    hourly = (
        events.select(F.col(key_col), hour.alias("hour"), F.col(value_col))
        .groupBy(key_col, "hour")
        .agg(
            F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double").alias("hour_value")
        )
    )
    spans = hourly.groupBy(key_col).agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    spine = spans.select(
        key_col,
        F.explode(
            F.sequence("h0", "h1", F.expr("interval 1 hour"))
        ).alias("hour"),
    )
    grid = spine.join(hourly, [key_col, "hour"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.select(
        key_col,
        F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.last("hour_value", ignorenulls=True).over(w).alias("filled_value"),
        F.col("hour_value").isNotNull().alias("is_observed"),
    )


def event_transitions(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition counts: for each user's event
    stream in time order, count (previous event_type -> event_type)
    pairs across the corpus.

    ``(from_type, to_type, n_transitions)`` — the behavioral transition
    matrix in sparse form. The per-user ordering tie-breaks on the
    unique ``event_id`` so the sequence (hence the counts) is a total
    order — deterministic under any partitioning.

    Scale shape: one shuffle on the key for the ``lag`` window (each
    user's stream is processed within its partition), then a
    Zipf-collapsed count agg on the (from, to) pair — at most
    |event_types|^2 groups, so the final agg is map-side collapsed.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    return (
        events.withColumn("from_type", F.lag(type_col).over(w))
        .filter(F.col("from_type").isNotNull())
        .groupBy(F.col("from_type"), F.col(type_col).alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


def time_decayed_sum(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    half_life_days: int = 7,
) -> DataFrame:
    """Exponential time-decay score per key — the recency-weighted value
    recsys/engagement rankers use:

        score(k) = sum_i value_i * 0.5 ^ floor(age_days_i / half_life)

    with age measured back from the dataset's max timestamp (data-derived,
    so results are reproducible; the anchor arrives via a broadcast
    single-row aggregate, not a driver collect).

    Exactness: the decay uses the INTEGER number of elapsed half-lives,
    so every weight is a dyadic rational (2^-k, exact in a double), the
    2-dp values become integer cents, and every product/partial sum is an
    exact multiple of 2^-k well under 2^53 — addition is exact in ANY
    order, making the double aggregation bit-identical across engines and
    partitionings (a continuous `exp(-dt/tau)` would not be: transcendental
    evaluation and float summation order both diverge cross-engine).

    Returns ``(user_id, decayed_cents, n_events)``; one scan, one agg
    shuffle on the key.
    """
    anchor = events.agg(F.max(ts_col).alias("_anchor"))
    return (
        events.crossJoin(F.broadcast(anchor))
        .select(
            F.col(key_col),
            (
                F.expr(f"cast(cast({value_col} as decimal(18,2)) * 100 as bigint)")
                * F.pow(
                    F.lit(0.5),
                    # integer div, not floor(float/7): stays in bigint end
                    # to end, no float-division corner anywhere
                    F.expr(
                        f"datediff(cast(_anchor as date), cast({ts_col} as date))"
                        f" div {half_life_days}"
                    ),
                )
            ).alias("w"),
        )
        .groupBy(key_col)
        .agg(
            F.sum("w").alias("decayed_cents"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def interval_concurrency(
    intervals: DataFrame,
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Sweep-line interval concurrency: for every boundary day, how many
    [start, end] intervals (inclusive, day granularity) are open.

    The naive formulation explodes each interval into one row per covered
    day — O(n * avg_days) rows BEFORE any reduction, a scale killer for
    long intervals. The sweep-line form emits exactly two delta events
    per interval (+1 at start, -1 the day after end), aggregates them to
    one net-change row per distinct boundary day (partial map-side
    combine, one exchange on the day), then takes a running sum over the
    day order. That cumulative window is a SinglePartition exchange — but
    over the *aggregated* day spine (thousands of rows however large the
    input), not the fact table; at extreme spine sizes use the two-phase
    range-partitioned prefix-sum of util.assign_global_ids.

    Output: (day 'yyyy-MM-dd' string, net_change, open_count), one row
    per boundary day.
    """
    s = F.to_date(F.col(start_col))
    e = F.to_date(F.col(end_col))
    deltas = intervals.select(s.alias("d"), F.lit(1).alias("delta")).unionAll(
        intervals.select(F.date_add(e, 1).alias("d"), F.lit(-1).alias("delta"))
    )
    daily = deltas.groupBy("d").agg(F.sum("delta").cast("long").alias("net_change"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return daily.withColumn(
        "open_count", F.sum("net_change").over(w).cast("long")
    ).select(
        F.date_format("d", "yyyy-MM-dd").alias("day"), "net_change", "open_count"
    )


def rate_changepoint(
    df: DataFrame,
    bucket_col: str,
) -> DataFrame:
    """CUSUM change-point over a pre-bucketed event stream (Page 1954,
    Biometrika 41: cumulative-sum drift detection — the standard monitor
    for "did the arrival rate shift, and when"): one row ``(n_buckets,
    n_events, cp_bucket, max_dev, cusum_ppm)``.

    Statistic, exact integers end to end: with per-bucket counts
    ``x_1..x_T`` in bucket order and total ``N``, the mean-centered
    cumulative sum scaled by ``T`` is ``D_t = T * prefix_t - t * N``
    (integer — no rational mean ever materializes). The change point is
    ``argmax_t |D_t|`` with ties to the EARLIEST bucket, ``max_dev =
    max |D_t|``, and ``cusum_ppm = (1e6 * max|D_t|) div (T * N)`` — the
    normalized deviation in [0, ~250000]; ~0 = steady rate, large =
    a pronounced rate break at ``cp_bucket``.

    Scale shape: one aggregation collapses events to the bucket-count
    table (model-sized — hours/days, not events); the prefix window,
    the argmax, and the scalars all run on that table. decimal(38,0)
    intermediates: ``T * prefix`` crosses int64 only past ~3e9 buckets
    x events — HUGEINT mirror.
    """
    from pyspark.sql import Window

    c = df.groupBy(F.col(bucket_col).alias("bucket")).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_x")
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.orderBy("bucket")
    pre = c.select(
        "bucket",
        F.sum("_x").over(w).alias("_pre"),
        F.row_number().over(wt).cast("decimal(38,0)").alias("_t"),
    )
    tot = c.agg(
        F.sum("_x").alias("_n"),
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_tt"),
    )
    d = pre.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "_n",
        "_tt",
        "_t",
        F.expr("abs(_tt * _pre - _t * _n)").alias("_dev"),
    )
    return (
        d.orderBy(F.col("_dev").desc(), "bucket")
        .limit(1)
        .select(
            F.expr("cast(_tt as bigint)").alias("n_buckets"),
            F.expr("cast(_n as bigint)").alias("n_events"),
            F.col("bucket").alias("cp_bucket"),
            F.expr("cast(_dev as bigint)").alias("max_dev"),
            F.expr(
                "cast(case when _n > 0 then (1000000 * _dev) div (_tt * _n)"
                " else 0 end as bigint)"
            ).alias("cusum_ppm"),
        )
    )


def km_life_table(
    subjects: DataFrame,
    duration_col: str = "t_days",
    event_col: str = "d",
) -> DataFrame:
    """Kaplan-Meier life table (Kaplan & Meier 1958) from per-subject
    ``(duration, event)`` rows — ``event`` 1 for an observed event
    (churn/death), 0 for right-censoring at that duration.

    Returns one row per distinct duration ``t``: ``(t, n_risk,
    d_events, censored, hazard_ppm)`` with ``n_risk`` = subjects whose
    duration is >= t (the at-risk set just before t) and
    ``hazard_ppm = floor(1e6 * d_events / n_risk)`` — the discrete
    hazard, exact integer arithmetic throughout. The survival CURVE is
    the running product of ``(1 - hazard)``; it is left to consumers
    because an exact cross-engine product needs unbounded rationals —
    the life table is the sufficient statistic and every cell is on
    the ledger.

    Scale shape: one aggregation of the subject table to distinct
    durations (bounded by the observation window in days), then a
    prefix-sum window over that bounded table (single-partition by
    construction, the standing convention) for the at-risk counts. The
    subject table itself never sorts.
    """
    g = subjects.groupBy(F.col(duration_col).alias("t")).agg(
        F.count(F.lit(1)).alias("n_t"),
        F.sum(F.col(event_col).cast("bigint")).alias("d_events"),
    )
    w = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = g.agg(F.sum("n_t").alias("n_total"))
    cum = g.crossJoin(F.broadcast(tot)).select(
        "t",
        "n_t",
        "d_events",
        (
            F.col("n_total")
            - F.sum("n_t").over(w)
            + F.col("n_t")
        ).alias("n_risk"),
    )
    return cum.select(
        "t",
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("d_events").cast("bigint").alias("d_events"),
        (F.col("n_t") - F.col("d_events"))
        .cast("bigint")
        .alias("censored"),
        F.expr("(1000000 * d_events) div n_risk")
        .cast("bigint")
        .alias("hazard_ppm"),
    )
