"""Event-time streaming operators over the ``events`` stream (north-star
§2 "streaming-only semantics" — absent in the reference, which knows only
wall-clock daily batches, dag.py:28).

All three accept a *streaming or batch* DataFrame with (ts, user_id,
event_type, value) — the logical plan is identical; only the sink differs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_event_counts(
    events: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Tumbling 1-hour windows with late-data watermark. State for a window
    is dropped once the watermark passes its end — bounded memory on an
    unbounded stream."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_event_rate(
    events: DataFrame,
    window: str = "15 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Sliding-window event rate (each event lands in window/slide panes)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def sessionized_events(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Session windows keyed by user — the streaming twin of the batch
    ``event_sessionization`` query (gap-based, state closes when the
    watermark passes last_event + gap)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def stateful_dedup(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming dedup with bounded state: a key's fingerprint is kept only
    within the watermark horizon (``dropDuplicatesWithinWatermark``), so
    state can't grow without bound — the streaming analogue of D1
    (transform.py:62)."""
    keys = keys or ["user_id", "event_type"]
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def enrich_with_dim(
    events: DataFrame,
    dim: DataFrame,
    left_key: str = "user_id",
    right_key: str = "c_custkey",
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against the
    (batch) dimension with a broadcast hash join — no streaming state at
    all, and the dim is re-resolved per micro-batch so slowly-changing
    dims pick up updates. The streaming analogue of the reference's
    region-whitelist semi-join (transform.py:92), upgraded to attach
    attributes instead of merely filtering."""
    return events.join(F.broadcast(dim), F.col(left_key) == F.col(right_key), "inner")


def click_purchase_attribution(
    events: DataFrame, horizon: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream interval join: attribute each purchase to the clicks
    of the same user in the preceding ``horizon``. Both sides carry a
    watermark and the join condition time-bounds the buffered state, so
    Spark can evict matched/expired rows — the canonical bounded-state
    stream-stream join. Works identically on a batch DataFrame (the batch
    twin is the ``click_purchase_attribution`` oracle query)."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("click_ts", watermark)
        purchases = purchases.withWatermark("purchase_ts", watermark)
    return clicks.join(
        purchases,
        (F.col("c_user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}")),
    ).select(
        F.col("c_user_id").alias("user_id"),
        "click_id",
        "purchase_id",
        (F.unix_millis(F.col("purchase_ts")) - F.unix_millis(F.col("click_ts")))
        .alias("gap_ms"),
    )


def click_purchase_attribution_outer(
    events: DataFrame, horizon: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every click row is
    emitted — matched clicks once per in-``horizon`` purchase, and
    unmatched clicks with a NULL purchase once the watermark passes
    ``click_ts + horizon`` (state eviction IS the null-emission
    trigger; Spark cannot declare a click unmatched until no
    qualifying purchase can still arrive). The advanced stream-stream
    semantic beyond the inner join: correct null results require the
    engine to reason about watermark + join-condition bounds together.

    Caveat inherent to the semantics: clicks whose deadline is never
    passed by the final watermark (the tail of a finite stream) stay in
    state and emit nothing — the stream-vs-batch test asserts emitted
    null rows are exactly the batch-unmatched clicks old enough to have
    been evicted. On a batch DataFrame this is a plain left join (the
    ``click_attribution_outer`` oracle query).
    """
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("click_ts", watermark)
        purchases = purchases.withWatermark("purchase_ts", watermark)
    return clicks.join(
        purchases,
        (F.col("c_user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}")),
        "leftOuter",
    ).select(
        F.col("c_user_id").alias("user_id"),
        "click_id",
        "purchase_id",
        (F.unix_millis(F.col("purchase_ts")) - F.unix_millis(F.col("click_ts")))
        .alias("gap_ms"),
    )
