"""Cross-snapshot corpus maintenance — recrawl deltas.

A periodically-recrawled corpus (CommonCrawl-style) is maintained as
snapshots; the pipeline needs the DELTA between two of them: which
documents appeared, vanished, or changed content — the input to
incremental dedup (only added/changed docs re-enter the signature
tables), freshness dashboards, and retraining triggers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Document-level diff between two corpus snapshots.

    Returns ``(id_col, status, old_md5, new_md5)`` with status one of
    ``added`` / ``removed`` / ``changed`` / ``unchanged``. Content
    identity is md5 of the text (cross-engine, and the same digest the
    exact-dedup family uses) — NULL text hashes to NULL and two NULLs
    compare as unchanged (null-safe equality), so a doc whose text was
    nulled out in the recrawl reports ``changed``, not ``unchanged``.

    Scale shape: each side collapses to ``(id, md5)`` in its scan stage
    (the text itself never shuffles), then ONE full-outer equi-join on
    the id. On 100 TB snapshots stored bucketed by ``id_col`` the join
    is exchange-free; otherwise it is one shuffle of two digest tables.
    Downstream consumers filter ``status != 'unchanged'`` — predicate
    pushdown keeps the delta cheap to persist.
    """
    # presence flags are join-side MARKERS, not digest nullability — a
    # NULL text on a present side would otherwise read as absence
    o = old.select(
        F.col(id_col).alias("_id"),
        F.md5(text_col).alias("old_md5"),
        F.lit(True).alias("_in_old"),
    )
    nw = new.select(
        F.col(id_col).alias("_id"),
        F.md5(text_col).alias("new_md5"),
        F.lit(True).alias("_in_new"),
    )
    j = o.join(nw, "_id", "full_outer")
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(
            F.col("old_md5").eqNullSafe(F.col("new_md5")), F.lit("unchanged")
        )
        .otherwise(F.lit("changed"))
    )
    return j.select(
        F.col("_id").alias(id_col), status.alias("status"),
        "old_md5", "new_md5",
    )


def scd2_history(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    order_tiebreak: str,
) -> DataFrame:
    """Build a slowly-changing-dimension TYPE 2 history from an
    event-sourced attribute stream (Kimball's SCD2 — the warehouse
    pattern the reference's append-only load never reaches, reference:
    load_db.py:35-46): consecutive observations of the same
    ``attr_col`` per key collapse into one VERSIONED validity interval.

    Returns ``(key, version, attr, valid_from, valid_to, n_events,
    is_current)`` — ``valid_from`` = first observation of the run,
    ``valid_to`` = start of the NEXT run (half-open intervals, so a
    key's history tiles time with no gaps or overlaps), NULL on the
    current version; ``version`` numbers runs 1..V per key.

    Determinism: rows are ordered by ``(ts, order_tiebreak)`` — the
    tiebreak (a unique id) makes run boundaries well-defined when one
    timestamp carries several events.

    Scale shape: one shuffle on the key (every window — change
    detection, run numbering, the valid_to lead — partitions by
    ``key_col``, so Catalyst plans a single exchange reused by all
    three), then a (key, run) re-agg of already-co-located rows. No
    join, no self-join — the lead() replaces the classic
    "join next version" formulation, which would shuffle twice.
    """
    wo = Window.partitionBy(key_col).orderBy(ts_col, order_tiebreak)
    # row 1 opens a run unconditionally — the eqNullSafe form alone
    # would miscount when the FIRST observed attr is itself NULL
    changed = F.when(F.row_number().over(wo) == 1, 1).otherwise(
        (~F.col(attr_col).eqNullSafe(F.lag(attr_col).over(wo))).cast(
            "int"
        )
    )
    runs = df.select(
        key_col, attr_col, ts_col, order_tiebreak
    ).withColumn(
        "version",
        F.sum(changed).over(
            wo.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    per_run = runs.groupBy(key_col, "version").agg(
        F.min(ts_col).alias("valid_from"),
        F.max(F.col(attr_col)).alias("attr"),  # constant within a run
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    wv = Window.partitionBy(key_col).orderBy("version")
    return per_run.select(
        key_col,
        F.col("version").cast("bigint").alias("version"),
        "attr",
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        "n_events",
        F.lead("valid_from").over(wv).isNull().alias("is_current"),
    )
