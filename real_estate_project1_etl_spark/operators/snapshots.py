"""Cross-snapshot corpus maintenance — recrawl deltas.

A periodically-recrawled corpus (CommonCrawl-style) is maintained as
snapshots; the pipeline needs the DELTA between two of them: which
documents appeared, vanished, or changed content — the input to
incremental dedup (only added/changed docs re-enter the signature
tables), freshness dashboards, and retraining triggers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
