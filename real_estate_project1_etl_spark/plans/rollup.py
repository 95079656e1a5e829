"""Materialized rollup (summary) tables + a derivability router — the
aggregation-pushdown layer every 100 TB warehouse grows: pay the full-table
aggregation ONCE at the finest useful grain, then serve every coarser-grain
aggregate query by re-aggregating the tiny summary instead of rescanning
the corpus (Kimball aggregate tables / Druid rollup / BigQuery MV shape).

Correct re-aggregation needs algebraic aggregates only:

  sum   -> sum of partial sums          count -> sum of partial counts
  min   -> min of partial mins          max   -> max of partial maxs
  avg   -> sum of sums / sum of counts  (derived, never averaged-of-avgs)

Non-algebraic aggregates (count_distinct, exact percentiles) are NOT
derivable from a rollup; the router refuses them so callers fall back to
the base table — silently serving a wrong answer is the classic summary-
table bug this module's contract exists to prevent.

Extends the reference's single-grain pandas report (reference:
transform.py:30-58 computes per-listing metrics only) with the
serve-at-any-grain layer.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: aggregate functions a rollup can materialize and re-aggregate
_ALGEBRAIC = ("sum", "count", "min", "max")

_META = "_rollup_meta.json"


def materialize_rollup(
    df: DataFrame,
    path: str,
    group_cols: list[str],
    specs: dict[str, tuple[str, str]],
) -> None:
    """Aggregate ``df`` to the grain of ``group_cols`` and persist it with
    its derivability metadata.  ``specs`` maps output column -> (fn, src)
    with fn in {sum, count, min, max}; a ``rollup_count__`` row-count
    column is always added so avg at any grain derives exactly.

    ``sum`` is materialized over ``decimal(38,6)`` casts: partial sums
    re-aggregate exactly (decimal addition is associative), while double
    sums would make the served answer partitioning-dependent.
    """
    for out, (fn, _src) in specs.items():
        if fn not in _ALGEBRAIC:
            raise ValueError(f"{fn} is not algebraic; cannot materialize {out}")
    df.groupBy(*group_cols).agg(*_partial_aggs(specs)).write.mode(
        "overwrite"
    ).parquet(path)
    with open(os.path.join(path, _META), "w") as fh:
        json.dump({"group_cols": list(group_cols), "specs": dict(specs)}, fh)


def rollup_meta(path: str) -> dict:
    with open(os.path.join(path, _META)) as fh:
        return json.load(fh)


def can_serve(meta: dict, group_cols: list[str], aggs: dict[str, tuple[str, str]]) -> bool:
    """True iff a query grouping by ``group_cols`` computing ``aggs``
    (out -> (fn, src); fn may also be 'avg') derives from this rollup:
    the grain must be a subset of the rollup's, and every aggregate must
    re-aggregate algebraically from a materialized column."""
    if not set(group_cols) <= set(meta["group_cols"]):
        return False
    materialized = [list(v) for v in meta["specs"].values()]
    for fn, src in aggs.values():
        if fn in ("sum", "min", "max", "count"):
            if [fn, src] not in materialized:
                return False
        elif fn == "avg":
            # avg needs BOTH partials: sum(src)/count(src) — dividing by
            # the row count would silently miscount when src has NULLs
            if ["sum", src] not in materialized or ["count", src] not in materialized:
                return False
        else:
            return False  # count_distinct / percentile / ... not derivable
    return True


def _col_for(specs: dict, fn: str, src: str) -> str:
    for out, spec in specs.items():
        if list(spec) == [fn, src]:
            return out
    raise KeyError((fn, src))


def query_rollup(
    spark: SparkSession,
    path: str,
    group_cols: list[str],
    aggs: dict[str, tuple[str, str]],
) -> DataFrame:
    """Serve an aggregate query FROM the rollup at any coarser grain.
    Raises ``ValueError`` when not derivable (callers route to the base
    table instead — see :func:`can_serve`).  Output columns: group cols +
    the keys of ``aggs`` (sum columns come back as the decimal partials'
    exact total; cast at the caller's boundary if doubles are wanted)."""
    meta = rollup_meta(path)
    if not can_serve(meta, group_cols, aggs):
        raise ValueError(
            f"rollup at {path} (grain {meta['group_cols']}) cannot serve "
            f"group by {group_cols} with {aggs}"
        )
    specs = meta["specs"]
    r = spark.read.parquet(path)
    out_aggs = []
    for out, (fn, src) in aggs.items():
        if fn == "sum":
            out_aggs.append(F.sum(_col_for(specs, "sum", src)).alias(out))
        elif fn == "count":
            out_aggs.append(F.sum(_col_for(specs, "count", src)).alias(out))
        elif fn == "min":
            out_aggs.append(F.min(_col_for(specs, "min", src)).alias(out))
        elif fn == "max":
            out_aggs.append(F.max(_col_for(specs, "max", src)).alias(out))
        elif fn == "avg":
            out_aggs.append(
                (
                    F.sum(_col_for(specs, "sum", src))
                    / F.sum(_col_for(specs, "count", src))
                ).alias(out)
            )
    if not group_cols:
        return r.agg(*out_aggs)
    return r.groupBy(*group_cols).agg(*out_aggs)


def _partial_aggs(specs: dict) -> list:
    """The same partial-aggregate list materialize_rollup builds — shared
    by full materialization and incremental update."""
    aggs = [F.count(F.lit(1)).alias("rollup_count__")]
    for out, (fn, src) in specs.items():
        if fn == "sum":
            aggs.append(F.sum(F.col(src).cast("decimal(38,6)")).alias(out))
        elif fn == "count":
            aggs.append(F.count(src).alias(out))
        else:
            aggs.append(getattr(F, fn)(src).alias(out))
    return aggs


def update_rollup(
    batch_df: DataFrame,
    path: str,
    txn: tuple[str, int] | None = None,
    wait_timeout_s: float = 900.0,
) -> None:
    """Fold a NEW batch of base-table rows into an existing rollup without
    touching the base table — the maintenance loop that keeps summary
    tables fresh under continuous ingest.  Work is O(batch + |rollup|):
    the batch aggregates to partials at the rollup's grain, unions with
    the current summary, and re-aggregates by the algebraic merge rules
    (sum/count partials add — decimal, so the fold is exact and
    order-independent; min/max fold by min/max).  Fold-in-any-order
    equals full recompute (tested).

    ``txn=(app_id, batch_id)`` makes the fold EXACTLY-ONCE under
    micro-batch replay: a batch at or below the app's recorded watermark
    is skipped, and the watermark rides in the meta sidecar WRITTEN INTO
    the temp dir before the swap — data and watermark publish atomically,
    so a crash never leaves a folded batch unrecorded (the double-count
    window of a sidecar-after-swap design).

    Crash safety: the merged summary lands in a temp dir and swaps in via
    the sinks' crash-tolerant local-FS swap (old kept until new is in
    place; recovery on next entry).  At cluster scale the same merge
    writes a new versioned-table commit instead.
    """
    import fcntl as _fcntl
    import os as _os
    import time as _time

    # Writer mutual exclusion: the fold is read-merge-swap, so two
    # concurrent folders (the per-app txn watermark invites multiple apps)
    # would silently lose one fold and collide on the tmp dir.  An
    # ``fcntl.flock`` on a PERSISTENT lock file is held for the whole fold
    # (ADVICE round 3): the kernel releases it the instant a holder
    # crashes, so there is no staleness window to misjudge, no mtime to
    # refresh, and — because the file is never unlinked — no
    # steal/double-unlink race between waiters.  Waiters poll
    # non-blockingly up to ``wait_timeout_s`` (default 15 min >= any
    # healthy fold; a parameter, not a constant, so long folds don't crash
    # a streaming foreachBatch caller).  Like the plain-parquet swap sinks
    # this is the LOCAL-FS tier; on an object store the versioned-table
    # commit (sinks/versioned.py) provides the mutual exclusion instead.
    lock = path.rstrip("/") + "._rollup_lock"
    fd = _os.open(lock, _os.O_CREAT | _os.O_RDWR)
    deadline = _time.monotonic() + float(wait_timeout_s)
    try:
        while True:
            try:
                _fcntl.flock(fd, _fcntl.LOCK_EX | _fcntl.LOCK_NB)
                break
            # only lock-held (EAGAIN/EWOULDBLOCK) and interrupt retry; an
            # unsupported-flock filesystem (ENOTSUP on some NFS/FUSE)
            # must fail FAST, not busy-poll to a misleading timeout
            except (BlockingIOError, InterruptedError):
                if _time.monotonic() > deadline:
                    raise TimeoutError(
                        f"rollup lock busy for >{wait_timeout_s}s: {lock} — "
                        "another folder is (still) running; raise "
                        "wait_timeout_s if its folds legitimately take longer"
                    )
                _time.sleep(0.1)
        try:
            _update_rollup_locked(batch_df, path, txn)
        finally:
            _fcntl.flock(fd, _fcntl.LOCK_UN)
    finally:
        _os.close(fd)


def _update_rollup_locked(
    batch_df: DataFrame, path: str, txn: tuple[str, int] | None
) -> None:
    import os as _os

    from ..sinks.writers import _recover_swap, _swap_dir

    _recover_swap(path, "rollup")
    meta = rollup_meta(path)
    if txn is not None:
        app_id, batch_id = txn
        if int(batch_id) <= meta.get("txn", {}).get(app_id, -1):
            return  # replayed micro-batch: already folded
        meta = {**meta, "txn": {**meta.get("txn", {}), app_id: int(batch_id)}}
    specs = meta["specs"]
    grain = meta["group_cols"]
    spark = batch_df.sparkSession
    partial = batch_df.groupBy(*grain).agg(*_partial_aggs(specs))
    current = spark.read.parquet(path)
    merge_aggs = [F.sum("rollup_count__").alias("rollup_count__")]
    for out, (fn, _src) in specs.items():
        if fn in ("sum", "count"):
            merge_aggs.append(F.sum(out).alias(out))
        else:
            merge_aggs.append(getattr(F, fn)(out).alias(out))
    merged = (
        current.unionByName(partial, allowMissingColumns=False)
        .groupBy(*grain)
        .agg(*merge_aggs)
    )
    tmp = path.rstrip("/") + "._rollup_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    # meta (incl. the advanced watermark) goes INTO tmp so the swap
    # publishes data + watermark as one unit
    with open(_os.path.join(tmp, _META), "w") as fh:
        json.dump(meta, fh)
    _swap_dir(path, tmp, "rollup")


def rollup_stream_sink(path: str, app_id: str):
    """A ``foreachBatch`` sink that keeps a rollup fresh from a stream with
    exactly-once folding: Structured Streaming replays an unacknowledged
    batch with the SAME batch_id after a crash, and :func:`update_rollup`'s
    watermark makes the replayed fold a no-op.  Pair with
    ``streaming/file_pipeline.start_foreach_batch_load`` or any
    ``writeStream.foreachBatch``."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        update_rollup(batch_df, path, txn=(app_id, int(batch_id)))

    return sink
