#!/usr/bin/env python
"""Drain-and-rebuild migration for streaming state-store provider changes.

Round 4 made RocksDB the default state-store provider (session.py). A
stateful query's provider is baked into its checkpoint's state layout, so
a checkpoint born under the HDFS-backed provider CANNOT restart under
RocksDB — the restart fails with an opaque state-format error. The
documented remedy is drain-and-rebuild; this module is that runbook as
code:

1. **Drain** — restart the query on its OLD checkpoint with
   ``SPARK_GRAFT_STATE_STORE=hdfs`` and ``Trigger.AvailableNow`` so every
   pending input file is processed and committed, then stop. The sink now
   holds everything the old checkpoint ever admitted.
2. **Retire the input** — read the file-source log inside the old
   checkpoint to learn exactly which inbox files it committed, and move
   them to an archive directory. A fresh checkpoint would otherwise
   re-ingest them (double-processing under a new batch counter).
3. **Rebuild** — start the query on a NEW checkpoint directory under the
   RocksDB default, passing ``batch_id_offset = last committed batch + 1``
   for sinks partitioned by batch id (a fresh checkpoint restarts Spark's
   batch counter at 0; without the offset, dynamic partition overwrite
   would clobber the retired checkpoint's partitions).

The helpers are pure checkpoint-file parsing (no Spark session needed), so
they compose with any foreachBatch pipeline; the incremental-dedup test
(tests/test_streaming_migration.py) migrates a live checkpoint and proves
the pre-migration row set survives intact with exactly-once held.

Counter-state streams (round-5 verdict item 8): a pipeline whose ONLY
state is inside the state store — ``capped_corpus_stream``'s per-key
admitted counter — adds one step to the runbook, because a fresh
checkpoint starts that state empty.  After the drain, reconstruct the
counters from the sink itself (:func:`admitted_counts` — one emitted row
per admission, so rows-per-key == counter) and pass the dict as the
rebuilt query's ``initial_counts``.  The capped-corpus migration test
proves the pre-migration admitted row set survives the provider switch
with every cap still enforced.
"""

from __future__ import annotations

import json
import os
import shutil


def committed_batch_ids(checkpoint_path: str) -> list[int]:
    """Batch ids with a commit marker in ``<checkpoint>/commits`` —
    i.e. fully processed micro-batches (sorted ascending)."""
    commits_dir = os.path.join(checkpoint_path, "commits")
    if not os.path.isdir(commits_dir):
        return []
    out = []
    for name in os.listdir(commits_dir):
        base = name.split(".")[0]
        if base.isdigit():
            out.append(int(base))
    return sorted(set(out))


def last_committed_batch(checkpoint_path: str) -> int | None:
    """Highest committed batch id, or None for a virgin checkpoint."""
    ids = committed_batch_ids(checkpoint_path)
    return ids[-1] if ids else None


def consumed_source_files(checkpoint_path: str, source_idx: int = 0) -> list[str]:
    """Absolute paths of every input file the file-source log inside the
    checkpoint has recorded for COMMITTED batches.

    The log lives at ``<checkpoint>/sources/<idx>/<batchId>``; each file is
    a version header line followed by one JSON object per ingested file
    (``{"path": "file:///...", ...}``). Compact-log files (``N.compact``)
    repeat the full history and are parsed the same way.
    """
    src_dir = os.path.join(checkpoint_path, "sources", str(source_idx))
    if not os.path.isdir(src_dir):
        return []
    committed = set(committed_batch_ids(checkpoint_path))
    paths: list[str] = []
    seen: set[str] = set()
    for name in sorted(
        os.listdir(src_dir),
        key=lambda n: int(n.split(".")[0]) if n.split(".")[0].isdigit() else -1,
    ):
        base = name.split(".")[0]
        if not base.isdigit() or int(base) not in committed:
            continue
        with open(os.path.join(src_dir, name)) as f:
            for line in f:
                line = line.strip()
                if not line.startswith("{"):
                    continue
                try:
                    entry = json.loads(line)
                except json.JSONDecodeError:
                    continue
                p = entry.get("path")
                if not p:
                    continue
                local = p[len("file:"):] if p.startswith("file:") else p
                while local.startswith("//"):
                    local = local[1:]
                if local not in seen:
                    seen.add(local)
                    paths.append(local)
    return paths


def retire_consumed_files(
    checkpoint_path: str, archive_dir: str, source_idx: int = 0
) -> list[str]:
    """Move every committed input file out of the inbox into
    ``archive_dir`` so a FRESH checkpoint will not re-ingest it. Returns
    the list of files moved (already-missing files are skipped — the move
    is idempotent under re-runs of the migration itself)."""
    os.makedirs(archive_dir, exist_ok=True)
    moved = []
    for p in consumed_source_files(checkpoint_path, source_idx):
        if os.path.exists(p):
            shutil.move(p, os.path.join(archive_dir, os.path.basename(p)))
            moved.append(p)
    return moved


def drain(start_query_fn):
    """Run one AvailableNow pass to completion on the OLD checkpoint.

    ``start_query_fn`` must start the streaming query with
    ``Trigger.AvailableNow`` on the old checkpoint under the provider that
    checkpoint was born with (``SPARK_GRAFT_STATE_STORE=hdfs`` in the
    session env for pre-round-4 checkpoints) and return the
    StreamingQuery. Blocks until every pending file is committed."""
    q = start_query_fn()
    q.awaitTermination()
    return q


def rebuild_offset(old_checkpoint_path: str) -> int:
    """``batch_id_offset`` for the rebuilt query: one past the old
    checkpoint's last committed batch, so batch-id-partitioned sinks never
    collide with partitions the retired checkpoint wrote."""
    last = last_committed_batch(old_checkpoint_path)
    return 0 if last is None else last + 1


def migrate(
    start_old_query_fn,
    old_checkpoint_path: str,
    archive_dir: str,
    source_idx: int = 0,
) -> dict:
    """Full drain-and-rebuild preamble: drain the old checkpoint, retire
    its consumed input files, and return what the caller needs to start
    the rebuilt query (fresh checkpoint dir of their choosing, RocksDB
    default provider):

        {"batch_id_offset": int, "retired_files": [paths...]}
    """
    drain(start_old_query_fn)
    retired = retire_consumed_files(old_checkpoint_path, archive_dir, source_idx)
    return {
        "batch_id_offset": rebuild_offset(old_checkpoint_path),
        "retired_files": retired,
    }


def admitted_counts(sink_df, key_cols: list[str]) -> dict:
    """Counter-state bootstrap for ``capped_corpus_stream`` migrations:
    reconstruct each key's admitted counter from the DRAINED sink (one
    emitted row per admission, admissions are never revoked, so
    rows-per-key == counter).  Pass the result as ``initial_counts`` when
    rebuilding on the fresh checkpoint — the other state shape in the
    repo (incremental-dedup externalizes its state to the signature
    store; the cap's counter lives only in the state store and must be
    rebuilt from the sink).  Returns ``{(key values...): count}``; size
    is one int per distinct admitted key (the domain set, not the
    corpus)."""
    from pyspark.sql import functions as F

    rows = sink_df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_n")).collect()
    return {tuple(r[c] for c in key_cols): r["_n"] for r in rows}
