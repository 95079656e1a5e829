"""Versioned parquet tables: snapshot isolation via a manifest pointer.

The plain-parquet sinks in :mod:`writers` swap whole directories into
place — crash-tolerant, but only on a POSIX filesystem (object stores
have no atomic directory rename), and a reader racing the swap can see
the table mid-flight.  This module is the scale tier: a minimal
manifest-based table format in the spirit of Delta/Iceberg (public
designs: Armbrust et al., "Delta Lake: High-Performance ACID Table
Storage over Cloud Object Stores", VLDB 2020), built only on operations
every storage backend provides atomically — write-a-new-object and
replace-a-single-small-file.

Layout::

    table/
      data/commit-<token>/part-*.parquet   immutable data files
      _manifests/v<N>.json                 file list for version N
      _CURRENT                             pointer: the committed version

Commit protocol (single-writer optimistic):

1. Spark writes data files into a fresh ``data/commit-<token>/`` dir —
   never touches live files, so a crash leaves invisible garbage only.
2. The manifest ``v<N+1>.json`` is created with ``open(..., 'x')`` —
   exclusive create doubles as conflict detection: a concurrent
   committer of the same version loses with :class:`CommitConflict`.
3. ``_CURRENT`` is atomically replaced (``os.replace``; the object-store
   analogue is an If-Match PUT / DynamoDB pointer as in the Delta paper).
   Readers resolve ``_CURRENT`` once, then read an immutable file list —
   they see the table before or after a commit, never during.

Reads take the manifest's explicit file list (``spark.read.parquet(*files)``)
— no directory listing on the read path, which at 100 TB / object-store
latency is itself the difference between planning in milliseconds and
minutes.  Old versions stay readable (time travel) until :func:`vacuum`.

These helpers run on the DRIVER (manifest I/O is a handful of small
files); only the parquet data files are written by executors.
"""

from __future__ import annotations

import json
import math
import os
import time
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "CommitConflict",
    "append",
    "compact",
    "create_or_replace",
    "current_version",
    "history",
    "idempotent_append",
    "read_snapshot",
    "stream_sink",
    "upsert",
    "vacuum",
]


class CommitConflict(RuntimeError):
    """Another writer committed this version first — retry on latest."""


def _manifest_dir(path: str) -> str:
    return os.path.join(path, "_manifests")


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(_manifest_dir(path), f"v{version:08d}.json")


def _current_path(path: str) -> str:
    return os.path.join(path, "_CURRENT")


def current_version(path: str) -> int:
    """The committed version, or 0 if the table does not exist yet."""
    try:
        with open(_current_path(path)) as fh:
            return int(fh.read().strip())
    except FileNotFoundError:
        return 0


def _read_manifest(path: str, version: int) -> dict:
    with open(_manifest_path(path, version)) as fh:
        return json.load(fh)


def _write_data_files(df: DataFrame, path: str, n_files: int | None) -> list[str]:
    token = uuid.uuid4().hex[:12]
    commit_dir = os.path.join(path, "data", f"commit-{token}")
    out = df.coalesce(n_files) if n_files else df
    out.write.mode("error").parquet(commit_dir)
    return sorted(
        os.path.join("data", f"commit-{token}", f)
        for f in os.listdir(commit_dir)
        if f.endswith(".parquet")
    )


#: manifest stats are kept only for types whose min/max are JSON-exact and
#: whose comparison semantics match SQL's (lexicographic str, numeric)
_STATS_TYPES = (int, float, str)


def _collect_file_stats(path: str, files: list[str]) -> dict[str, dict]:
    """Per-file column min/max from the parquet footers (driver-side, one
    footer read per file — no data scan). This is the Delta/Iceberg
    data-skipping design: stats ride in the manifest, so a predicate
    prunes files during PLANNING, before Spark ever opens them.

    Columns with non-JSON-exact types (timestamps, binary, nested) or
    missing footer statistics simply have no entry — pruning treats
    absent stats as "file may match" (always safe).
    """
    import pyarrow.parquet as pq

    out: dict[str, dict] = {}
    for rel in files:
        meta = pq.ParquetFile(os.path.join(path, rel)).metadata
        cols: dict[str, list] = {}
        for rg in range(meta.num_row_groups):
            g = meta.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                st = col.statistics
                name = col.path_in_schema
                if st is None or not st.has_min_max or "." in name:
                    cols[name] = None  # nested / no stats -> unusable
                    continue
                mn, mx = st.min, st.max
                if isinstance(mn, bytes):
                    try:
                        mn, mx = mn.decode(), mx.decode()
                    except UnicodeDecodeError:
                        cols[name] = None
                        continue
                if not (
                    isinstance(mn, _STATS_TYPES) and isinstance(mx, _STATS_TYPES)
                ) or isinstance(mn, bool):
                    cols[name] = None
                    continue
                cur = cols.get(name)
                if cur is None and name in cols:
                    continue  # poisoned by an earlier row group
                cols[name] = (
                    [mn, mx]
                    if cur is None
                    else [min(cur[0], mn), max(cur[1], mx)]
                )
        out[rel] = {k: v for k, v in cols.items() if v is not None}
    return out


#: bloom sidecar config file name (table-level opt-in, see
#: :func:`set_bloom_columns`)
_BLOOM_CFG = "_bloom_cols.json"


def set_bloom_columns(
    path: str, cols: list[str], n_bits: int = 4096, n_hashes: int = 5
) -> None:
    """Opt the table into manifest BLOOM FILTERS for ``cols`` — the
    point-lookup complement to min/max stats.  Min/max prunes ranges; on a
    high-cardinality key whose values interleave across files (uuids, user
    ids) every file's [min, max] spans everything and range stats prune
    NOTHING — a per-file bloom answers "could value v be in this file?"
    probabilistically with no false negatives, so ``=`` predicates skip
    files the way Delta/Iceberg bloom indexes do.

    Size: ``n_bits/8`` bytes per column per file in the manifest (default
    512 B).  False-positive rate ~ (1-e^{-kn/m})^k — at 4096 bits / 5
    hashes, <1% up to ~400 distinct values per file; oversize ``n_bits``
    for bigger files.  Applies to commits made AFTER the call."""
    # fail fast at config time: bit positions index a bytearray(n_bits//8),
    # so a non-multiple-of-8 n_bits would crash every subsequent commit
    if n_bits <= 0 or n_bits % 8 != 0:
        raise ValueError(f"n_bits must be a positive multiple of 8, got {n_bits}")
    if n_hashes <= 0:
        raise ValueError(f"n_hashes must be positive, got {n_hashes}")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _BLOOM_CFG), "w") as fh:
        json.dump({"cols": list(cols), "n_bits": n_bits, "k": n_hashes}, fh)


def _bloom_config(path: str) -> dict | None:
    try:
        with open(os.path.join(path, _BLOOM_CFG)) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return None


def _bloom_positions(value, n_bits: int, k: int) -> list[int]:
    """k salted-md5 bit positions for a canonicalized value. Only int and
    str values participate (float equality pruning is a correctness trap:
    '1.0' vs '1' canonicalization differs by engine)."""
    import hashlib

    s = str(value)
    return [
        int(hashlib.md5(f"{salt}:{s}".encode()).hexdigest()[:15], 16) % n_bits
        for salt in range(k)
    ]


def _collect_file_blooms(path: str, files: list[str], cfg: dict) -> dict[str, dict]:
    """Per-file bloom bitsets for the configured columns.

    Driver-side single-column reads at commit time — the same cost class
    as a footer-stats pass for small commits.  At a 1000-executor scale the
    equivalent is a cluster-side ``groupBy(file)`` aggregate over the k
    hash positions with only the finished bitsets collected; the manifest
    format here is identical either way."""
    import pyarrow.parquet as pq

    n_bits, k = cfg["n_bits"], cfg["k"]
    out: dict[str, dict] = {}
    for rel in files:
        pf = pq.ParquetFile(os.path.join(path, rel))
        present = [c for c in cfg["cols"] if c in pf.schema_arrow.names]
        per: dict[str, str] = {}
        if present:
            tbl = pq.read_table(os.path.join(path, rel), columns=present)
            for col in present:
                vals = set(tbl.column(col).to_pylist())
                vals.discard(None)
                if any(not isinstance(v, (int, str)) or isinstance(v, bool) for v in vals):
                    continue  # unsupported type -> no bloom (never prunes)
                bits = bytearray(n_bits // 8)
                for v in vals:
                    for p in _bloom_positions(v, n_bits, k):
                        bits[p // 8] |= 1 << (p % 8)
                per[col] = bits.hex()
        out[rel] = per
    return out


def _bloom_may_contain(bloom_hex: str | None, cfg: dict | None, value) -> bool:
    """False only when the file's bloom PROVES the value absent (all-safe:
    missing bloom / config / unsupported value type -> may contain)."""
    if not bloom_hex or not cfg or not isinstance(value, (int, str)) or isinstance(value, bool):
        return True
    bits = bytes.fromhex(bloom_hex)
    return all(
        bits[p // 8] & (1 << (p % 8))
        for p in _bloom_positions(value, cfg["n_bits"], cfg["k"])
    )


def _file_survives(stats: dict | None, col: str, op: str, value) -> bool:
    """Conservative overlap test: False only when the file's [min, max]
    interval PROVES no row can satisfy ``col op value`` (NULLs never
    satisfy a comparison, so non-null min/max bounds are sufficient)."""
    if not stats or col not in stats:
        return True
    mn, mx = stats[col]
    if op == "=":
        return mn <= value <= mx
    if op == "<":
        return mn < value
    if op == "<=":
        return mn <= value
    if op == ">":
        return mx > value
    if op == ">=":
        return mx >= value
    return True  # unknown operator -> never prune


def _commit(
    path: str,
    base_version: int,
    files: list[str],
    op: str,
    txn: dict[str, int] | None = None,
) -> int:
    """Publish ``files`` as version ``base_version + 1``.

    Exclusive-create of the manifest is the conflict gate; the pointer
    replace is the atomic publish.  A crash between the two leaves a
    manifest that ``_CURRENT`` never references — harmless (the next
    committer of that version number conflicts and retries one higher,
    via :func:`_next_free_version`).
    """
    version = _next_free_version(path, base_version + 1)
    os.makedirs(_manifest_dir(path), exist_ok=True)
    # per-file min/max stats for manifest-level data skipping: carried
    # forward for files retained from the base version, read from the
    # parquet footers (one footer each, driver-side) for new files
    prior_stats = (
        _read_manifest(path, base_version).get("file_stats", {})
        if base_version
        else {}
    )
    new = [f for f in files if f not in prior_stats]
    file_stats = {
        **{f: prior_stats[f] for f in files if f in prior_stats},
        **_collect_file_stats(path, new),
    }
    manifest = {
        "version": version,
        "files": files,
        "op": op,
        "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        # per-writer transaction watermarks (app_id -> highest committed
        # batch), carried forward cumulatively — the Delta-paper "txn"
        # action that makes streaming re-delivery idempotent
        "txn": dict(txn or {}),
        "file_stats": file_stats,
    }
    # bloom indexes (opt-in per table): built for NEW files only, carried
    # forward for retained ones, exactly like file_stats
    bloom_cfg = _bloom_config(path)
    if bloom_cfg:
        prior_blooms = (
            _read_manifest(path, base_version).get("file_blooms", {})
            if base_version
            else {}
        )
        new_bloom = [f for f in files if f not in prior_blooms]
        manifest["file_blooms"] = {
            **{f: prior_blooms[f] for f in files if f in prior_blooms},
            **_collect_file_blooms(path, new_bloom, bloom_cfg),
        }
        manifest["bloom_cfg"] = bloom_cfg
    try:
        with open(_manifest_path(path, version), "x") as fh:
            json.dump(manifest, fh)
    except FileExistsError as exc:  # lost the race for this version number
        raise CommitConflict(f"version {version} already committed") from exc
    tmp = _current_path(path) + f".{uuid.uuid4().hex[:8]}.tmp"
    with open(tmp, "w") as fh:
        fh.write(str(version))
    os.replace(tmp, _current_path(path))
    return version


def _next_free_version(path: str, candidate: int) -> int:
    # skip orphaned manifests from crashed commits (manifest written,
    # pointer never flipped) — their version numbers are burned
    while os.path.exists(_manifest_path(path, candidate)):
        candidate += 1
    return candidate


def _head_txn(path: str, base: int) -> dict[str, int]:
    if not base:
        return {}
    return _read_manifest(path, base).get("txn", {})


def create_or_replace(df: DataFrame, path: str, n_files: int | None = None) -> int:
    """Commit ``df`` as a full snapshot (version 1 for a new table).
    Returns the committed version."""
    os.makedirs(path, exist_ok=True)
    base = current_version(path)
    files = _write_data_files(df, path, n_files)
    return _commit(path, base, files, "create_or_replace", _head_txn(path, base))


def append(df: DataFrame, path: str, n_files: int | None = None) -> int:
    """Commit ``df``'s rows on top of the current snapshot (new manifest =
    old file list + new files; no data file is rewritten)."""
    base = current_version(path)
    prior = _read_manifest(path, base)["files"] if base else []
    files = _write_data_files(df, path, n_files)
    return _commit(path, base, prior + files, "append", _head_txn(path, base))


def idempotent_append(
    df: DataFrame, path: str, app_id: str, batch_id: int, n_files: int | None = None
) -> int | None:
    """Exactly-once append for streaming: commit ``df`` tagged with
    (``app_id``, ``batch_id``); a re-delivered batch (same or lower id for
    this app) is a NO-OP, returning None.

    This is the table-side half of exactly-once — the checkpoint replays
    a batch after a crash, and the transaction watermark in the manifest
    deduplicates the replay (Delta paper §3.2 "txn" action).  The check
    and the commit race safely: the watermark is read from the same head
    version the commit is built on, and a concurrent commit of the same
    version loses on the exclusive manifest create.
    """
    base = current_version(path)
    txn = _head_txn(path, base)
    if app_id in txn and batch_id <= txn[app_id]:
        return None
    os.makedirs(path, exist_ok=True)
    prior = _read_manifest(path, base)["files"] if base else []
    files = _write_data_files(df, path, n_files)
    txn = {**txn, app_id: batch_id}
    return _commit(path, base, prior + files, f"stream_append[{batch_id}]", txn)


def stream_sink(path: str, app_id: str, n_files: int | None = None):
    """``foreachBatch`` adapter: ``writeStream.foreachBatch(stream_sink(
    table, app_id))`` gives exactly-once versioned-table appends — the
    checkpoint provides replay, :func:`idempotent_append` provides
    dedup, the pointer flip provides atomic publish."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        idempotent_append(batch_df, path, app_id, int(batch_id), n_files)

    return write


def read_snapshot(
    spark,
    path: str,
    version: int | None = None,
    prune: list[tuple[str, str, object]] | None = None,
) -> DataFrame:
    """Read a committed snapshot (the current one, or a pinned ``version``
    for time travel).  The file list is explicit — no directory listing.

    ``prune`` is a list of simple predicates ``(col, op, value)`` with
    ``op`` in {=, <, <=, >, >=}. Files whose manifest min/max stats prove
    no row can match are dropped during PLANNING — the Delta/Iceberg
    data-skipping read path: at 100 TB, skipping happens before a single
    parquet footer is opened, from the manifest alone.  ``=`` predicates
    additionally consult the per-file bloom indexes when the table opted
    in (:func:`set_bloom_columns`) — the point-lookup path for
    high-cardinality keys whose ranges overlap across every file.  The
    predicates are ALSO applied as row filters on the surviving files, so
    the result is exactly the filtered table whether or not any file was
    prunable (stats-less files — old manifests, exotic types — just
    don't prune).
    """
    v = version if version is not None else current_version(path)
    if v == 0:
        raise FileNotFoundError(f"no committed version at {path}")
    m = _read_manifest(path, v)
    files = m["files"]
    if prune:
        stats = m.get("file_stats", {})
        blooms, bcfg = m.get("file_blooms", {}), m.get("bloom_cfg")
        files = [
            f
            for f in files
            if all(
                _file_survives(stats.get(f), col, op, val)
                and (
                    op != "="
                    or _bloom_may_contain(
                        blooms.get(f, {}).get(col), bcfg, val
                    )
                )
                for col, op, val in prune
            )
        ]
        if not files:  # every file pruned: empty result, correct schema
            full = spark.read.parquet(
                *[os.path.join(path, f) for f in m["files"]]
            )
            return full.filter(F.lit(False))
    df = spark.read.parquet(*[os.path.join(path, f) for f in files])
    ops = {
        "=": lambda c, x: F.col(c) == x,
        "<": lambda c, x: F.col(c) < x,
        "<=": lambda c, x: F.col(c) <= x,
        ">": lambda c, x: F.col(c) > x,
        ">=": lambda c, x: F.col(c) >= x,
    }
    for col, op, val in prune or []:
        df = df.filter(ops[op](col, val))
    return df


def history(path: str) -> list[dict]:
    """All committed versions, oldest first (op + file count + timestamp)."""
    out = []
    for v in range(1, current_version(path) + 1):
        if os.path.exists(_manifest_path(path, v)):
            m = _read_manifest(path, v)
            out.append(
                {
                    "version": m["version"],
                    "op": m["op"],
                    "n_files": len(m["files"]),
                    "committed_at": m["committed_at"],
                }
            )
    return out


def compact(
    spark, path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> int:
    """OPTIMIZE for the versioned table: rewrite the current snapshot into
    ~``target_file_bytes`` files and commit the replacement manifest.
    Unlike :func:`writers.compact_parquet` the table never goes absent —
    readers on the old version keep their (still present) files; the
    pointer flip is the only mutation.  Returns the new version."""
    base = current_version(path)
    files = _read_manifest(path, base)["files"]
    total = sum(os.path.getsize(os.path.join(path, f)) for f in files)
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = read_snapshot(spark, path, base)
    new_files = _write_data_files(df, path, n_files)
    return _commit(path, base, new_files, "compact", _head_txn(path, base))


def optimize_zorder(
    spark, path: str, col_a: str, col_b: str, bits: int = 16, n_files: int = 8
) -> int:
    """OPTIMIZE ZORDER BY (col_a, col_b): rewrite the current snapshot
    clustered on the Morton interleave of the two (min/max-normalized)
    columns and commit it as a new version — same pointer-flip publish
    as :func:`compact`, so readers never block and time travel still
    reaches the un-clustered history.

    After the rewrite, a range predicate on EITHER column skips row
    groups via footer stats (the lakehouse OPTIMIZE ZORDER semantics;
    skipping asserted in test_versioned). The 4-number min/max stats are
    collected driver-side — planning metadata, not data — and the sort
    is expression-based so the table schema is unchanged (no persisted
    key column).
    """
    from real_estate_project1_etl_spark.sinks.writers import zorder_key_expr

    base = current_version(path)
    df = read_snapshot(spark, path, base)
    mna, mxa, mnb, mxb = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).first()
    top = (1 << bits) - 1
    na = f"cast((({col_a}) - {mna}) * {top} div greatest({mxa - mna}, 1) as bigint)"
    nb = f"cast((({col_b}) - {mnb}) * {top} div greatest({mxb - mnb}, 1) as bigint)"
    zkey = zorder_key_expr(f"({na})", f"({nb})", bits)
    arranged = df.repartitionByRange(n_files, zkey).sortWithinPartitions(zkey)
    new_files = _write_data_files(arranged, path, None)
    return _commit(path, base, new_files, "optimize_zorder", _head_txn(path, base))


def upsert(
    spark,
    updates: DataFrame,
    path: str,
    key_cols: list[str],
    order_col: str | None = None,
    n_files: int | None = None,
) -> int:
    """MERGE (SCD1) against the current snapshot: updates win per key
    (ties broken by ``order_col`` desc when given), result committed as a
    full replacement manifest.  Same one-window-shuffle shape as
    :func:`writers.upsert_parquet`, but the publish is a pointer flip —
    object-store safe, and concurrent readers never block."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    base = current_version(path)
    tagged = updates.withColumn("_src", F.lit(1))
    if base:
        current = read_snapshot(spark, path, base).withColumn("_src", F.lit(0))
        merged = tagged.unionByName(current)
    else:
        os.makedirs(path, exist_ok=True)
        merged = tagged
    order = [F.col("_src").desc()]
    if order_col:
        order.insert(0, F.col(order_col).desc())
    w = Window.partitionBy(*key_cols).orderBy(*order)
    out = (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )
    files = _write_data_files(out, path, n_files)
    return _commit(path, base, files, "upsert", _head_txn(path, base))


def table_diff(
    spark,
    path: str,
    from_version: int,
    to_version: int,
    key_cols: list[str],
    include_old: bool = False,
) -> DataFrame:
    """CDC between two snapshots: one row per changed key with
    ``_change`` in {insert, delete, update} plus the to-version's row
    values (nulls for deletes) — the change-data-feed a downstream
    incremental consumer reads instead of re-scanning the table. With
    ``include_old`` the from-version's values come along as ``<col>_old``
    (the before-image deletes/updates need for incremental aggregate
    maintenance).

    Implementation: full outer join of the two snapshots on the key,
    change class from null-side tests, update detection by comparing the
    non-key columns as a struct (null-safe: struct equality treats NULL
    = NULL as equal, so a column flipping to/from NULL is a real
    update). One shuffle on the key; nothing wider than the two
    snapshots' changed rows survives the filter.
    """
    from_df = read_snapshot(spark, path, from_version)
    to_df = read_snapshot(spark, path, to_version)
    val_cols = [c for c in to_df.columns if c not in key_cols]

    a = from_df.select(
        *key_cols, F.struct(*val_cols).alias("_old")
    )
    b = to_df.select(*key_cols, F.struct(*val_cols).alias("_new"))
    j = a.join(b, key_cols, "full_outer")
    change = (
        F.when(F.col("_old").isNull(), F.lit("insert"))
        .when(F.col("_new").isNull(), F.lit("delete"))
        .when(~F.col("_old").eqNullSafe(F.col("_new")), F.lit("update"))
    )
    out_cols = [F.col(f"_new.{c}").alias(c) for c in val_cols]
    if include_old:
        out_cols += [F.col(f"_old.{c}").alias(f"{c}_old") for c in val_cols]
    return (
        j.withColumn("_change", change)
        .filter(F.col("_change").isNotNull())
        .select(*key_cols, "_change", *out_cols)
    )


def vacuum(path: str, keep_last: int = 1) -> int:
    """Delete data files referenced only by expired versions (older than
    the newest ``keep_last``), plus their manifests.  Returns the number
    of data files removed.  Time travel reaches only kept versions
    afterwards."""
    head = current_version(path)
    keep_from = max(1, head - keep_last + 1)
    keep: set[str] = set()
    for v in range(keep_from, head + 1):
        if os.path.exists(_manifest_path(path, v)):
            keep.update(_read_manifest(path, v)["files"])
    removed = 0
    data_root = os.path.join(path, "data")
    for commit_dir in os.listdir(data_root) if os.path.isdir(data_root) else []:
        cdir = os.path.join(data_root, commit_dir)
        for f in os.listdir(cdir):
            rel = os.path.join("data", commit_dir, f)
            if f.endswith(".parquet") and rel not in keep:
                os.remove(os.path.join(cdir, f))
                removed += 1
        if not any(f.endswith(".parquet") for f in os.listdir(cdir)):
            import shutil

            shutil.rmtree(cdir)
    for v in range(1, keep_from):
        mp = _manifest_path(path, v)
        if os.path.exists(mp):
            os.remove(mp)
    return removed
