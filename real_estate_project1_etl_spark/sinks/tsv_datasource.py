"""Spark 4 Python DataSource with a WRITER: transactional TSV export —
``df.write.format("tsv_manifest").save(path)`` (reference: K1/K2, the
TSV sink of transform.py:60-62, re-expressed as a first-class format
with a commit protocol instead of a helper).

Why a manifest: a plain file sink is only as atomic as its directory
listing — a reader that lists files mid-job sees partial output, and a
crashed job leaves orphans that later reads silently include.  This
format implements the DataSource V2 commit protocol in the Python API:

1. **write(partition)** (executor): rows stream to a uniquely-named
   ``part-*`` file; the commit message carries (name, rows, md5).
   Files are written under their FINAL names — no rename pass: because
   visibility is manifest-gated, an unpublished file is as invisible as
   a temp file, and skipping the rename removes the driver-side
   N-renames step that object stores turn into N copies (the
   Iceberg-style manifest design).
2. **commit(messages)** (driver, exactly once): ``_MANIFEST.json`` is
   written LAST (atomic tmp+replace) with the schema DDL, per-file row
   counts + content checksums, and totals.  The manifest IS the commit
   marker — nothing else changes on disk.
3. **abort(messages)**: the written files are deleted; the committed
   state is untouched (a crashed job can also just be left — its files
   are invisible and GC-able by comparing the listing to the manifest).

Reads are MANIFEST-GATED: ``spark.read.format("tsv_manifest")`` plans
one partition per manifest entry and ignores every file the manifest
doesn't name — uncommitted/orphan files are invisible, and a checksum
mismatch fails the read loudly (tamper/corruption detection, same
contract as sinks/shards.verify_training_shards).  Writers also record
per-file numeric min/max STATS in the manifest; with
``option("prune", "true")`` (plus the session's
``spark.sql.python.filterPushdown.enabled``) comparison predicates
prune whole files at planning time through ``pushFilters`` — every
filter is still re-applied by Spark, so skipping is an optimization,
never the correctness path (the parquet row-group model).

Values must not contain the separator or newlines (rejected loudly —
silent mangling of a training corpus is the failure mode this sink
exists to prevent); NULL encodes as the ``null_marker`` option
(default empty string — which means an ACTUAL empty string reads back
as NULL; exports that must distinguish them set a marker that cannot
occur in the data, e.g. ``null_marker=\\N``, the classic dump
convention).

Paths are plain ``os`` filesystem paths — local disk in this sandbox,
NFS/FUSE mounts on a cluster (driver and executors must see the same
tree).  An object-store deployment keeps the identical protocol (write
final-named objects, publish the manifest last) through its client
library; nothing here depends on rename, which is why the commit step
is manifest-only.
"""

from __future__ import annotations

import hashlib
import json
import os
import uuid
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

MANIFEST = "_MANIFEST.json"

_PARSERS = {
    "string": lambda s: s,
    "bigint": int,
    "int": int,
    "double": float,
    "float": float,
    "boolean": lambda s: s.lower() == "true",
}


class TsvCommit(WriterCommitMessage):
    def __init__(self, name: str, n_rows: int, md5: str, stats: dict | None = None):
        self.name = name
        self.n_rows = n_rows
        self.md5 = md5
        self.stats = stats or {}


class TsvManifestWriter(DataSourceWriter):
    def __init__(self, options: dict, schema: StructType, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("tsv_manifest: a save path is required")
        self.sep = options.get("sep", "\t")
        self.null_marker = options.get("null_marker", "")
        if (
            self.sep in self.null_marker
            or "\n" in self.null_marker
            or "\r" in self.null_marker
        ):
            raise ValueError(
                "tsv_manifest: null_marker must not contain the separator "
                "or newlines — it would corrupt the file structure"
            )
        self.schema = schema
        self.overwrite = overwrite
        for f in schema.fields:
            if f.dataType.simpleString() not in _PARSERS:
                raise ValueError(
                    "tsv_manifest: unsupported column type "
                    f"{f.dataType.simpleString()!r} for {f.name!r} — "
                    f"supported: {sorted(_PARSERS)}"
                )

    def write(self, iterator: Iterator) -> TsvCommit:
        os.makedirs(self.path, exist_ok=True)
        token = uuid.uuid4().hex
        name = f"part-{token}.tsv"
        digest = hashlib.md5()
        n = 0
        numeric = [
            (i, f.name)
            for i, f in enumerate(self.schema.fields)
            if f.dataType.simpleString() in ("bigint", "int", "double", "float")
        ]
        lo: dict = {}
        hi: dict = {}
        with open(os.path.join(self.path, name), "w") as f:
            for row in iterator:
                cells = []
                for v in row:
                    if v is None:
                        cells.append(self.null_marker)
                        continue
                    # canonical serialization: booleans as true/false
                    # (str(True) is "True", which the parser would read
                    # back as False — the classic asymmetric-case bug)
                    s = ("true" if v else "false") if isinstance(v, bool) else str(v)
                    if self.sep in s or "\n" in s or "\r" in s:
                        raise ValueError(
                            "tsv_manifest: value contains the separator "
                            f"or a newline and would corrupt the file: {s!r}"
                        )
                    if self.null_marker and s == self.null_marker:
                        raise ValueError(
                            f"tsv_manifest: value {s!r} collides with the "
                            "null_marker and would silently read back as "
                            "NULL — pick a marker that cannot occur in "
                            "the data"
                        )
                    cells.append(s)
                for i, col in numeric:
                    v = row[i]
                    # NaN never compares, so folding it would freeze the
                    # stats at [NaN, NaN] and pruning would wrongly drop
                    # the file — silent row loss; skip it (v == v)
                    if v is not None and v == v:
                        if col not in lo or v < lo[col]:
                            lo[col] = v
                        if col not in hi or v > hi[col]:
                            hi[col] = v
                line = self.sep.join(cells) + "\n"
                f.write(line)
                digest.update(line.encode("utf-8"))
                n += 1
        stats = {c: [lo[c], hi[c]] for c in lo}
        return TsvCommit(name, n, digest.hexdigest(), stats)

    def _load_prior(self) -> dict | None:
        mpath = os.path.join(self.path, MANIFEST)
        if not os.path.exists(mpath):
            return None
        with open(mpath) as f:
            old = json.load(f)
        if (
            old["schema"] != self.schema.simpleString()
            or old["sep"] != self.sep
            or old["null_marker"] != self.null_marker
        ):
            raise ValueError(
                "tsv_manifest: writing onto a commit with a different "
                "schema/sep/null_marker — use mode('overwrite') or a "
                "new path"
            )
        return old

    def _publish(
        self,
        prior_files: list,
        messages,
        committed_batches: list | None = None,
    ) -> None:
        """Single manifest-publish path shared by the batch and streaming
        commits: assemble the file list and os.replace the manifest —
        the ONLY mutation; everything before it is invisible, everything
        after it is committed."""
        files = list(prior_files)
        for m in messages:
            if m is None:
                continue
            files.append(
                {"name": m.name, "n_rows": m.n_rows, "md5": m.md5,
                 "stats": m.stats}
            )
        manifest = {
            "schema": self.schema.simpleString(),
            "sep": self.sep,
            "null_marker": self.null_marker,
            "files": sorted(files, key=lambda x: x["name"]),
            "total_rows": sum(x["n_rows"] for x in files),
        }
        if committed_batches is not None:
            manifest["committed_batches"] = committed_batches
        mpath = os.path.join(self.path, MANIFEST)
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, mpath)

    def commit(self, messages) -> None:
        old = self._load_prior() if not self.overwrite else None
        if self.overwrite:
            # crash-atomic overwrite: PUBLISH the new manifest first
            # (os.replace atomically supersedes the old one), then GC
            # the prior commit's files — a crash before the replace
            # leaves the old commit fully intact, a crash after it
            # leaves the new commit live with some unreferenced (and
            # therefore invisible) old files for later GC.  Only the
            # prior manifest's files are deleted, never a sweep of
            # part-* — a concurrent writer's unpublished files are not
            # ours to touch
            mpath = os.path.join(self.path, MANIFEST)
            prior = None
            if os.path.exists(mpath):
                with open(mpath) as f:
                    prior = json.load(f)
            self._publish([], messages)
            if prior is not None:
                for entry in prior["files"]:
                    try:
                        os.remove(os.path.join(self.path, entry["name"]))
                    except FileNotFoundError:
                        pass
            return
        # append: carry the prior commit forward — files AND the
        # streaming writer's committed_batches marker (dropping it would
        # break replay detection for a stream sharing this path)
        self._publish(
            old["files"] if old else [],
            messages,
            committed_batches=(
                old.get("committed_batches") if old else None
            ),
        )

    def abort(self, messages) -> None:
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.path, m.name))
            except FileNotFoundError:
                pass


class _FilePartition(InputPartition):
    def __init__(self, entry: dict):
        self.entry = entry


class TsvManifestReader(DataSourceReader):
    def __init__(self, options: dict, schema: StructType):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("tsv_manifest: a load path is required")
        with open(os.path.join(self.path, MANIFEST)) as f:
            self.manifest = json.load(f)
        self.schema = schema
        self._pruners: list = []

    def _keep(self, entry: dict) -> bool:
        stats = entry.get("stats") or {}
        for col, ok in self._pruners:
            if col in stats:
                lo, hi = stats[col]
                if not ok(lo, hi):
                    return False
        return True

    def partitions(self) -> list[InputPartition]:
        return [
            _FilePartition(e)
            for e in self.manifest["files"]
            if self._keep(e)
        ]


    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        entry = partition.entry
        sep = self.manifest["sep"]
        null_marker = self.manifest["null_marker"]
        parsers = [
            _PARSERS[f.dataType.simpleString()] for f in self.schema.fields
        ]
        digest = hashlib.md5()
        n = 0
        out = []
        with open(os.path.join(self.path, entry["name"])) as f:
            for line in f:
                digest.update(line.encode("utf-8"))
                n += 1
                cells = line.rstrip("\n").split(sep)
                out.append(
                    tuple(
                        None if c == null_marker else p(c)
                        for p, c in zip(parsers, cells)
                    )
                )
        if n != entry["n_rows"] or digest.hexdigest() != entry["md5"]:
            raise ValueError(
                f"tsv_manifest: {entry['name']} fails verification "
                f"(rows {n} vs {entry['n_rows']}, md5 mismatch="
                f"{digest.hexdigest() != entry['md5']}) — the file was "
                "modified after commit"
            )
        return iter(out)

class TsvManifestPruningReader(TsvManifestReader):
    """Opt-in reader variant (``option("prune", "true")``) that also
    implements ``pushFilters`` — separate because the Python DataSource
    API makes merely IMPLEMENTING pushFilters an error unless
    ``spark.sql.python.filterPushdown.enabled`` is true; the default
    reader must stay usable under default session conf."""

    def pushFilters(self, filters):
        """Stats-based FILE pruning: comparison filters on columns with
        manifest min/max stats prune whole files at planning time.  Every
        filter is returned as unsupported — stats can only exclude files,
        not filter rows inside kept files, so Spark re-applies them all
        (pruning-only pushdown, the parquet row-group model: skipping is
        an optimization, never the correctness path)."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        for f in filters:
            if isinstance(
                f,
                (EqualTo, GreaterThan, GreaterThanOrEqual,
                 LessThan, LessThanOrEqual),
            ) and len(f.attribute) == 1:
                col = f.attribute[0]
                v = f.value
                if isinstance(f, EqualTo):
                    keep = lambda lo, hi, v=v: lo <= v <= hi  # noqa: E731
                elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                    keep = lambda lo, hi, v=v: hi >= v  # noqa: E731
                else:
                    keep = lambda lo, hi, v=v: lo <= v  # noqa: E731
                self._pruners.append((col, keep))
        return filters  # all re-applied by Spark



class TsvManifestDataSource(DataSource):
    """Register with ``spark.dataSource.register(TsvManifestDataSource)``;
    then ``df.write.format("tsv_manifest").mode(...).save(path)`` and
    ``spark.read.format("tsv_manifest").load(path)``."""

    @classmethod
    def name(cls) -> str:
        return "tsv_manifest"

    def schema(self):
        # reads recover the schema from the manifest (written at commit)
        path = self.options.get("path")
        if not path:
            raise ValueError("tsv_manifest: a load path is required")
        with open(os.path.join(path, MANIFEST)) as f:
            return json.load(f)["schema"]

    def reader(self, schema) -> TsvManifestReader:
        if self.options.get("prune") == "true":
            return TsvManifestPruningReader(self.options, schema)
        return TsvManifestReader(self.options, schema)

    def writer(self, schema, overwrite: bool) -> TsvManifestWriter:
        return TsvManifestWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite: bool):
        return TsvManifestStreamWriter(self.options, schema)


class TsvManifestStreamWriter(DataSourceStreamWriter):
    """Streaming leg of the commit protocol — ``writeStream.format(
    "tsv_manifest")``: each micro-batch publishes an updated manifest
    (the batch's final-named files + the batch id recorded in
    ``committed_batches``) through the same single
    :meth:`TsvManifestWriter._publish` path the batch writer uses.  A
    REPLAYED batch (same id after a crash between sink-commit and
    checkpoint-commit) is detected in ``committed_batches`` and skipped
    — its re-written files are deleted, nothing double-appends — so the
    export is exactly-once end to end, the same guarantee the
    foreachBatch batch_id-partition pattern gives parquet sinks
    (streaming/incremental_dedup.py), delivered through the public
    DataSource API instead of a custom sink function."""

    def __init__(self, options: dict, schema: StructType):
        self._w = TsvManifestWriter(options, schema, overwrite=False)
        self.path = self._w.path

    def write(self, iterator: Iterator) -> TsvCommit:
        return self._w.write(iterator)

    def commit(self, messages, batchId: int) -> None:
        old = self._w._load_prior()
        done = set(old.get("committed_batches", [])) if old else set()
        if batchId in done:  # replay: drop the re-written files, change nothing
            self.abort(messages, batchId)
            return
        self._w._publish(
            old["files"] if old else [],
            messages,
            committed_batches=sorted(done | {batchId}),
        )

    def abort(self, messages, batchId: int) -> None:
        self._w.abort(messages)
