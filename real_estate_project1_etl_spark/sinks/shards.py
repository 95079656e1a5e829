"""Deterministic sharded export — the last mile of a training-data
pipeline: the curated corpus leaves as N equal-ish shards whose contents
and order are a pure function of the data (not of partitioning, cluster
size, or execution order), with a manifest of per-shard row counts and
content checksums so a trainer (or a re-run) can verify delivery.

Why determinism matters here: training jobs restart, exports re-run, and
"shard 17 differs this time" is an irreproducible-training bug.  Shard
assignment is a hash of the id column (mod n_shards) and rows are sorted
by id within each shard, so the SAME input always produces byte-stable
shard membership and row order — verified by the manifest checksums,
which are order-sensitive by construction.

Extends the reference's single-file TSV drop (reference: load_db.py:60-73
appends one frame to one table) to a parallel, verifiable N-way export.

Scale shape: one hash exchange on the shard key (repartition(n, key)),
sort within partitions only (no global sort), checksum computed as a
per-shard aggregate of row hashes folded in id order via a window-free
trick: sha of the sorted concatenation is replaced by an ORDER-SENSITIVE
polynomial fold over (rank, row_hash) — computed with one aggregate, no
driver-side data movement.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MANIFEST = "_shards_manifest.json"


def _row_hash(df: DataFrame, id_col: str) -> F.Column:
    # xxhash64 over every column — stable for a fixed schema + values
    return F.xxhash64(*[F.col(c) for c in df.columns])


def write_training_shards(
    df: DataFrame, path: str, n_shards: int, id_col: str
) -> dict:
    """Export ``df`` as ``n_shards`` parquet shards under
    ``path/shard=K/`` with deterministic membership (xxhash64(id) mod n)
    and in-shard order (by id), plus a manifest of per-shard row counts
    and order-sensitive checksums.  Returns the manifest dict.

    The checksum is ``sum(rank * row_hash)`` over the id-sorted shard
    (wrapped 64-bit) — order-sensitive (a swap changes it) and computable
    as one aggregate after the same exchange the write needs anyway.
    """
    if "shard" in df.columns:
        # 'shard' is the export's partition column; silently clobbering a
        # user column of that name would drop it from row hashes AND the
        # re-read data — a corrupted export with a passing manifest
        raise ValueError(
            "df already has a 'shard' column — rename it before export "
            "('shard' is reserved for the shard partition key)"
        )
    shard = (F.xxhash64(F.col(id_col)) % n_shards + n_shards) % n_shards
    prepared = df.withColumn("shard", shard.cast("int"))
    (
        prepared.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    # manifest from what was WRITTEN (read-back): counts + checksums per
    # shard — any nondeterminism between plan and files shows up here.
    # (checksum fold relies on 64-bit wrap-around, i.e. ANSI off — the
    # session factory's default, same contract as minhash_signature)
    written = prepared.sparkSession.read.parquet(path)
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy(id_col)
    per_shard = (
        written.withColumn("rh", _row_hash(written.drop("shard"), id_col))
        .withColumn("rank", F.row_number().over(w))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("rank") * F.col("rh")).alias("checksum"),
        )
    )
    manifest = {
        "n_shards": n_shards,
        "id_col": id_col,
        "shards": {
            str(r.shard): {"n_rows": r.n_rows, "checksum": int(r.checksum or 0)}
            for r in per_shard.collect()
        },
    }
    with open(os.path.join(path, _MANIFEST), "w") as fh:
        json.dump(manifest, fh)
    return manifest


def verify_training_shards(spark, path: str) -> bool:
    """Recompute counts + checksums from the shard files and compare with
    the manifest — the trainer-side delivery check. Raises ``ValueError``
    naming the first bad shard; returns True when everything matches."""
    from pyspark.sql import Window

    with open(os.path.join(path, _MANIFEST)) as fh:
        manifest = json.load(fh)
    df = spark.read.parquet(path)
    id_col = manifest["id_col"]
    w = Window.partitionBy("shard").orderBy(id_col)
    per_shard = {
        str(r.shard): (r.n_rows, int(r.checksum or 0))
        for r in (
            df.withColumn("rh", _row_hash(df.drop("shard"), id_col))
            .withColumn("rank", F.row_number().over(w))
            .groupBy("shard")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("rank") * F.col("rh")).alias("checksum"),
            )
            .collect()
        )
    }
    for k, spec in manifest["shards"].items():
        got = per_shard.get(k)
        if got is None:
            raise ValueError(f"shard {k} missing on disk")
        if got != (spec["n_rows"], spec["checksum"]):
            raise ValueError(
                f"shard {k}: manifest says {spec}, files say "
                f"{{'n_rows': {got[0]}, 'checksum': {got[1]}}}"
            )
    extra = set(per_shard) - set(manifest["shards"])
    if extra:
        raise ValueError(f"unmanifested shards on disk: {sorted(extra)}")
    return True
