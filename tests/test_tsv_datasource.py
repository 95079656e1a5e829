"""tsv_manifest Python DataSource (sinks/tsv_datasource.py): commit
protocol, manifest-gated reads, tamper detection, option/edge paths."""

from __future__ import annotations

import json
import os

import pytest

from real_estate_project1_etl_spark.sinks.tsv_datasource import (
    MANIFEST,
    TsvManifestDataSource,
    TsvManifestWriter,
)


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(TsvManifestDataSource)
    return spark


def _df(spark):
    rows = [(i, f"s{i}" if i % 3 else None, i * 1.5 if i % 4 else None)
            for i in range(50)]
    return spark.createDataFrame(rows, "id bigint, s string, v double")


def test_roundtrip_with_manifest(registered, tmp_path):
    spark = registered
    path = str(tmp_path / "t1")
    df = _df(spark)
    df.repartition(4).write.format("tsv_manifest").mode("append").save(path)
    m = json.load(open(os.path.join(path, MANIFEST)))
    assert m["total_rows"] == 50
    assert m["schema"] == "struct<id:bigint,s:string,v:double>"
    assert sum(f["n_rows"] for f in m["files"]) == 50
    back = spark.read.format("tsv_manifest").load(path)
    assert back.schema.simpleString() == "struct<id:bigint,s:string,v:double>"
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}


def test_reads_are_manifest_gated(registered, tmp_path):
    # an orphan part file (crashed concurrent job, stray copy) is
    # INVISIBLE: only files the manifest names are planned
    spark = registered
    path = str(tmp_path / "t2")
    _df(spark).write.format("tsv_manifest").mode("append").save(path)
    with open(os.path.join(path, "part-orphan.tsv"), "w") as f:
        f.write("999\torphan\t0.0\n")
    back = spark.read.format("tsv_manifest").load(path)
    assert back.count() == 50
    assert not [r for r in back.collect() if r.id == 999]


def test_tamper_detection_fails_read(registered, tmp_path):
    spark = registered
    path = str(tmp_path / "t3")
    _df(spark).write.format("tsv_manifest").mode("append").save(path)
    victim = json.load(open(os.path.join(path, MANIFEST)))["files"][0]["name"]
    with open(os.path.join(path, victim), "a") as f:
        f.write("51\tinjected\t0.0\n")
    with pytest.raises(Exception, match="verification|modified after commit"):
        spark.read.format("tsv_manifest").load(path).collect()


def test_overwrite_mode_replaces_prior_commit(registered, tmp_path):
    spark = registered
    path = str(tmp_path / "t4")
    _df(spark).write.format("tsv_manifest").mode("append").save(path)
    small = spark.createDataFrame([(1, "only", 1.0)],
                                  "id bigint, s string, v double")
    small.coalesce(1).write.format("tsv_manifest").mode("overwrite").save(path)
    back = spark.read.format("tsv_manifest").load(path)
    assert [tuple(r) for r in back.collect()] == [(1, "only", 1.0)]
    # no stale part files left behind
    parts = [n for n in os.listdir(path) if n.startswith("part-")]
    assert len(parts) == 1


def test_abort_leaves_no_temp_files(registered, tmp_path, spark):
    path = str(tmp_path / "t5")
    schema = _df(spark).schema
    w = TsvManifestWriter({"path": path}, schema, overwrite=False)
    msg = w.write(iter([(1, "a", 1.0), (2, "b", 2.0)]))
    assert os.path.exists(os.path.join(path, msg.name))
    w.abort([msg, None])
    assert os.listdir(path) == []  # as if the job never ran


def test_separator_in_value_rejected(registered, tmp_path, spark):
    path = str(tmp_path / "t6")
    bad = spark.createDataFrame([(1, "tab\there", 0.0)],
                                "id bigint, s string, v double")
    with pytest.raises(Exception, match="separator|corrupt"):
        bad.write.format("tsv_manifest").mode("append").save(path)
    # the failed job must not leave a manifest (nothing committed)
    assert not os.path.exists(os.path.join(path, MANIFEST))


def test_custom_null_marker_distinguishes_empty_string(registered, tmp_path):
    spark = registered
    path = str(tmp_path / "t7")
    df = spark.createDataFrame([(1, ""), (2, None)], "id bigint, s string")
    df.coalesce(1).write.format("tsv_manifest").option(
        "null_marker", "\\N"
    ).mode("append").save(path)
    got = {r.id: r.s for r in
           spark.read.format("tsv_manifest").load(path).collect()}
    assert got == {1: "", 2: None}


def test_unsupported_type_rejected(registered, tmp_path, spark):
    path = str(tmp_path / "t8")
    df = spark.createDataFrame([([1, 2],)], "a array<bigint>")
    with pytest.raises(Exception, match="unsupported column type"):
        df.write.format("tsv_manifest").mode("append").save(path)


def test_append_merges_prior_commit(registered, tmp_path):
    spark = registered
    path = str(tmp_path / "t9")
    _df(spark).write.format("tsv_manifest").mode("append").save(path)
    _df(spark).write.format("tsv_manifest").mode("append").save(path)
    m = json.load(open(os.path.join(path, MANIFEST)))
    assert m["total_rows"] == 100  # both commits visible
    assert spark.read.format("tsv_manifest").load(path).count() == 100
    # appending with a different schema is refused, prior commit intact
    other = spark.createDataFrame([(1,)], "x bigint")
    with pytest.raises(Exception, match="different schema"):
        other.write.format("tsv_manifest").mode("append").save(path)
    assert spark.read.format("tsv_manifest").load(path).count() == 100


def test_streaming_writer_exactly_once(registered, tmp_path):
    # writeStream.format('tsv_manifest'): per-batch manifest update with
    # the batch id recorded; a replayed batch id is skipped (no double
    # append), and the export continues across restarts
    spark = registered
    src = str(tmp_path / "s_src")
    path = str(tmp_path / "s_out")
    ck = str(tmp_path / "s_ck")

    def feed(rows):
        spark.createDataFrame(rows, "id bigint, s string").coalesce(
            1
        ).write.mode("append").parquet(src)

    def run_once():
        q = (
            spark.readStream.schema("id bigint, s string").parquet(src)
            .writeStream.format("tsv_manifest")
            .option("path", path)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    feed([(1, "a"), (2, "b")])
    run_once()
    m1 = json.load(open(os.path.join(path, MANIFEST)))
    assert m1["total_rows"] == 2 and m1["committed_batches"] == [0]

    feed([(3, "c")])
    run_once()
    m2 = json.load(open(os.path.join(path, MANIFEST)))
    assert m2["total_rows"] == 3
    assert m2["committed_batches"] == [0, 1]
    back = spark.read.format("tsv_manifest").load(path)
    assert {(r.id, r.s) for r in back.collect()} == {(1, "a"), (2, "b"), (3, "c")}

    # simulate a replay of batch 1: commit again with the same id — the
    # manifest must not change and the temps must be cleaned up
    from real_estate_project1_etl_spark.sinks.tsv_datasource import (
        TsvManifestStreamWriter,
    )
    from pyspark.sql.types import StructType

    w = TsvManifestStreamWriter(
        {"path": path}, StructType.fromDDL("id bigint, s string")
    )
    msg = w.write(iter([(3, "c")]))
    w.commit([msg], batchId=1)
    m3 = json.load(open(os.path.join(path, MANIFEST)))
    assert m3 == m2  # unchanged — and the replay's re-written file is gone
    committed = {f["name"] for f in m3["files"]}
    on_disk = {n for n in os.listdir(path) if n.startswith("part-")}
    assert on_disk == committed
    assert spark.read.format("tsv_manifest").load(path).count() == 3


def test_stats_pruning_skips_files_at_planning(registered, tmp_path):
    # per-file min/max stats in the manifest + option('prune') + the
    # pushFilters session flag prune whole files at PLANNING time.
    # Proof is behavioral: a file outside the predicate's range is
    # tampered post-commit (reading it would fail verification loudly),
    # so a pruned read succeeds while an unpruned one fails.
    spark = registered
    path = str(tmp_path / "t10")
    df = spark.range(100).selectExpr("id", "cast(id * 1.5 as double) AS v")
    # range-partition so each file holds a disjoint id range with stats
    df.repartitionByRange(4, "id").write.format("tsv_manifest").mode(
        "append"
    ).save(path)
    m = json.load(open(os.path.join(path, MANIFEST)))
    assert all("id" in f["stats"] and "v" in f["stats"] for f in m["files"])
    # default reader (no option) under default conf: full scan works
    assert (
        spark.read.format("tsv_manifest").load(path).filter("id < 10").count()
        == 10
    )
    # tamper with the file holding id=99 (the top range)
    victim = max(m["files"], key=lambda f: f["stats"]["id"][1])["name"]
    with open(os.path.join(path, victim), "a") as f:
        f.write("999\t0.0\n")

    old = spark.conf.get("spark.sql.python.filterPushdown.enabled", None)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        pruned = (
            spark.read.format("tsv_manifest")
            .option("prune", "true")
            .load(path)
            .filter("id < 10")
        )
        assert pruned.count() == 10  # tampered file never planned
        with pytest.raises(Exception, match="verification|modified"):
            (
                spark.read.format("tsv_manifest")
                .option("prune", "true")
                .load(path)
                .filter("id >= 90")  # overlaps the tampered file
                .collect()
            )
    finally:
        if old is None:
            spark.conf.unset("spark.sql.python.filterPushdown.enabled")
        else:
            spark.conf.set("spark.sql.python.filterPushdown.enabled", old)
    # the default reader plans EVERY file (no pruning), so the tampered
    # file is read and verification fails loudly — the pruned success
    # above really did come from planning-time file skipping
    with pytest.raises(Exception, match="verification|modified"):
        spark.read.format("tsv_manifest").load(path).filter("id < 10").collect()


def test_boolean_roundtrip(registered, tmp_path):
    # str(True) is "True" but the parser's marker is lowercase — the
    # writer serializes booleans canonically so the roundtrip holds
    spark = registered
    path = str(tmp_path / "t11")
    df = spark.createDataFrame(
        [(1, True), (2, False), (3, None)], "id bigint, b boolean"
    )
    df.coalesce(1).write.format("tsv_manifest").mode("append").save(path)
    got = {r.id: r.b for r in
           spark.read.format("tsv_manifest").load(path).collect()}
    assert got == {1: True, 2: False, 3: None}


def test_nan_values_never_poison_stats_pruning(registered, tmp_path):
    # NaN comparisons are always False: folding NaN would freeze a
    # file's stats at [NaN, NaN] and pruning would wrongly drop it —
    # silent row loss. NaN is skipped in the fold; real rows survive.
    spark = registered
    path = str(tmp_path / "t12")
    df = spark.createDataFrame(
        [(1, float("nan")), (2, 1.0), (3, 5.0)], "id bigint, v double"
    )
    df.coalesce(1).write.format("tsv_manifest").mode("append").save(path)
    m = json.load(open(os.path.join(path, MANIFEST)))
    assert m["files"][0]["stats"]["v"] == [1.0, 5.0]  # NaN skipped
    old = spark.conf.get("spark.sql.python.filterPushdown.enabled", None)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        got = (
            spark.read.format("tsv_manifest").option("prune", "true")
            .load(path).filter("v > 0").count()
        )
        # the file is NOT pruned (the pre-fix [NaN, NaN] stats dropped
        # it wholesale); Spark's NaN ordering treats NaN as larger than
        # every double, so the NaN row itself also passes v > 0 -> 3
        assert got == 3
    finally:
        if old is None:
            spark.conf.unset("spark.sql.python.filterPushdown.enabled")
        else:
            spark.conf.set("spark.sql.python.filterPushdown.enabled", old)


def test_null_marker_validation(registered, tmp_path, spark):
    # a value equal to the marker would silently read back as NULL
    path = str(tmp_path / "t13")
    df = spark.createDataFrame([(1, "\\N")], "id bigint, s string")
    with pytest.raises(Exception, match="collides with the null_marker"):
        df.write.format("tsv_manifest").option("null_marker", "\\N").mode(
            "append"
        ).save(path)
    # a marker containing the separator would corrupt the file structure
    with pytest.raises(Exception, match="null_marker must not contain"):
        df.write.format("tsv_manifest").option("null_marker", "a\tb").mode(
            "append"
        ).save(path)


def test_batch_append_preserves_stream_replay_marker(registered, tmp_path):
    # a one-off batch append between stream commits must carry
    # committed_batches forward, else a stream replay double-appends
    spark = registered
    from pyspark.sql.types import StructType

    from real_estate_project1_etl_spark.sinks.tsv_datasource import (
        TsvManifestStreamWriter,
    )

    path = str(tmp_path / "t14")
    schema = StructType.fromDDL("id bigint, s string")
    sw = TsvManifestStreamWriter({"path": path}, schema)
    sw.commit([sw.write(iter([(1, "a")]))], batchId=0)
    # batch append in between
    spark.createDataFrame([(2, "b")], "id bigint, s string").coalesce(
        1
    ).write.format("tsv_manifest").mode("append").save(path)
    m = json.load(open(os.path.join(path, MANIFEST)))
    assert m["committed_batches"] == [0]  # marker survived the batch write
    # stream replay of batch 0 is still detected and skipped
    sw2 = TsvManifestStreamWriter({"path": path}, schema)
    sw2.commit([sw2.write(iter([(1, "a")]))], batchId=0)
    assert spark.read.format("tsv_manifest").load(path).count() == 2


def test_overwrite_crash_before_publish_preserves_prior_commit(
    registered, tmp_path, monkeypatch
):
    # overwrite publishes the NEW manifest first, then GCs old files — a
    # crash anywhere before the publish leaves the prior commit intact
    spark = registered
    from real_estate_project1_etl_spark.sinks import tsv_datasource as mod

    path = str(tmp_path / "t15")
    df = spark.createDataFrame([(1, "a")], "id bigint, s string")
    df.coalesce(1).write.format("tsv_manifest").mode("append").save(path)

    w = mod.TsvManifestWriter(
        {"path": path}, df.schema, overwrite=True
    )
    msg = w.write(iter([(9, "z")]))
    monkeypatch.setattr(
        mod.TsvManifestWriter, "_publish",
        lambda *a, **k: (_ for _ in ()).throw(OSError("crash")),
    )
    with pytest.raises(OSError):
        w.commit([msg])
    monkeypatch.undo()
    back = spark.read.format("tsv_manifest").load(path)
    assert [tuple(r) for r in back.collect()] == [(1, "a")]  # intact
