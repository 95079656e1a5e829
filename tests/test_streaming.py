"""Event-time streaming operators: watermark windows, session windows,
stateful dedup — run against a rate-limited file stream of the events
table so real micro-batches execute."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_estate_project1_etl_spark.sources.parquet import load_table
from real_estate_project1_etl_spark.streaming.windows import (
    hourly_event_counts,
    sessionized_events,
    sliding_event_rate,
    stateful_dedup,
)


@pytest.fixture(scope="module")
def events_batch(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def _run_stream(spark, events_batch, op, tmp_path, name, output_mode="append"):
    """Feed the events through a real file stream (parquet source) and run
    the streaming op with an AvailableNow trigger into a memory sink."""
    src = str(tmp_path / f"src_{name}")
    events_batch.write.parquet(src)
    stream = spark.readStream.schema(events_batch.schema).parquet(src)
    q = (
        op(stream)
        .writeStream.format("memory")
        .queryName(f"mem_{name}")
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.table(f"mem_{name}")


def test_hourly_counts_stream_matches_batch(spark, events_batch, tmp_path):
    out = _run_stream(spark, events_batch, hourly_event_counts, tmp_path, "hourly")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in out.collect()
    }
    exp = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in hourly_event_counts(events_batch).collect()
    }
    # watermark may hold back the tail window(s) in append mode; everything
    # emitted must match batch exactly
    assert got
    for k, v in got.items():
        assert exp[k] == v


def test_sessionization_stream(spark, events_batch, tmp_path):
    out = _run_stream(spark, events_batch, sessionized_events, tmp_path, "sess")
    rows = out.collect()
    assert rows
    batch = {
        (r.user_id, r.session_start): r.n_events
        for r in sessionized_events(events_batch).collect()
    }
    for r in rows:
        assert batch[(r.user_id, r.session_start)] == r.n_events


def test_sliding_rate_stream(spark, events_batch, tmp_path):
    out = _run_stream(spark, events_batch, sliding_event_rate, tmp_path, "slide")
    assert out.count() > 0


def test_stateful_dedup_stream(spark, events_batch, tmp_path):
    out = _run_stream(spark, events_batch, stateful_dedup, tmp_path, "dedup")
    n = out.count()
    distinct_keys = events_batch.select("user_id", "event_type").distinct().count()
    # within-watermark dedup can keep more than global distinct (keys recur
    # beyond the horizon) but never fewer, and never more than the input
    assert distinct_keys <= n <= events_batch.count()


def test_state_store_provider_is_rocksdb(spark, events_batch, tmp_path):
    # round-2/3 verdict item: RocksDB must be the DEFAULT state store (the
    # HDFS map store keeps all state on-heap and OOMs on large dedup state
    # at 100 TB). Assert the session conf AND that a stateful query really
    # ran under RocksDB — its lastProgress carries rocksdb* custom metrics,
    # which the map store never emits.
    assert "RocksDBStateStoreProvider" in spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass"
    )
    src = str(tmp_path / "src_rocksdb")
    events_batch.limit(200).write.parquet(src)
    stream = spark.readStream.schema(events_batch.schema).parquet(src)
    q = (
        stateful_dedup(stream)
        .writeStream.format("memory")
        .queryName("mem_rocksdb_probe")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    metrics = q.lastProgress["stateOperators"][0]["customMetrics"]
    assert any(k.startswith("rocksdb") for k in metrics), sorted(metrics)[:8]


def test_stateful_running_user_stats(spark, events_batch, tmp_path):
    from real_estate_project1_etl_spark.streaming.stateful import running_user_stats

    src = str(tmp_path / "src_state")
    events_batch.write.parquet(src)
    stream = spark.readStream.schema(events_batch.schema).parquet(src)
    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("mem_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # last update per user must equal the batch aggregate
    got = {
        r.user_id: (r.n_events, round(r.total_value, 2))
        for r in spark.table("mem_state").collect()
    }
    exp = {
        r.user_id: (r.n_events, round(r.total_value, 2))
        for r in running_user_stats(events_batch).collect()
    }
    assert got == exp


def test_streaming_per_key_cap_admission_and_restart(spark, tmp_path):
    # stream twin of quality.cap_per_key: at most n admissions per key,
    # O(1) counter state per key, exactly min(n, seen) rows emitted, and
    # the admission count survives a query restart via the checkpoint.
    import pandas as pd

    from real_estate_project1_etl_spark.streaming.stateful import (
        capped_corpus_stream,
    )

    src = str(tmp_path / "cap_src")
    ck = str(tmp_path / "cap_ck")
    out = str(tmp_path / "cap_out")
    schema = "source string, doc_id long"

    def write_file(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    # file 1: 5 docs per key -> fills the n=3 cap for both keys
    write_file([("a", i) for i in range(5)] + [("b", 100 + i) for i in range(5)])

    def run_once():
        # parquet sink: supports checkpoint RECOVERY (the memory sink does
        # not), so the second run genuinely restarts the same query
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            capped_corpus_stream(stream, "source", "doc_id", n=3)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()
    first = {(r.source, r.doc_id) for r in spark.read.parquet(out).collect()}
    counts = pd.Series([k for k, _ in first]).value_counts().to_dict()
    assert counts == {"a": 3, "b": 3}

    # single-batch equivalence: all data arrived in one batch, so the
    # stream's admitted set equals the batch cap's selected set
    batch = spark.read.parquet(src)
    want = {
        (r.source, r.doc_id)
        for r in capped_corpus_stream(batch, "source", "doc_id", n=3).collect()
    }
    assert first == want

    # file 2 after restart: keys a/b are already at the cap (the counter
    # state persisted in the checkpoint -> ZERO new emissions for them),
    # while the unseen key c admits both its docs
    write_file([("a", 50), ("b", 150), ("c", 200), ("c", 201)])
    run_once()
    after = {(r.source, r.doc_id) for r in spark.read.parquet(out).collect()}
    assert after == first | {("c", 200), ("c", 201)}


def test_streaming_cap_admission_spans_arrow_chunks(spark, tmp_path):
    # regression (round-4 review): applyInPandasWithState delivers a key's
    # rows as an ITERATOR of Arrow chunks; a chunk-local sort admitted the
    # first chunk's smallest hashes while later chunks held globally
    # smaller ones. Force 3-row chunks and assert the admitted set equals
    # the batch cap's globally-smallest-hash set.
    from real_estate_project1_etl_spark.operators.quality import cap_per_key
    from real_estate_project1_etl_spark.streaming.stateful import (
        capped_corpus_stream,
    )

    src = str(tmp_path / "chunk_src")
    schema = "source string, doc_id long"
    rows = [("a", i) for i in range(40)]
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            capped_corpus_stream(stream, "source", "doc_id", n=4)
            .writeStream.format("memory")
            .queryName("mem_chunk_cap")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "chunk_ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    got = {r.doc_id for r in spark.table("mem_chunk_cap").collect()}
    want = {
        r.doc_id
        for r in cap_per_key(
            spark.createDataFrame(rows, schema), ["source"], 4, ["doc_id"]
        ).collect()
    }
    assert got == want and len(got) == 4


def test_stream_static_enrichment(spark, events_batch, tmp_path):
    from real_estate_project1_etl_spark.sources.parquet import load_table
    from real_estate_project1_etl_spark.streaming.windows import enrich_with_dim

    dim = load_table(spark, "/root/testdata/sf0.001", "customer")
    out = _run_stream(
        spark,
        events_batch,
        lambda s: enrich_with_dim(s, dim),
        tmp_path,
        "enrich",
    )
    batch = enrich_with_dim(events_batch, dim)
    assert out.count() == batch.count()
    got = {(r.event_id, r.c_name) for r in out.select("event_id", "c_name").collect()}
    exp = {(r.event_id, r.c_name) for r in batch.select("event_id", "c_name").collect()}
    assert got == exp


def test_stream_stream_attribution_matches_batch(spark, events_batch, tmp_path):
    from real_estate_project1_etl_spark.streaming.windows import (
        click_purchase_attribution,
    )

    out = _run_stream(
        spark, events_batch, click_purchase_attribution, tmp_path, "attr"
    )
    got = {(r.click_id, r.purchase_id, r.gap_ms) for r in out.collect()}
    exp = {
        (r.click_id, r.purchase_id, r.gap_ms)
        for r in click_purchase_attribution(events_batch).collect()
    }
    # stream-stream inner join emits matches as both sides arrive; with
    # AvailableNow over a finite source every in-horizon pair must appear
    assert got == exp
    assert exp, "fixture produced no attributable pairs"


def test_transform_with_state_record_highs(spark, events_batch, tmp_path):
    from real_estate_project1_etl_spark.streaming.stateful import record_high_events

    out = _run_stream(
        spark, events_batch, record_high_events, tmp_path, "rhigh",
        output_mode="append",
    )
    got = {(r.user_id, r.event_id, r.value) for r in out.collect()}
    exp = {
        (r.user_id, r.event_id, r.value)
        for r in record_high_events(events_batch).collect()
    }
    assert got == exp
    assert exp  # fixture produces record highs


def test_state_carries_across_micro_batches(spark, events_batch, tmp_path):
    # 3 files x maxFilesPerTrigger=1 -> 3 micro-batches; per-user counts in
    # the FINAL update row must equal the batch aggregate regardless of the
    # order files were consumed (count/sum/max are order-insensitive)
    from real_estate_project1_etl_spark.streaming.stateful import running_user_stats

    src = str(tmp_path / "src_multi")
    events_batch.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(events_batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("mem_multi")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # several update rows per user (one per batch that touched the key);
    # the final state is the row with the highest n_events
    rows = spark.table("mem_multi").collect()
    assert len({r.user_id for r in rows}) < len(rows), "expected multiple batches"
    final = {}
    for r in rows:
        if r.user_id not in final or r.n_events > final[r.user_id].n_events:
            final[r.user_id] = r
    exp = {r.user_id: r for r in running_user_stats(events_batch).collect()}
    assert set(final) == set(exp)
    for uid, r in final.items():
        assert r.n_events == exp[uid].n_events
        assert abs(r.total_value - round(exp[uid].total_value, 2)) < 1e-9


def test_curation_chain_is_streaming_safe(spark, sf_dir, tmp_path):
    """The documents curation chain (markup strip -> PII scrub -> quality
    gate -> exact dedup) runs unchanged as a streaming query: every step
    is a stateless Column expression except the dedup, which swaps the
    batch row_number window for streaming dropDuplicates state."""
    from real_estate_project1_etl_spark.operators import textstats as T
    from real_estate_project1_etl_spark.operators.dedup import content_fingerprint

    docs = load_table(spark, sf_dir, "documents")

    def curate_stateless(df):
        cleaned = df.select(
            "doc_id", T.scrub_pii(T.strip_markup(F.col("text"))).alias("t")
        )
        return cleaned.select(
            "doc_id",
            T.whitespace_token_count(F.col("t")).alias("n_tokens"),
            content_fingerprint(F.col("t")).alias("fp"),
        ).filter(F.col("n_tokens") >= 20)

    src = str(tmp_path / "docs_src")
    docs.write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = (
        curate_stateless(stream)
        .dropDuplicates(["fp"])
        .writeStream.format("memory")
        .queryName("mem_curation")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = spark.table("mem_curation")

    batch = curate_stateless(docs)
    # same surviving content set (streaming keeps first-seen per digest,
    # batch keeps lowest doc_id — ids may differ, content may not)
    got_fps = sorted(r["fp"] for r in out.select("fp").collect())
    exp_fps = sorted(
        r["fp"] for r in batch.select("fp").distinct().collect()
    )
    assert got_fps == exp_fps
    # exactly one survivor per digest
    assert out.count() == len(exp_fps)


def test_streaming_transitions_match_batch(spark, events_batch, tmp_path):
    from real_estate_project1_etl_spark.streaming.stateful import transition_events

    out = _run_stream(spark, events_batch, transition_events, tmp_path, "trans")
    got = {
        (r.from_type, r.to_type): r.n
        for r in out.groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    exp = {
        (r.from_type, r.to_type): r.n
        for r in transition_events(events_batch)
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == exp and len(got) > 0


def test_streaming_transitions_state_spans_batches(spark, events_batch, tmp_path):
    # two time-ordered file drops: the cross-boundary transition (last
    # event of drop 1 -> first event of drop 2 per user) must be emitted,
    # proving the last-type state carries across micro-batches
    from real_estate_project1_etl_spark.streaming.stateful import transition_events

    ev = events_batch.orderBy("ts", "event_id").limit(2000).localCheckpoint()
    cut = ev.selectExpr("percentile(cast(ts as long), 0.5) as c").first()["c"]
    first = ev.filter(F.col("ts").cast("long") <= cut)
    second = ev.filter(F.col("ts").cast("long") > cut)
    src = str(tmp_path / "src_trans2")
    first.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(ev.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = (
        transition_events(stream)
        .writeStream.format("memory")
        .queryName("mem_trans2")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        import time as _t

        deadline = _t.time() + 120
        while spark.table("mem_trans2").count() == 0 and _t.time() < deadline:
            _t.sleep(1)
        second.coalesce(1).write.mode("append").parquet(src)
        exp_n = transition_events(ev).count()
        while spark.table("mem_trans2").count() < exp_n and _t.time() < deadline:
            _t.sleep(1)
    finally:
        q.stop()
    got = {
        (r.from_type, r.to_type): r.n
        for r in spark.table("mem_trans2")
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    exp = {
        (r.from_type, r.to_type): r.n
        for r in transition_events(ev)
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == exp


def test_streaming_maintained_view_exactly_once(spark, events_batch, tmp_path):
    from real_estate_project1_etl_spark.operators.ivm import (
        build_count_sum_agg,
        streaming_view_sink,
    )
    from real_estate_project1_etl_spark.sinks import versioned as V

    src = str(tmp_path / "src_view")
    view = str(tmp_path / "agg_view")
    ckpt = str(tmp_path / "ckpt_view")
    events_batch.write.parquet(src)

    def run(checkpoint):
        stream = spark.readStream.schema(events_batch.schema).option(
            "maxFilesPerTrigger", "1"
        ).parquet(src)
        q = (
            stream.writeStream.foreachBatch(
                streaming_view_sink(view, "viewapp", "event_type", "value")
            )
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run(ckpt)
    exp = {
        r["grp"]: (r["n_rows"], float(r["total"]))
        for r in build_count_sum_agg(events_batch, "event_type", "value").collect()
    }
    got = {
        r["grp"]: (r["n_rows"], float(r["total"]))
        for r in V.read_snapshot(spark, view).collect()
    }
    assert got == exp

    # wiped checkpoint: every batch re-delivers from scratch — the txn
    # watermark must no-op them all, leaving the view un-double-counted
    run(str(tmp_path / "ckpt_view_2"))
    got2 = {
        r["grp"]: (r["n_rows"], float(r["total"]))
        for r in V.read_snapshot(spark, view).collect()
    }
    assert got2 == exp


def test_silent_user_detector_times_out(spark, tmp_path):
    import time as _t

    from real_estate_project1_etl_spark.streaming.stateful import silent_user_detector

    src = str(tmp_path / "src_silence")
    drop1 = spark.createDataFrame(
        [(1, 7, "2024-01-01 00:00:01"), (2, 8, "2024-01-01 00:00:02")],
        "event_id long, user_id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    drop1.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(drop1.schema).parquet(src)
    q = (
        silent_user_detector(stream, timeout_ms=6000)
        .writeStream.format("memory")
        .queryName("mem_silence")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = _t.time() + 120
        mem = lambda st: spark.table("mem_silence").filter(F.col("status") == st)
        while mem("active").count() < 2 and _t.time() < deadline:
            _t.sleep(0.5)
        # user 7 heartbeats well inside the window -> its timer resets;
        # user 8 stays quiet -> its timer (from drop 1) fires first
        spark.createDataFrame(
            [(3, 7, "2024-01-01 00:01:00")], "event_id long, user_id long, ts string"
        ).withColumn("ts", F.to_timestamp("ts")).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        while mem("silent").count() < 1 and _t.time() < deadline:
            _t.sleep(0.3)
        first_silent = {r["user_id"] for r in mem("silent").collect()}
    finally:
        q.stop()
    # 8's un-reset timer fires before 7's heartbeat-extended one
    assert 8 in first_silent and 7 not in first_silent
    # the heartbeat produced a second active row for 7 before any silence
    assert (
        spark.table("mem_silence")
        .filter((F.col("status") == "active") & (F.col("user_id") == 7))
        .count()
        >= 2
    )


def test_stream_stream_outer_attribution(spark, events_batch, tmp_path):
    from real_estate_project1_etl_spark.streaming.windows import (
        click_purchase_attribution_outer,
    )

    out = _run_stream(
        spark, events_batch, click_purchase_attribution_outer, tmp_path, "oattr"
    )
    got_matched = {
        (r.click_id, r.purchase_id, r.gap_ms)
        for r in out.collect()
        if r.purchase_id is not None
    }
    got_null = {r.click_id for r in out.collect() if r.purchase_id is None}
    batch = click_purchase_attribution_outer(events_batch).collect()
    exp_matched = {
        (r.click_id, r.purchase_id, r.gap_ms)
        for r in batch
        if r.purchase_id is not None
    }
    exp_null = {r.click_id for r in batch if r.purchase_id is None}
    # inner results must be complete and exact
    assert got_matched == exp_matched and exp_matched
    # null (unmatched) emissions happen via state eviction: everything
    # emitted must be a true batch-unmatched click; the stream may hold
    # back tail clicks whose deadline the final watermark never passed
    assert got_null <= exp_null
    assert got_null, "watermark never evicted any unmatched click"


def test_streaming_kmv_matches_batch_sketch(spark, events_batch, tmp_path):
    # the bottom-k hash state merged across micro-batches must converge to
    # EXACTLY the batch sketch (k smallest of a union = k smallest of
    # per-batch k-smallest) — split the stream into 2 file drops to force
    # a real merge, then compare the final emission per key bit-for-bit
    from real_estate_project1_etl_spark.operators.sketch import kmv_distinct
    from real_estate_project1_etl_spark.streaming.stateful import (
        streaming_kmv_distinct,
    )

    ev = events_batch.select("event_type", "user_id", "event_id")
    half_a = ev.filter(F.col("event_id") % 2 == 0)
    half_b = ev.filter(F.col("event_id") % 2 == 1)
    src = str(tmp_path / "src_kmv")
    half_a.coalesce(1).write.parquet(src)
    half_b.coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(ev.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    q = (
        streaming_kmv_distinct(stream, k=32)
        .writeStream.format("memory")
        .queryName("mem_kmv")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = spark.table("mem_kmv").toPandas()
    # final state per key = the emission with the smallest kth_hash (the
    # retained set only ever gets smaller-valued as more hashes merge in)
    final = out.loc[out.groupby("event_type")["kth_hash"].idxmin()]
    got = {
        r.event_type: (r.n_sample, r.kth_hash, r.kmv_estimate)
        for r in final.itertuples()
    }
    exp = {
        r.event_type: (r.n_sample, r.kth_hash, r.kmv_estimate)
        for r in kmv_distinct(ev, ["event_type"], "user_id", k=32).collect()
    }
    assert got == exp


def test_state_store_env_normalized_and_validated(monkeypatch):
    # ADVICE round 4: 'HDFS'/' Hdfs ' must select the HDFS provider; an
    # unrecognized value must raise instead of silently picking RocksDB
    # (which breaks restarts on pre-existing HDFS-provider checkpoints)
    from real_estate_project1_etl_spark.session import _state_store_provider_class

    for spelling in ("hdfs", "HDFS", " Hdfs "):
        monkeypatch.setenv("SPARK_GRAFT_STATE_STORE", spelling)
        assert _state_store_provider_class().endswith(
            "HDFSBackedStateStoreProvider"
        ), spelling
    for spelling in ("rocksdb", "RocksDB", ""):
        monkeypatch.setenv("SPARK_GRAFT_STATE_STORE", spelling)
        assert _state_store_provider_class().endswith(
            "RocksDBStateStoreProvider"
        ), spelling
    monkeypatch.delenv("SPARK_GRAFT_STATE_STORE", raising=False)
    assert _state_store_provider_class().endswith("RocksDBStateStoreProvider")

    monkeypatch.setenv("SPARK_GRAFT_STATE_STORE", "hdsf")  # typo
    import pytest

    with pytest.raises(ValueError, match="hdsf"):
        _state_store_provider_class()


def test_streaming_cap_generic_string_ids_and_composite_keys(spark, tmp_path):
    # round-4 verdict item 6: the old cap hard-coded `key string, id long`
    # schemas; crawl corpora key docs by string ids and cap by composite
    # keys (domain, lang). Schemas now derive from the input DataFrame —
    # assert admission works and single-batch == batch-cap equivalence
    # holds for (string, string) composite keys with string doc ids.
    from real_estate_project1_etl_spark.streaming.stateful import (
        capped_corpus_stream,
    )

    src = str(tmp_path / "gcap_src")
    schema = "domain string, lang string, doc_id string"
    rows = (
        [("x.com", "en", f"doc-{i:03d}") for i in range(6)]
        + [("x.com", "de", f"doc-{100 + i:03d}") for i in range(2)]
        + [("y.org", "en", f"doc-{200 + i:03d}") for i in range(4)]
    )
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        capped_corpus_stream(stream, ["domain", "lang"], "doc_id", n=3)
        .writeStream.format("memory")
        .queryName("mem_generic_cap")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "gcap_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r.domain, r.lang, r.doc_id)
        for r in spark.table("mem_generic_cap").collect()
    }
    import pandas as pd

    counts = (
        pd.Series([(d, lg) for d, lg, _ in got]).value_counts().to_dict()
    )
    assert counts == {("x.com", "en"): 3, ("x.com", "de"): 2, ("y.org", "en"): 3}

    # single-batch equivalence against the fully generic batch cap
    batch = spark.read.parquet(src)
    want = {
        (r.domain, r.lang, r.doc_id)
        for r in capped_corpus_stream(
            batch, ["domain", "lang"], "doc_id", n=3
        ).collect()
    }
    assert got == want

    # missing column -> loud error, not a silent schema mismatch
    import pytest

    with pytest.raises(ValueError, match="nope"):
        capped_corpus_stream(stream, ["domain", "nope"], "doc_id", n=3)


def test_statestore_reader_exposes_admission_counters(spark, tmp_path):
    # Spark 4 state data source: the per-key admission counters of a
    # capped_corpus_stream checkpoint are directly queryable — no sink
    # reconstruction, no running query — and track the cap across
    # incremental batches.
    from real_estate_project1_etl_spark.streaming.stateful import (
        capped_corpus_stream,
        read_admission_state,
    )

    src = str(tmp_path / "ss_src")
    ck = str(tmp_path / "ss_ck")
    out = str(tmp_path / "ss_out")
    schema = "source string, doc_id long"

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            capped_corpus_stream(stream, "source", "doc_id", n=3)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    spark.createDataFrame(
        [("a", i) for i in range(5)] + [("b", 100 + i) for i in range(2)],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)
    run_once()
    state = {
        r["source"]: r["admitted"]
        for r in read_admission_state(spark, ck).collect()
    }
    # a hit the cap, b admitted everything it saw
    assert state == {"a": 3, "b": 2}

    # next batch: b tops up to the cap, new key c appears in state
    spark.createDataFrame(
        [("b", 102), ("b", 103), ("c", 200)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    run_once()
    state2 = {
        r["source"]: r["admitted"]
        for r in read_admission_state(spark, ck).collect()
    }
    assert state2 == {"a": 3, "b": 3, "c": 1}
    # the counters agree with what the sink actually holds
    sink_counts = {
        r["source"]: r["n"]
        for r in spark.read.parquet(out)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert sink_counts == state2


def test_content_change_feed_stream_matches_batch(spark, tmp_path):
    # recrawl versions: doc 1 unchanged x3 (one emission), doc 2 changes
    # every version, doc 3 change->revert->same, doc 4 text nulled out
    from real_estate_project1_etl_spark.streaming.stateful import (
        content_change_feed,
    )

    versions = spark.createDataFrame(
        [
            (1, 0, "alpha"), (1, 1, "alpha"), (1, 2, "alpha"),
            (2, 0, "v0"), (2, 1, "v1"), (2, 2, "v2"),
            (3, 0, "x"), (3, 1, "y"), (3, 2, "y"), (3, 3, "x"),
            (4, 0, "content"), (4, 1, None),
        ],
        "doc_id long, seq long, text string",
    )
    out = _run_stream(
        spark, versions, content_change_feed, tmp_path, "cfeed",
        output_mode="append",
    )
    got = {(r.doc_id, r.seq): r.status for r in out.collect()}
    exp = {
        (r.doc_id, r.seq): r.status
        for r in content_change_feed(versions).collect()
    }
    assert got == exp
    assert exp[(1, 0)] == "added" and (1, 1) not in exp and (1, 2) not in exp
    assert exp[(2, 1)] == "changed" and exp[(2, 2)] == "changed"
    # revert re-emits (state holds only the LAST digest, by design)
    assert exp[(3, 3)] == "changed" and (3, 2) not in exp
    assert exp[(4, 1)] == "changed"  # NULLed text is a content change


def test_streaming_classifier_gate_matches_batch(spark, sf_dir, tmp_path):
    """Round-10: the trained quality classifier runs as a streaming
    ingest gate via foreachBatch (weights fit once in batch, every
    micro-batch scored with the same broadcast table) — kept set
    identical to batch inference over the same corpus."""
    from real_estate_project1_etl_spark.operators.quality import (
        hashed_linear_classifier,
        train_hashed_classifier,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    labeled = docs.withColumn(
        "label", (F.col("doc_id") % 2 == 0).cast("int")
    )
    weights = train_hashed_classifier(
        labeled, dim=512, n_iters=3, lr_den=64
    ).localCheckpoint(eager=True)

    # threshold at the batch median score so the gate genuinely splits
    # the corpus (doc_id-parity labels learn weak signal on real text;
    # a fixed 0 cutoff can degenerate to keep-all)
    scores = hashed_linear_classifier(
        docs, weights, dim=512, threshold_milli=0
    ).select("doc_id", "score_milli")
    thr = int(
        sorted(r["score_milli"] for r in scores.collect())[docs.count() // 2]
    )
    batch_kept = {
        r["doc_id"]
        for r in hashed_linear_classifier(
            docs, weights, dim=512, threshold_milli=thr
        )
        .filter("kept")
        .collect()
    }

    src = str(tmp_path / "docs_src")
    out_dir = str(tmp_path / "gated")
    docs.write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)

    def gate(mb, batch_id):
        kept = hashed_linear_classifier(
            mb, weights, dim=512, threshold_milli=thr
        ).filter("kept")
        kept.write.mode("append").parquet(out_dir)

    q = (
        stream.writeStream.foreachBatch(gate)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    assert got == batch_kept
    assert 0 < len(got) < docs.count()  # the gate actually discriminates


def test_streaming_dsir_gate_matches_batch(spark, sf_dir, tmp_path):
    """Round-12: DSIR importance scoring as a streaming ingest gate —
    the ratio model fits once in batch (dsir_ratio_model, persisted via
    localCheckpoint), every micro-batch is scored against the same
    broadcast table (dsir_score_with_model). Weights and the kept set
    are identical to batch scoring over the same corpus."""
    from real_estate_project1_etl_spark.operators.quality import (
        dsir_ratio_model,
        dsir_score_with_model,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )
    model = dsir_ratio_model(
        docs, docs.filter(F.col("lang") == "en"), dim=512
    ).localCheckpoint(eager=True)

    batch = {
        r["doc_id"]: (r["n_grams"], r["dsir_weight_ppm"])
        for r in dsir_score_with_model(docs, model, dim=512).collect()
    }
    # threshold at the median weight so the gate genuinely splits
    thr = sorted(w for _, w in batch.values() if w is not None)[
        len(batch) // 2
    ]
    batch_kept = {d for d, (_, w) in batch.items() if w is not None and w >= thr}
    assert 0 < len(batch_kept) < len(batch)

    src = str(tmp_path / "dsir_src")
    out_dir = str(tmp_path / "dsir_gated")
    docs.write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)

    def gate(mb, batch_id):
        kept = dsir_score_with_model(mb, model, dim=512).filter(
            F.col("dsir_weight_ppm") >= thr
        )
        kept.write.mode("append").parquet(out_dir)

    q = (
        stream.writeStream.foreachBatch(gate)
        .option("checkpointLocation", str(tmp_path / "dsir_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r["doc_id"]: (r["n_grams"], r["dsir_weight_ppm"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert set(got) == batch_kept
    # per-doc values identical, not just membership: micro-batch scoring
    # against the fixed model reproduces the batch weights exactly
    assert got == {d: batch[d] for d in batch_kept}


def test_streaming_unimax_gate_matches_batch(spark, sf_dir, tmp_path):
    """Round-12b: UniMax language sampling as a streaming ingest gate —
    the per-language rates fit once in batch (unimax_budgets over the
    historical size census, pinned), every micro-batch applies the same
    broadcast rate row via the stateless 128-bit hash-threshold
    predicate. Kept set identical to the batch gate over the same
    corpus (membership is content-hash determined, so arrival order and
    micro-batch boundaries cannot change it)."""
    from real_estate_project1_etl_spark.operators.quality import (
        unimax_budgets,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    ).filter(F.col("lang").isNotNull())
    sizes = docs.groupBy("lang").agg(
        F.sum(F.length("text")).cast("bigint").alias("n_chars")
    )
    total = sizes.agg(F.sum("n_chars").alias("t")).first()["t"]
    rates = unimax_budgets(
        sizes, "lang", "n_chars", (int(total) * 4) // 5, max_epochs=1
    ).select("lang", "epochs_ppm").localCheckpoint(eager=True)

    h60 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    keep = (
        h60.cast("decimal(38,0)") * F.lit(1000000)
        < F.col("epochs_ppm").cast("decimal(38,0)")
        * F.lit(1152921504606846976).cast("decimal(38,0)")
    )

    batch_kept = {
        r["doc_id"]
        for r in docs.join(F.broadcast(rates), "lang").filter(keep).collect()
    }
    n_docs = docs.count()
    assert 0 < len(batch_kept) < n_docs  # the gate genuinely splits

    src = str(tmp_path / "um_src")
    out_dir = str(tmp_path / "um_gated")
    docs.write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)

    def gate(mb, batch_id):
        kept = mb.join(F.broadcast(rates), "lang").filter(keep)
        kept.write.mode("append").parquet(out_dir)

    q = (
        stream.writeStream.foreachBatch(gate)
        .option("checkpointLocation", str(tmp_path / "um_ckpt"))
        .option("maxFilesPerTrigger", "1")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    assert got == batch_kept


def test_scd2_change_stream_matches_batch(spark, events_batch, tmp_path):
    # streaming SCD2: emitted CLOSED versions == batch history minus the
    # current (open) rows — values, intervals and run sizes included
    from real_estate_project1_etl_spark.streaming.stateful import (
        scd2_change_stream,
    )

    out = _run_stream(
        spark, events_batch, scd2_change_stream, tmp_path, "scd2",
        output_mode="append",
    )
    got = sorted(map(tuple, out.collect()))
    exp = sorted(map(tuple, scd2_change_stream(events_batch).collect()))
    assert got == exp and got  # non-empty: the fixture has state flips


def test_scd2_change_stream_vs_full_history(spark, events_batch):
    # the batch fallback is exactly scd2_history minus is_current —
    # and closed+current partitions the history
    from pyspark.sql import functions as F

    from real_estate_project1_etl_spark.operators.snapshots import (
        scd2_history,
    )
    from real_estate_project1_etl_spark.streaming.stateful import (
        scd2_change_stream,
    )

    h = scd2_history(events_batch, "user_id", "event_type", "ts", "event_id")
    closed = scd2_change_stream(events_batch)
    assert closed.count() == h.filter(~F.col("is_current")).count()
    assert h.count() == closed.count() + h.filter(
        F.col("is_current")
    ).count()
