"""Materialized rollup router (plans/rollup.py): coarser-grain queries
served from the summary must equal direct aggregation over the base, and
non-derivable shapes must be refused, never silently wrong."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_estate_project1_etl_spark.plans import rollup as R
from real_estate_project1_etl_spark.sources.parquet import load_table


@pytest.fixture(scope="module")
def rollup_path(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("rollup") / "li_rollup")
    li = load_table(spark, sf_dir, "lineitem")
    R.materialize_rollup(
        li,
        path,
        ["l_returnflag", "l_linestatus", "l_shipdate"],
        {
            "sum_qty": ("sum", "l_quantity"),
            "cnt_qty": ("count", "l_quantity"),
            "min_price": ("min", "l_extendedprice"),
            "max_price": ("max", "l_extendedprice"),
            "n_rows": ("count", "l_orderkey"),
        },
    )
    return path


def _direct(spark, sf_dir, cols):
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy(*cols) if cols else li
    return g.agg(
        F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("sum_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.avg("l_quantity").alias("avg_qty"),
    )


def _rollup_q(spark, rollup_path, cols):
    return R.query_rollup(
        spark,
        rollup_path,
        cols,
        {
            "sum_qty": ("sum", "l_quantity"),
            "min_price": ("min", "l_extendedprice"),
            "max_price": ("max", "l_extendedprice"),
            "avg_qty": ("avg", "l_quantity"),
        },
    )


@pytest.mark.parametrize(
    "cols",
    [
        ["l_returnflag", "l_linestatus", "l_shipdate"],  # same grain
        ["l_returnflag", "l_linestatus"],                # coarser
        ["l_shipdate"],                                  # different subset
        [],                                              # grand total
    ],
)
def test_rollup_serves_any_coarser_grain_exactly(spark, sf_dir, rollup_path, cols):
    got = {
        tuple(r[c] for c in cols): (r.sum_qty, r.min_price, r.max_price, r.avg_qty)
        for r in _rollup_q(spark, rollup_path, cols).collect()
    }
    want = {
        tuple(r[c] for c in cols): (r.sum_qty, r.min_price, r.max_price, r.avg_qty)
        for r in _direct(spark, sf_dir, cols).collect()
    }
    assert set(got) == set(want)
    for k in want:
        gs, gmin, gmax, gavg = got[k]
        ws, wmin, wmax, wavg = want[k]
        assert gs == ws, k            # decimal partial sums re-aggregate exactly
        assert gmin == wmin and gmax == wmax, k
        # rollup avg = decimal(38,6) sum / count (exact to 6 dp); the
        # direct double avg can differ by up to half an ulp of that scale
        assert abs(float(gavg) - wavg) < 1e-6, k


def test_rollup_refuses_non_derivable(spark, rollup_path):
    meta = R.rollup_meta(rollup_path)
    # finer grain than materialized
    assert not R.can_serve(meta, ["l_returnflag", "l_suppkey"], {})
    # non-algebraic aggregate
    assert not R.can_serve(
        meta, ["l_returnflag"], {"d": ("count_distinct", "l_orderkey")}
    )
    # aggregate over a column that was never materialized
    assert not R.can_serve(meta, ["l_returnflag"], {"s": ("sum", "l_discount")})
    # avg without a count partial for the same source
    assert not R.can_serve(meta, ["l_returnflag"], {"a": ("avg", "l_extendedprice")})
    with pytest.raises(ValueError):
        R.query_rollup(
            spark, rollup_path, ["l_returnflag"], {"s": ("sum", "l_discount")}
        )


def test_materialize_rejects_non_algebraic(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem")
    with pytest.raises(ValueError):
        R.materialize_rollup(
            li, str(tmp_path / "bad"), ["l_returnflag"],
            {"d": ("count_distinct", "l_orderkey")},
        )


def test_update_rollup_fold_equals_recompute(spark, sf_dir, tmp_path):
    from real_estate_project1_etl_spark.sources.parquet import load_table

    li = load_table(spark, sf_dir, "lineitem")
    specs = {
        "sum_qty": ("sum", "l_quantity"),
        "cnt_qty": ("count", "l_quantity"),
        "min_price": ("min", "l_extendedprice"),
        "max_price": ("max", "l_extendedprice"),
    }
    grain = ["l_returnflag", "l_linestatus"]
    # incremental: seed with a third of the data, fold the rest in 2 batches
    inc = str(tmp_path / "inc")
    R.materialize_rollup(li.filter(F.col("l_orderkey") % 3 == 0), inc, grain, specs)
    R.update_rollup(li.filter(F.col("l_orderkey") % 3 == 1), inc)
    R.update_rollup(li.filter(F.col("l_orderkey") % 3 == 2), inc)
    # recompute: the whole table at once
    full = str(tmp_path / "full")
    R.materialize_rollup(li, full, grain, specs)

    q = {
        "sum_qty": ("sum", "l_quantity"),
        "avg_qty": ("avg", "l_quantity"),
        "min_price": ("min", "l_extendedprice"),
        "max_price": ("max", "l_extendedprice"),
    }
    a = {(r.l_returnflag, r.l_linestatus): (r.sum_qty, r.avg_qty, r.min_price, r.max_price)
         for r in R.query_rollup(spark, inc, grain, q).collect()}
    b = {(r.l_returnflag, r.l_linestatus): (r.sum_qty, r.avg_qty, r.min_price, r.max_price)
         for r in R.query_rollup(spark, full, grain, q).collect()}
    assert a == b  # decimal partials: the fold is EXACT, not approximate

    # meta sidecar survives the swap; served queries still route correctly
    assert R.rollup_meta(inc)["group_cols"] == grain


def test_rollup_stream_sink_replay_is_exactly_once(spark, sf_dir, tmp_path):
    from real_estate_project1_etl_spark.plans.rollup import rollup_stream_sink
    from real_estate_project1_etl_spark.sources.parquet import load_table

    li = load_table(spark, sf_dir, "lineitem")
    specs = {"sum_qty": ("sum", "l_quantity"), "cnt_qty": ("count", "l_quantity")}
    grain = ["l_returnflag"]
    path = str(tmp_path / "stream_rollup")
    R.materialize_rollup(li.filter(F.col("l_orderkey") % 2 == 0), path, grain, specs)
    sink = rollup_stream_sink(path, app_id="loader-1")
    batch = li.filter(F.col("l_orderkey") % 2 == 1)
    sink(batch, 0)
    before = {r.l_returnflag: r.sum_qty for r in
              R.query_rollup(spark, path, grain, {"sum_qty": ("sum", "l_quantity")}).collect()}
    # crash-replay of the SAME micro-batch: must be a no-op
    sink(batch, 0)
    after = {r.l_returnflag: r.sum_qty for r in
             R.query_rollup(spark, path, grain, {"sum_qty": ("sum", "l_quantity")}).collect()}
    assert before == after
    # and the folded total equals a full recompute
    full = str(tmp_path / "full2")
    R.materialize_rollup(li, full, grain, specs)
    want = {r.l_returnflag: r.sum_qty for r in
            R.query_rollup(spark, full, grain, {"sum_qty": ("sum", "l_quantity")}).collect()}
    assert after == want
    # a LATER batch still folds (watermark advances, doesn't stick)
    sink(li.limit(0), 1)   # empty fold advances watermark harmlessly
    assert R.rollup_meta(path)["txn"] == {"loader-1": 1}


def test_update_rollup_excluded_while_lock_held(spark, sf_dir, tmp_path):
    # ADVICE rounds 2+3: concurrent folders serialize on an fcntl.flock
    # held for the WHOLE fold (not an exclusive-create file whose mtime a
    # newcomer could misjudge as stale and unlink from under a live
    # holder).  Simulate a live holder by flocking the persistent lock
    # file; the second folder must block until the flock releases, then
    # fold correctly.  flock treats separately-opened fds in one process
    # as independent holders, so the simulation is faithful.
    import fcntl
    import os
    import threading
    import time

    from real_estate_project1_etl_spark.sources.parquet import load_table

    li = load_table(spark, sf_dir, "lineitem")
    specs = {"sum_qty": ("sum", "l_quantity")}
    path = str(tmp_path / "locked")
    R.materialize_rollup(li.filter(F.col("l_orderkey") % 2 == 0), path, ["l_returnflag"], specs)

    lock = path.rstrip("/") + "._rollup_lock"
    holder_fd = os.open(lock, os.O_CREAT | os.O_RDWR)
    fcntl.flock(holder_fd, fcntl.LOCK_EX)
    t0 = time.monotonic()
    done = threading.Event()

    def folder():
        R.update_rollup(li.filter(F.col("l_orderkey") % 2 == 1), path)
        done.set()

    t = threading.Thread(target=folder, daemon=True)
    t.start()
    time.sleep(0.6)
    assert not done.is_set(), "folder must block while the flock is held"
    # a waiter never unlinks a LIVE holder's lock (the round-3 steal bug):
    # the lock file must still exist and the holder's flock still be valid
    assert os.path.exists(lock)
    fcntl.flock(holder_fd, fcntl.LOCK_UN)
    os.close(holder_fd)
    t.join(timeout=60)
    assert done.is_set(), "folder must proceed after release"
    assert time.monotonic() - t0 > 0.5
    got = R.query_rollup(spark, path, ["l_returnflag"], {"sum_qty": ("sum", "l_quantity")})
    want = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("sum_qty"))
    assert {
        (r["l_returnflag"], float(r["sum_qty"])) for r in got.collect()
    } == {(r["l_returnflag"], float(r["sum_qty"])) for r in want.collect()}


def test_update_rollup_wait_deadline_is_a_parameter(spark, sf_dir, tmp_path):
    # ADVICE round 3: the old 120 s hard-coded deadline could crash a
    # streaming foreachBatch while a HEALTHY long fold ran.  The deadline
    # is now a parameter; a short one raises TimeoutError while the lock
    # is legitimately held, and the holder's lock survives the timeout.
    import fcntl
    import os

    import pytest

    from real_estate_project1_etl_spark.sources.parquet import load_table

    li = load_table(spark, sf_dir, "lineitem")
    specs = {"sum_qty": ("sum", "l_quantity")}
    path = str(tmp_path / "deadline")
    R.materialize_rollup(li.limit(10), path, ["l_returnflag"], specs)

    lock = path.rstrip("/") + "._rollup_lock"
    holder_fd = os.open(lock, os.O_CREAT | os.O_RDWR)
    fcntl.flock(holder_fd, fcntl.LOCK_EX)
    try:
        with pytest.raises(TimeoutError):
            R.update_rollup(li.limit(5), path, wait_timeout_s=0.5)
        # the holder's flock was not disturbed by the timed-out waiter
        probe = os.open(lock, os.O_RDWR)
        try:
            with pytest.raises(OSError):
                fcntl.flock(probe, fcntl.LOCK_EX | fcntl.LOCK_NB)
        finally:
            os.close(probe)
    finally:
        fcntl.flock(holder_fd, fcntl.LOCK_UN)
        os.close(holder_fd)
    # after release the fold goes through with the default deadline
    R.update_rollup(li.limit(5), path)
