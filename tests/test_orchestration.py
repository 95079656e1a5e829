"""Pipeline-runner semantics (reference dag.py:13-22,78): retries with
delay, one failure alert, depends_on_past gating via persisted state,
linear all-success halting."""

from __future__ import annotations

import json
import os

import pytest

from real_estate_project1_etl_spark.orchestration import (
    DependsOnPastBlocked,
    PipelineTask,
    RunReport,
    TaskFailed,
    run_pipeline,
)


def test_linear_chain_success_and_report(tmp_path):
    calls = []
    state = str(tmp_path / "state.json")
    tasks = [
        PipelineTask("extract", lambda: calls.append("e") or 3),
        PipelineTask("transform", lambda: calls.append("t") or "ok"),
        PipelineTask("load", lambda: calls.append("l")),
    ]
    rep = run_pipeline(tasks, state_path=state)
    assert isinstance(rep, RunReport)
    assert calls == ["e", "t", "l"]
    assert rep.statuses == {
        "extract": "success", "transform": "success", "load": "success"
    }
    assert rep.results["extract"] == 3 and rep.results["transform"] == "ok"
    persisted = json.load(open(state))
    assert {k: v["status"] for k, v in persisted.items()} == {
        "extract": "success", "transform": "success", "load": "success"
    }


def test_retries_then_success_with_delay_and_retry_hook():
    attempts, slept, retried = [], [], []

    def flaky():
        attempts.append(1)
        if len(attempts) < 3:
            raise OSError("transient")
        return "done"

    rep = run_pipeline(
        [PipelineTask("flaky", flaky, retries=2, retry_delay=7.0)],
        on_retry=lambda n, a, e: retried.append((n, a)),
        sleeper=slept.append,
    )
    assert rep.statuses["flaky"] == "success" and rep.attempts["flaky"] == 3
    assert slept == [7.0, 7.0]
    assert retried == [("flaky", 1), ("flaky", 2)]


def test_failure_alert_fires_once_and_chain_halts(tmp_path):
    alerts, ran = [], []
    state = str(tmp_path / "state.json")

    def boom():
        raise ValueError("bad day")

    tasks = [
        PipelineTask("a", lambda: ran.append("a")),
        PipelineTask("b", boom, retries=1, retry_delay=0.0),
        PipelineTask("c", lambda: ran.append("c")),
    ]
    with pytest.raises(TaskFailed) as ei:
        run_pipeline(
            tasks,
            state_path=state,
            on_failure=lambda n, e: alerts.append(n),
            sleeper=lambda s: None,
        )
    assert ei.value.task == "b" and ei.value.attempts == 2
    assert alerts == ["b"]          # email_on_failure analog: exactly one
    assert ran == ["a"]             # downstream never ran (>> chain)
    persisted = json.load(open(state))
    assert persisted["a"]["status"] == "success"
    assert persisted["b"]["status"] == "failed"
    assert "c" not in persisted


def test_depends_on_past_blocks_then_clears(tmp_path):
    state = str(tmp_path / "state.json")

    def boom():
        raise RuntimeError("x")

    with pytest.raises(TaskFailed):
        run_pipeline([PipelineTask("t", boom)], state_path=state)
    # next scheduled run: the same task refuses to start (Airflow
    # depends_on_past semantics)
    with pytest.raises(DependsOnPastBlocked):
        run_pipeline([PipelineTask("t", lambda: 1)], state_path=state)
    # opting out of depends_on_past runs it and a success clears the gate
    rep = run_pipeline(
        [PipelineTask("t", lambda: 1, depends_on_past=False)],
        state_path=state,
    )
    assert rep.statuses["t"] == "success"
    rep2 = run_pipeline([PipelineTask("t", lambda: 2)], state_path=state)
    assert rep2.results["t"] == 2


def test_duplicate_task_names_rejected():
    with pytest.raises(ValueError):
        run_pipeline([
            PipelineTask("x", lambda: 1), PipelineTask("x", lambda: 2)
        ])


def test_spark_entry_points_compose(spark, tmp_path):
    # the intended wiring: tasks close over the SparkSession and chain
    # the bronze->silver->gold entry points; a real write happens.
    from pyspark.sql import functions as F

    out = str(tmp_path / "gold")
    state = str(tmp_path / "state.json")

    def transform():
        return (
            spark.range(10)
            .withColumn("v", F.col("id") * 2)
            .write.mode("overwrite").parquet(out)
        )

    def load():
        return spark.read.parquet(out).count()

    rep = run_pipeline(
        [PipelineTask("transform", transform), PipelineTask("load", load)],
        state_path=state,
    )
    assert rep.results["load"] == 10


# --------------------------------------------------------------------------
# Cron scheduler daemon (round-11: the dag.py:28 long-running equivalent)
# --------------------------------------------------------------------------


def _fake_time(start):
    """(clock, sleeper) pair over a mutable fake datetime."""
    from datetime import timedelta

    state = {"now": start}

    def clock():
        return state["now"]

    def sleeper(seconds):
        state["now"] = state["now"] + timedelta(seconds=seconds)

    return clock, sleeper, state


def test_cron_next_reference_schedule():
    from datetime import datetime

    from real_estate_project1_etl_spark.orchestration import cron_next

    # the reference's '0 8 * * *' (dag.py:28)
    assert cron_next("0 8 * * *", datetime(2026, 1, 1, 7, 30)) == datetime(
        2026, 1, 1, 8, 0
    )
    # strictly-after: at 08:00 exactly, next fire is tomorrow
    assert cron_next("0 8 * * *", datetime(2026, 1, 1, 8, 0)) == datetime(
        2026, 1, 2, 8, 0
    )
    # step minutes; STANDARD cron dow (0=Sunday): 2026-01-04 is the
    # first Sunday after New Year, 2026-01-05 the first Monday
    assert cron_next("*/15 * * * *", datetime(2026, 1, 1, 8, 1)) == datetime(
        2026, 1, 1, 8, 15
    )
    assert cron_next("30 6 * * 0", datetime(2026, 1, 1, 0, 0)) == datetime(
        2026, 1, 4, 6, 30
    )
    assert cron_next("30 6 * * 1", datetime(2026, 1, 1, 0, 0)) == datetime(
        2026, 1, 5, 6, 30
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="5 fields"):
        cron_next("0 8 * *", datetime(2026, 1, 1))
    with _pytest.raises(ValueError, match="never fires"):
        cron_next("0 8 31 2 *", datetime(2026, 1, 1))
    with _pytest.raises(ValueError, match="out of range"):
        cron_next("61 8 * * *", datetime(2026, 1, 1))


def test_scheduler_daily_ticks_and_restart(tmp_path):
    from datetime import datetime

    from real_estate_project1_etl_spark.orchestration import run_scheduler

    state = str(tmp_path / "sched.json")
    ran = []
    clock, sleeper, _ = _fake_time(datetime(2026, 1, 1, 7, 0))
    got = run_scheduler(
        "0 8 * * *", ran.append, start=datetime(2026, 1, 1, 7, 0),
        state_path=state, clock=clock, sleeper=sleeper, max_ticks=3,
    )
    assert got == ran == [
        datetime(2026, 1, 1, 8, 0),
        datetime(2026, 1, 2, 8, 0),
        datetime(2026, 1, 3, 8, 0),
    ]
    # logical dates fired, not wall-clock run moments

    # RESTART on the same state file: resumes AFTER the recorded tick —
    # no refire of 01-03 (exactly-once per tick)
    ran2 = []
    clock2, sleeper2, _ = _fake_time(datetime(2026, 1, 3, 9, 0))
    run_scheduler(
        "0 8 * * *", ran2.append, start=datetime(2026, 1, 1, 7, 0),
        state_path=state, clock=clock2, sleeper=sleeper2, max_ticks=2,
    )
    assert ran2 == [datetime(2026, 1, 4, 8, 0), datetime(2026, 1, 5, 8, 0)]


def test_scheduler_catchup_semantics(tmp_path):
    from datetime import datetime

    from real_estate_project1_etl_spark.orchestration import run_scheduler

    # daemon wakes up 3 days late
    for catchup, want in (
        (False, [datetime(2026, 1, 4, 8, 0)]),          # latest only
        (True, [datetime(2026, 1, 2, 8, 0),             # every missed tick
                datetime(2026, 1, 3, 8, 0),
                datetime(2026, 1, 4, 8, 0)]),
    ):
        ran = []
        clock, sleeper, _ = _fake_time(datetime(2026, 1, 4, 12, 0))
        run_scheduler(
            "0 8 * * *", ran.append, start=datetime(2026, 1, 1, 12, 0),
            clock=clock, sleeper=sleeper, max_ticks=len(want),
            catchup=catchup,
        )
        assert ran == want, (catchup, ran)


def test_scheduler_failed_tick_not_recorded(tmp_path):
    from datetime import datetime

    from real_estate_project1_etl_spark.orchestration import run_scheduler

    state = str(tmp_path / "sched.json")
    alerts = []

    def boom(dt):
        raise RuntimeError("pipeline failed")

    clock, sleeper, _ = _fake_time(datetime(2026, 1, 1, 7, 59))
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="pipeline failed"):
        run_scheduler(
            "0 8 * * *", boom, start=datetime(2026, 1, 1, 7, 0),
            state_path=state, clock=clock, sleeper=sleeper, max_ticks=1,
            on_tick_failure=lambda dt, exc: alerts.append((dt, str(exc))),
        )
    assert alerts == [(datetime(2026, 1, 1, 8, 0), "pipeline failed")]
    # the failed tick was NOT recorded: a restart retries the SAME tick
    ran = []
    clock2, sleeper2, _ = _fake_time(datetime(2026, 1, 1, 8, 30))
    run_scheduler(
        "0 8 * * *", ran.append, start=datetime(2026, 1, 1, 7, 0),
        state_path=state, clock=clock2, sleeper=sleeper2, max_ticks=1,
    )
    assert ran == [datetime(2026, 1, 1, 8, 0)]


def test_scheduler_drives_pipeline_with_depends_on_past(tmp_path):
    # the full dag.py composition: cron ticks (run_scheduler) invoking
    # the linear task chain (run_pipeline) with retries and
    # depends_on_past.  Tick 2's task failure halts the scheduler with
    # the tick unrecorded; a restart retries the SAME logical date, and
    # because the task state file recorded the failure,
    # depends_on_past blocks until the operator intervenes — exactly
    # Airflow's stuck-dag semantics, reproduced end to end.
    from datetime import datetime

    from real_estate_project1_etl_spark.orchestration import (
        DependsOnPastBlocked,
        PipelineTask,
        TaskFailed,
        run_pipeline,
        run_scheduler,
    )

    sched_state = str(tmp_path / "sched.json")
    task_state = str(tmp_path / "tasks.json")
    runs = []
    attempts = {"n": 0}

    def make_run(fail_on_tick):
        def run(tick):
            def extract():
                runs.append(("extract", tick))
                if tick == fail_on_tick:
                    attempts["n"] += 1
                    raise RuntimeError("scrape failed")
                return "raw"

            def transform():
                runs.append(("transform", tick))
                return "clean"

            run_pipeline(
                [
                    PipelineTask("extract", extract, retries=1,
                                 retry_delay=0, depends_on_past=True),
                    PipelineTask("transform", transform),
                ],
                state_path=task_state,
                sleeper=lambda s: None,
            )
        return run

    clock, sleeper, _ = _fake_time(datetime(2026, 3, 1, 7, 0))
    import pytest as _pytest

    with _pytest.raises(TaskFailed):
        run_scheduler(
            "0 8 * * *", make_run(datetime(2026, 3, 2, 8, 0)),
            start=datetime(2026, 3, 1, 7, 0), state_path=sched_state,
            clock=clock, sleeper=sleeper, max_ticks=3,
        )
    # tick 1 completed both tasks; tick 2 retried extract once (retries=1
    # -> 2 attempts) then halted before transform
    assert runs == [
        ("extract", datetime(2026, 3, 1, 8, 0)),
        ("transform", datetime(2026, 3, 1, 8, 0)),
        ("extract", datetime(2026, 3, 2, 8, 0)),
        ("extract", datetime(2026, 3, 2, 8, 0)),
    ]
    assert attempts["n"] == 2

    # restart: the scheduler retries the UNRECORDED tick 2, and
    # depends_on_past sees extract's recorded failure -> blocked loudly
    clock2, sleeper2, _ = _fake_time(datetime(2026, 3, 2, 9, 0))
    with _pytest.raises(DependsOnPastBlocked):
        run_scheduler(
            "0 8 * * *", make_run(None),
            start=datetime(2026, 3, 1, 7, 0), state_path=sched_state,
            clock=clock2, sleeper=sleeper2, max_ticks=1,
        )

    # operator clears the task state (rerun-to-success path): the same
    # tick then completes and the schedule continues
    os.remove(task_state)
    runs.clear()
    clock3, sleeper3, _ = _fake_time(datetime(2026, 3, 2, 9, 0))
    ran = run_scheduler(
        "0 8 * * *", make_run(None),
        start=datetime(2026, 3, 1, 7, 0), state_path=sched_state,
        clock=clock3, sleeper=sleeper3, max_ticks=2,
    )
    assert ran == [datetime(2026, 3, 2, 8, 0), datetime(2026, 3, 3, 8, 0)]
    assert runs[0] == ("extract", datetime(2026, 3, 2, 8, 0))


# --------------------------------------------------------------------------
# Round-12: standard-cron step/OR semantics, Feb-29, long ticks,
# max_catchup, shared-state-file safety
# --------------------------------------------------------------------------


def test_cron_step_offsets_from_field_minimum():
    # Vixie cron: */n expands first-last/n with first = the field floor,
    # so '*/2' in day-of-month matches 1,3,5,... (NOT 2,4,6,...)
    from datetime import datetime

    from real_estate_project1_etl_spark.orchestration import cron_next

    assert cron_next("0 8 */2 * *", datetime(2026, 1, 1, 0, 0)) == datetime(
        2026, 1, 1, 8, 0
    )
    assert cron_next("0 8 */2 * *", datetime(2026, 1, 1, 8, 0)) == datetime(
        2026, 1, 3, 8, 0
    )
    # month field is 1-based too: '*/3' matches Jan, Apr, Jul, Oct
    assert cron_next("0 8 1 */3 *", datetime(2026, 1, 2, 0, 0)) == datetime(
        2026, 4, 1, 8, 0
    )
    # 0-based fields are unchanged: '*/15' minutes still 0,15,30,45
    assert cron_next("*/15 * * * *", datetime(2026, 1, 1, 8, 16)) == datetime(
        2026, 1, 1, 8, 30
    )


def test_cron_dom_dow_or_rule():
    # standard cron: when BOTH dom and dow are restricted, a day matches
    # if EITHER does.  '0 8 13 * 5' = 08:00 on the 13th OR any Friday.
    from datetime import datetime

    from real_estate_project1_etl_spark.orchestration import cron_next

    # 2026-01-02 is the first Friday of 2026; the 13th is a Tuesday
    t = datetime(2026, 1, 1, 0, 0)
    fires = []
    for _ in range(4):
        t = cron_next("0 8 13 * 5", t)
        fires.append(t)
    assert fires == [
        datetime(2026, 1, 2, 8, 0),    # Friday
        datetime(2026, 1, 9, 8, 0),    # Friday
        datetime(2026, 1, 13, 8, 0),   # the 13th (Tuesday) — dom leg
        datetime(2026, 1, 16, 8, 0),   # Friday
    ]
    # when dow is '*', dom alone governs (AND with always-true)
    assert cron_next("0 8 13 * *", datetime(2026, 1, 1)) == datetime(
        2026, 1, 13, 8, 0
    )
    # when dom is '*', dow alone governs
    assert cron_next("0 8 * * 5", datetime(2026, 1, 3)) == datetime(
        2026, 1, 9, 8, 0
    )


def test_cron_feb29_resolves_across_leap_years():
    from datetime import datetime

    import pytest as _pytest

    from real_estate_project1_etl_spark.orchestration import cron_next

    # next Feb 29 after 2026-03-01 is in 2028 — more than a year out,
    # which the old 366-day scan bound misclassified as 'never fires'
    assert cron_next("0 8 29 2 *", datetime(2026, 3, 1)) == datetime(
        2028, 2, 29, 8, 0
    )
    # a genuinely impossible spec still raises loudly
    with _pytest.raises(ValueError, match="never fires"):
        cron_next("0 8 31 2 *", datetime(2026, 1, 1))


def test_scheduler_long_tick_collapses_to_latest(tmp_path):
    # a run() that overruns its interval: with catchup=False the ticks
    # that became due DURING the slow run collapse to the single latest
    # one (no pile-up) — pinned mid-loop, not just at startup.
    from datetime import datetime, timedelta

    from real_estate_project1_etl_spark.orchestration import run_scheduler

    clock, sleeper, fake = _fake_time(datetime(2026, 1, 1, 0, 30))
    ran = []

    def slow_run(tick):
        ran.append(tick)
        if tick == datetime(2026, 1, 1, 1, 0):
            # the first tick's run takes 3.5 hours: 02:00 and 03:00 and
            # 04:00 all become due while it executes
            fake["now"] = fake["now"] + timedelta(hours=3, minutes=30)

    run_scheduler(
        "0 * * * *", slow_run, start=datetime(2026, 1, 1, 0, 30),
        clock=clock, sleeper=sleeper, max_ticks=3, catchup=False,
    )
    assert ran == [
        datetime(2026, 1, 1, 1, 0),
        datetime(2026, 1, 1, 4, 0),   # 02:00/03:00 collapsed away
        datetime(2026, 1, 1, 5, 0),
    ]


def test_scheduler_long_tick_catchup_replays_in_order(tmp_path):
    from datetime import datetime, timedelta

    from real_estate_project1_etl_spark.orchestration import run_scheduler

    clock, sleeper, fake = _fake_time(datetime(2026, 1, 1, 0, 30))
    ran = []

    def slow_run(tick):
        ran.append(tick)
        if tick == datetime(2026, 1, 1, 1, 0):
            fake["now"] = fake["now"] + timedelta(hours=2, minutes=30)

    run_scheduler(
        "0 * * * *", slow_run, start=datetime(2026, 1, 1, 0, 30),
        clock=clock, sleeper=sleeper, max_ticks=4, catchup=True,
    )
    assert ran == [
        datetime(2026, 1, 1, 1, 0),
        datetime(2026, 1, 1, 2, 0),   # replayed in order
        datetime(2026, 1, 1, 3, 0),
        datetime(2026, 1, 1, 4, 0),
    ]


def test_scheduler_max_catchup_caps_backlog(tmp_path):
    # daemon restarts 5 days late with catchup=True, max_catchup=2:
    # only the LATEST 2 missed ticks replay — the stale backlog is skipped
    from datetime import datetime

    import pytest as _pytest

    from real_estate_project1_etl_spark.orchestration import run_scheduler

    ran = []
    clock, sleeper, _ = _fake_time(datetime(2026, 1, 6, 12, 0))
    run_scheduler(
        "0 8 * * *", ran.append, start=datetime(2026, 1, 1, 12, 0),
        clock=clock, sleeper=sleeper, max_ticks=2,
        catchup=True, max_catchup=2,
    )
    assert ran == [datetime(2026, 1, 5, 8, 0), datetime(2026, 1, 6, 8, 0)]
    with _pytest.raises(ValueError, match="max_catchup"):
        run_scheduler(
            "0 8 * * *", ran.append, start=datetime(2026, 1, 1, 12, 0),
            clock=clock, sleeper=sleeper, max_ticks=1,
            catchup=True, max_catchup=0,
        )


def test_scheduler_shared_state_file_not_clobbered(tmp_path):
    # scheduler and run_pipeline SHARE one state file.  The task starts
    # recorded 'failed' (stale from a previous run); during the tick the
    # pipeline reruns it to success.  The scheduler's post-tick save must
    # not clobber that back to the startup snapshot's 'failed' — which
    # would wrongly raise DependsOnPastBlocked on the next tick.
    from datetime import datetime

    from real_estate_project1_etl_spark.orchestration import (
        PipelineTask,
        run_pipeline,
        run_scheduler,
    )

    state = str(tmp_path / "shared.json")
    with open(state, "w") as f:
        json.dump({"t": {"status": "failed", "ts": 0}}, f)

    def run(tick):
        run_pipeline(
            [PipelineTask("t", lambda: "ok", depends_on_past=False)],
            state_path=state,
        )

    clock, sleeper, _ = _fake_time(datetime(2026, 1, 1, 7, 59))
    run_scheduler(
        "0 8 * * *", run, start=datetime(2026, 1, 1, 7, 0),
        state_path=state, clock=clock, sleeper=sleeper, max_ticks=2,
    )
    persisted = json.load(open(state))
    assert persisted["t"]["status"] == "success"     # not reverted
    assert persisted["__scheduler__"]["last_tick"] == "2026-01-02T08:00:00"
