"""Pipeline-run orchestration: retries, failure alerts, depends-on-past.

The reference drives its ETL with an Airflow DAG (dag.py:13-22 sets
``depends_on_past=True``, ``retries``/``retry_delay``, and
``email_on_failure``; dag.py:78 chains the tasks linearly). Those are
job-scheduler concerns, but their FAILURE SEMANTICS are part of the
pipeline contract a user migrates with — so this module reproduces them
as a scheduler-agnostic runner around the Spark entry points:

- ``retries`` / ``retry_delay``: per-task re-execution with a pluggable
  sleeper (tests inject a no-op; production keeps ``time.sleep``).
- ``email_on_failure`` / ``email_on_retry``: generalized to ``on_failure``
  / ``on_retry`` callbacks — the engine's alert surface; wiring one to
  SMTP/Slack/PagerDuty is deployment config, not engine code.
- ``depends_on_past``: a task refuses to start while its OWN previous
  run is recorded failed (Airflow's meaning), via a small JSON state
  file updated with atomic tmp+rename — the same publish idiom as the
  versioned sink's manifest pointer.
- linear chaining with all-success trigger semantics: the first task
  that exhausts its retries halts the run (dag.py:78's ``>>`` chain).

Everything here is driver-side control flow over task-sized metadata;
no data-sized state ever touches it, so it is scale-independent.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable


class TaskFailed(RuntimeError):
    """A task exhausted its retries; the pipeline run halted."""

    def __init__(self, task: str, attempts: int, cause: BaseException):
        super().__init__(
            f"task {task!r} failed after {attempts} attempt(s): {cause!r}"
        )
        self.task = task
        self.attempts = attempts
        self.cause = cause


class DependsOnPastBlocked(RuntimeError):
    """A depends_on_past task found its previous run recorded failed."""

    def __init__(self, task: str):
        super().__init__(
            f"task {task!r} has depends_on_past=True and its previous run "
            "failed — clear it by rerunning to success or resetting state"
        )
        self.task = task


@dataclass
class PipelineTask:
    """One unit in the linear chain (a PythonOperator equivalent).

    ``fn`` takes no arguments and returns an opaque result recorded in
    the run report; close over the SparkSession / paths when building
    the task list. Defaults mirror dag.py:13-22 (``retries=0``,
    ``retry_delay`` 5 minutes, ``depends_on_past=True``).
    """

    name: str
    fn: Callable[[], Any]
    retries: int = 0
    retry_delay: float = 300.0
    depends_on_past: bool = True


@dataclass
class RunReport:
    """Outcome of one pipeline run: per-task status + results."""

    statuses: dict[str, str] = field(default_factory=dict)
    results: dict[str, Any] = field(default_factory=dict)
    attempts: dict[str, int] = field(default_factory=dict)


def _load_state(path: str | None) -> dict:
    if path is None or not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def _save_state(path: str | None, state: dict) -> None:
    if path is None:
        return
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f, indent=1, sort_keys=True)
    os.replace(tmp, path)  # atomic publish, crash-safe


def run_pipeline(
    tasks: list[PipelineTask],
    state_path: str | None = None,
    on_failure: Callable[[str, BaseException], None] | None = None,
    on_retry: Callable[[str, int, BaseException], None] | None = None,
    sleeper: Callable[[float], None] = time.sleep,
    now: Callable[[], float] = time.time,
) -> RunReport:
    """Run the linear task chain with dag.py's failure semantics.

    Halts at the first task that exhausts its retries (raising
    :class:`TaskFailed` after invoking ``on_failure`` exactly once) or
    that is blocked by :class:`DependsOnPastBlocked`. ``on_retry`` fires
    before each re-attempt (``email_on_retry`` analog — default off in
    the reference, hence default ``None`` here). Task status persists to
    ``state_path`` after EVERY terminal transition, so a crash between
    tasks never loses the completed prefix.
    """
    names = [t.name for t in tasks]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate task names: {names}")
    state = _load_state(state_path)
    report = RunReport()
    for t in tasks:
        prev = state.get(t.name, {})
        if t.depends_on_past and prev.get("status") == "failed":
            raise DependsOnPastBlocked(t.name)
        attempt = 0
        while True:
            attempt += 1
            try:
                result = t.fn()
            except Exception as exc:  # noqa: BLE001 — task boundary
                if attempt <= t.retries:
                    if on_retry is not None:
                        on_retry(t.name, attempt, exc)
                    sleeper(t.retry_delay)
                    continue
                state[t.name] = {"status": "failed", "ts": now()}
                _save_state(state_path, state)
                report.statuses[t.name] = "failed"
                report.attempts[t.name] = attempt
                if on_failure is not None:
                    on_failure(t.name, exc)
                raise TaskFailed(t.name, attempt, exc) from exc
            state[t.name] = {"status": "success", "ts": now()}
            _save_state(state_path, state)
            report.statuses[t.name] = "success"
            report.results[t.name] = result
            report.attempts[t.name] = attempt
            break
    return report


# --------------------------------------------------------------------------
# Cron scheduler daemon (dag.py:28 `schedule_interval='0 8 * * *'`)
# --------------------------------------------------------------------------

def cron_next(expr: str, after):
    """Next fire time STRICTLY after ``after`` (a naive ``datetime``) for
    a 5-field cron expression.  Supports the subset real pipeline
    schedules use: each field is ``*``, ``*/n``, or an exact integer
    (minute hour day-of-month month day-of-week; dow follows STANDARD
    cron — 0=Sunday .. 6=Saturday).  Anything else raises — a silently
    mis-parsed schedule would run jobs at the wrong time, the worst
    possible failure mode for a scheduler.

    Standard-cron semantics pinned by tests:

    - ``*/n`` steps from the field's MINIMUM (``*/2`` in day-of-month
      matches 1,3,5,… — not 2,4,6…), matching Vixie cron, where the
      step rule is "first-last/n" with first = the field floor.
    - When day-of-month AND day-of-week are BOTH restricted, a day
      matches if EITHER does (the cron OR rule); when either is ``*``,
      the restricted one alone governs.

    Forward scan that skips whole non-matching days/hours, bounded at
    4×366 days so a pinned Feb-29 schedule (``0 8 29 2 *``) resolves
    across leap years while an impossible spec like ``0 8 31 2 *``
    still raises loudly instead of spinning.
    """
    from datetime import timedelta

    fields = expr.split()
    if len(fields) != 5:
        raise ValueError(
            f"cron_next: expected 5 fields 'M H dom mon dow', got {expr!r}"
        )

    def parse(f: str, lo: int, hi: int):
        if f == "*":
            return None  # any
        if f.startswith("*/"):
            step = int(f[2:])
            if step < 1:
                raise ValueError(f"cron_next: bad step in {f!r}")
            return ("step", step, lo)
        v = int(f)  # raises on garbage — deliberate
        if not lo <= v <= hi:
            raise ValueError(f"cron_next: field {f!r} out of range [{lo},{hi}]")
        return ("eq", v, lo)

    mi, hr, dom, mon, dow = (
        parse(fields[0], 0, 59),
        parse(fields[1], 0, 23),
        parse(fields[2], 1, 31),
        parse(fields[3], 1, 12),
        parse(fields[4], 0, 6),
    )

    def ok(spec, value):
        if spec is None:
            return True
        kind, v, lo = spec
        return (value - lo) % v == 0 if kind == "step" else value == v

    def day_ok(t):
        # standard cron dow: 0=Sunday; datetime.weekday(): 0=Monday
        dom_hit = ok(dom, t.day)
        dow_hit = ok(dow, (t.weekday() + 1) % 7)
        if dom is not None and dow is not None:
            return dom_hit or dow_hit  # cron OR rule
        return dom_hit and dow_hit

    t = (after.replace(second=0, microsecond=0)
         + timedelta(minutes=1))
    limit = t + timedelta(days=4 * 366)
    while t < limit:
        if not (ok(mon, t.month) and day_ok(t)):
            t = (t + timedelta(days=1)).replace(hour=0, minute=0)
            continue
        if not ok(hr, t.hour):
            t = t.replace(minute=0) + timedelta(hours=1)
            continue
        if ok(mi, t.minute):
            return t
        t += timedelta(minutes=1)
    raise ValueError(f"cron_next: {expr!r} never fires within 4 years")


def run_scheduler(
    schedule: str,
    run: "Callable[[Any], Any]",
    *,
    start,
    state_path: str | None = None,
    clock: "Callable[[], Any]",
    sleeper: "Callable[[float], None]",
    max_ticks: int | None = None,
    catchup: bool = False,
    max_catchup: int | None = None,
    on_tick_failure: "Callable[[Any, BaseException], None] | None" = None,
):
    """The long-running loop dag.py outsources to Airflow's scheduler:
    fire ``run(logical_dt)`` at every cron tick of ``schedule``
    (dag.py:28 uses ``'0 8 * * *'``), surviving restarts.

    Semantics, Airflow-shaped:

    - ``logical_dt`` passed to ``run`` is the TICK time (the schedule's
      logical date), not the wall-clock moment the run started.
    - The last COMPLETED tick persists to ``state_path`` (atomic
      tmp+rename, same idiom as run_pipeline) — a restarted daemon
      resumes after it, never refiring a completed tick (exactly-once
      per tick, the streaming checkpoint contract applied to time).
    - ``catchup=True`` replays every missed tick since the recorded one
      in order (Airflow's catchup); ``catchup=False`` (the default, and
      the modern Airflow default) jumps to the latest missed tick and
      runs only that, then continues on schedule.
    - a tick whose ``run`` RAISES is not recorded as completed:
      ``on_tick_failure`` fires (the alert surface) and the scheduler
      stops — depends-on-past at the scheduler level; the operator
      decides whether to clear state or rerun to success, exactly like
      run_pipeline's halt-on-exhausted-retries.  Wrap ``run`` in
      run_pipeline for per-task retries underneath.

    - ``max_catchup`` (``catchup=True`` only) caps how many missed
      ticks replay in one burst after long downtime: only the LATEST
      ``max_catchup`` missed ticks run (the older backlog is skipped,
      exactly what an operator restarting a daemon after a week wants
      instead of a hundred stale reruns).  ``None`` = unbounded.

    Long-running ticks: ``run`` may overrun its own interval.  The loop
    re-reads the clock after every tick, so with ``catchup=False`` the
    ticks that became due DURING a slow run collapse to the single
    latest one (no pile-up), and with ``catchup=True`` they replay in
    order — the same semantics as for downtime, applied mid-loop.

    ``state_path`` may be SHARED with :func:`run_pipeline` (wrap ``run``
    in run_pipeline on the same file): the scheduler re-reads the file
    and rewrites only its own ``__scheduler__`` key after each tick, so
    task statuses written during the tick are never clobbered.

    ``clock``/``sleeper`` are injected (tests pass a fake pair;
    production passes ``datetime.now`` and a seconds-sleeper).  The
    pair must be COHERENT: after ``sleeper(s)`` the clock must have
    advanced ~``s`` seconds — a no-op sleeper with a frozen clock makes
    the wait loop spin.  ``max_ticks`` bounds the loop (None = run
    forever).  Returns the list of logical datetimes that ran.
    """
    if max_catchup is not None and max_catchup < 1:
        raise ValueError(f"run_scheduler: max_catchup must be >= 1, got {max_catchup}")
    state = _load_state(state_path)
    last = state.get("__scheduler__", {}).get("last_tick")
    if last is not None:
        from datetime import datetime

        last = datetime.fromisoformat(last)
    anchor = last
    ran = []
    ticks = 0
    while max_ticks is None or ticks < max_ticks:
        now = clock()
        base = anchor if anchor is not None else start
        nxt = cron_next(schedule, base)
        if nxt > now:
            missed = []
        else:
            # collect ticks <= now
            missed = [nxt]
            while True:
                n2 = cron_next(schedule, missed[-1])
                if n2 > now:
                    break
                missed.append(n2)
            if not catchup:
                missed = missed[-1:]
            elif max_catchup is not None and len(missed) > max_catchup:
                missed = missed[-max_catchup:]
        if not missed:
            # sleep until the next tick, then loop re-reads the clock
            sleeper((nxt - now).total_seconds())
            anchor = base
            continue
        for tick in missed:
            try:
                run(tick)
            except Exception as exc:  # noqa: BLE001 — tick boundary
                if on_tick_failure is not None:
                    on_tick_failure(tick, exc)
                raise
            # read-modify-write of ONLY the __scheduler__ key: `run` may
            # have written task statuses to the same file (run_pipeline on
            # a shared state_path) — persisting our startup snapshot would
            # clobber them back to stale values (e.g. revert a
            # rerun-to-success to 'failed', wrongly blocking the next tick).
            state = _load_state(state_path)
            state["__scheduler__"] = {"last_tick": tick.isoformat()}
            _save_state(state_path, state)
            ran.append(tick)
            ticks += 1
            anchor = tick
            if max_ticks is not None and ticks >= max_ticks:
                break
    return ran
