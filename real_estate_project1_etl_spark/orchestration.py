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
