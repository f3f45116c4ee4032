"""Script scheduler: `!scheduler` — timer (cron) jobs over MLSQL script
files plus run-after dependencies.

Reference: tech/mlsql/ets/SchedulerCommand.scala:28-140 (stores
TimerJob/DependencyJob rows in DBStore, validates cron4j patterns,
resolves script ids through the console REST API) and
tech/mlsql/scheduler/client/* (the cron4j runner).  This PySpark-native
version keeps the same job model — timer jobs keyed by script, cron
expression, dependency jobs that run after a parent succeeds — but jobs
reference SCRIPT FILES on shared storage (the same unit ``include src``
uses) instead of console script ids, and the store is a JSON file under
the engine home (or in-memory when no home is set).

Cron subset: standard 5 fields `min hour dom month dow` with `*`,
lists, ranges and steps (cron4j's core syntax; dow 0=Sunday).
"""

from __future__ import annotations

import json
import os
import threading
import time
from dataclasses import dataclass, field
from typing import Callable


class CronPattern:
    """5-field cron matcher: minute hour day-of-month month day-of-week."""

    _BOUNDS = [(0, 59), (0, 23), (1, 31), (1, 12), (0, 6)]

    def __init__(self, expr: str):
        fields = expr.split()
        if len(fields) != 5:
            raise ValueError(
                f"cron pattern needs 5 fields 'min hour dom month dow', "
                f"got {expr!r}")
        self.expr = expr
        self.sets: list[set[int]] = [
            self._parse_field(f, lo, hi)
            for f, (lo, hi) in zip(fields, self._BOUNDS)]

    @staticmethod
    def _parse_field(f: str, lo: int, hi: int) -> set[int]:
        out: set[int] = set()
        for part in f.split(","):
            step = 1
            if "/" in part:
                part, step_s = part.split("/", 1)
                step = int(step_s)
                if step < 1:
                    raise ValueError(f"bad cron step in {f!r}")
            if part in ("*", ""):
                lo2, hi2 = lo, hi
            elif "-" in part:
                a, b = part.split("-", 1)
                lo2, hi2 = int(a), int(b)
            elif step != 1:
                # standard cron: 'v/step' steps from v through the max
                # ('5/15 * * * *' = minutes 5,20,35,50 — not just 5)
                lo2, hi2 = int(part), hi
            else:
                lo2 = hi2 = int(part)
            if lo2 < lo or hi2 > hi or lo2 > hi2:
                raise ValueError(f"cron field {f!r} out of range [{lo},{hi}]")
            out.update(range(lo2, hi2 + 1, step))
        return out

    def matches(self, t: "time.struct_time") -> bool:
        mi, h, dom, mo, dow = self.sets
        # struct_time: tm_wday 0=Monday -> cron 0=Sunday
        cron_dow = (t.tm_wday + 1) % 7
        return (t.tm_min in mi and t.tm_hour in h and t.tm_mday in dom
                and t.tm_mon in mo and cron_dow in dow)


@dataclass
class SchedulerService:
    """Job store + runner.  One per Engine home (or per Engine when no
    home).  The runner thread ticks once a minute (cron granularity);
    `run_due(t)` is the testable core — the thread is just a loop
    around it."""

    store_path: str | None = None
    timer_jobs: dict[str, str] = field(default_factory=dict)   # path -> cron
    dependencies: dict[str, list[str]] = field(default_factory=dict)
    # parent path -> [dependent script paths]
    execute: Callable[[str], object] | None = None  # set by the ET
    last_run: dict[str, str] = field(default_factory=dict)     # path -> iso
    last_error: dict[str, str] = field(default_factory=dict)
    _thread: "threading.Thread | None" = None
    _stop: "threading.Event" = field(default_factory=threading.Event)
    _last_minute: int = -1   # epoch seconds of the last processed minute

    # ---- persistence -------------------------------------------------
    def load(self) -> None:
        if self.store_path and os.path.exists(self.store_path):
            with open(self.store_path) as f:
                d = json.load(f)
            self.timer_jobs = d.get("timer_jobs", {})
            self.dependencies = d.get("dependencies", {})

    def save(self) -> None:
        if self.store_path:
            os.makedirs(os.path.dirname(self.store_path), exist_ok=True)
            with open(self.store_path, "w") as f:
                json.dump({"timer_jobs": self.timer_jobs,
                           "dependencies": self.dependencies}, f, indent=1)

    # ---- job table ---------------------------------------------------
    def add_timer(self, path: str, cron: str) -> None:
        if cron:
            CronPattern(cron)  # validate (reference: new SchedulingPattern)
            self.timer_jobs[path] = cron
        else:
            # empty cron removes the job AND its dependency edges
            # (SchedulerCommand.scala:82-86)
            self.timer_jobs.pop(path, None)
            self.dependencies.pop(path, None)
            for deps in self.dependencies.values():
                if path in deps:
                    deps.remove(path)
        self.save()

    def add_dependency(self, path: str, parents: list[str]) -> None:
        for parent in parents:
            if parent not in self.timer_jobs:
                raise ValueError(
                    f"{parent} should be timer job (add it with "
                    f"'!scheduler \"{parent}\" with \"<cron>\"' first)")
            self.dependencies.setdefault(parent, [])
            if path not in self.dependencies[parent]:
                self.dependencies[parent].append(path)
        self.save()

    # ---- running -----------------------------------------------------
    def run_job(self, path: str, _seen: set | None = None) -> None:
        """Run one script file, then its dependents (depth-first; a
        failing parent stops its chain, matching run-after-success).
        A visited set breaks dependency cycles — A→B→A runs each job
        once per trigger instead of recursing forever."""
        assert self.execute is not None, "scheduler has no engine binding"
        seen = _seen if _seen is not None else set()
        if path in seen:
            return
        seen.add(path)
        stamp = time.strftime("%Y-%m-%dT%H:%M:%S")
        try:
            # the open() is INSIDE the isolation block: a deleted script
            # must record last_error and let the other due jobs run,
            # not unwind the whole tick
            with open(path) as f:
                script = f.read()
            self.execute(script)
            self.last_run[path] = stamp
            self.last_error.pop(path, None)
        except Exception as e:  # noqa: BLE001 — job isolation: one
            # failing job must not kill the scheduler loop
            self.last_error[path] = f"{stamp} {e}"
            return
        for dep in self.dependencies.get(path, []):
            self.run_job(dep, seen)

    def run_due(self, t: "time.struct_time") -> list[str]:
        ran = []
        for path, cron in sorted(self.timer_jobs.items()):
            if CronPattern(cron).matches(t):
                self.run_job(path)
                ran.append(path)
        return ran

    # ---- background loop ---------------------------------------------
    def start(self) -> bool:
        if self._thread is not None and self._thread.is_alive():
            return False
        self._stop.clear()

        def loop():
            while not self._stop.wait(1.0):
                now_epoch = int(time.time()) // 60 * 60
                if self._last_minute < 0:
                    self._last_minute = now_epoch - 60
                # evaluate EVERY minute since the last processed one: a
                # job running past the next boundary must not swallow
                # other jobs' firings in the skipped minutes
                m = self._last_minute + 60
                while m <= now_epoch and not self._stop.is_set():
                    self._last_minute = m
                    try:
                        self.run_due(time.localtime(m))
                    except Exception:  # noqa: BLE001 — keep ticking
                        pass
                    m += 60

        self._thread = threading.Thread(
            target=loop, name="mlsql-scheduler", daemon=True)
        self._thread.start()
        return True

    def stop(self) -> bool:
        if self._thread is None:
            return False
        self._stop.set()
        self._thread.join(timeout=5)
        if self._thread.is_alive():
            # keep the handle: discarding it would let a later start()
            # clear _stop and REVIVE this loop next to a new one
            # (double-running every job)
            return False
        self._thread = None
        return True
