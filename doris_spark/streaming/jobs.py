"""Doris JOB scheduler (CREATE JOB ... ON SCHEDULE ... DO <stmt>).

Reference: fe/fe-core/.../job/* (JobManager; doc suite
regression-test/suites/doc/data-operate/scheduler/job-scheduler.md.groovy)
— scheduled SQL, typically INSERT INTO refreshes, with one-time (AT ...)
and recurring (EVERY n UNIT [STARTS ...] [ENDS ...]) triggers plus
PAUSE/RESUME/DROP and a jobs() catalog view.

Spark-first shape: the scheduler is a catalog of parsed jobs; execution
is an explicit `run_due(now)` tick that runs each due statement through
Engine.sql (so dialect/macros/MV-rewrite/DML all apply). The tick is
deliberately clock-free — the orchestrator (cron, Airflow, a streaming
foreachBatch heartbeat) owns wall time, which keeps job execution
deterministic and testable; at cluster scale each tick is just a Spark
job like any other. Statements that return data are counted, not
retained (Doris jobs are load jobs; their observable effect is the
target table)."""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from datetime import datetime, timedelta

_UNIT_SECS = {
    "SECOND": 1, "MINUTE": 60, "HOUR": 3600, "DAY": 86400, "WEEK": 604800,
}

_CREATE_RE = re.compile(
    r"^\s*CREATE\s+JOB\s+`?(\w+)`?\s+ON\s+SCHEDULE\s+"
    r"(?:AT\s+'([^']+)'"
    r"|EVERY\s+(\d+)\s+(SECOND|MINUTE|HOUR|DAY|WEEK)S?"
    r"(?:\s+STARTS\s+'([^']+)')?"
    r"(?:\s+ENDS\s+'([^']+)')?)"
    r"\s+DO\s+(.+)$",
    re.I | re.S,
)


def _ts(text: str) -> datetime:
    text = text.strip()
    for fmt in ("%Y-%m-%d %H:%M:%S", "%Y-%m-%d %H:%M", "%Y-%m-%d"):
        try:
            return datetime.strptime(text, fmt)
        except ValueError:
            continue
    raise ValueError(f"unparseable schedule timestamp {text!r}")


@dataclass
class Job:
    name: str
    statement: str
    at: datetime | None = None          # one-time trigger
    every_secs: int | None = None       # recurring interval
    starts: datetime | None = None
    ends: datetime | None = None
    status: str = "RUNNING"             # RUNNING | PAUSED | FINISHED
    next_run: datetime | None = None
    run_count: int = 0
    last_run: datetime | None = None
    history: list = field(default_factory=list)


class JobScheduler:
    """Engine-attached job catalog + clock-free tick executor."""

    def __init__(self, engine):
        self._engine = engine
        self._jobs: dict[str, Job] = {}

    # ------------------------------------------------------------ DDL

    def create(self, sql_text: str) -> Job:
        m = _CREATE_RE.match(sql_text.strip().rstrip(";"))
        if m is None:
            raise ValueError("malformed CREATE JOB statement")
        name, at, n, unit, starts, ends, stmt = m.groups()
        if name in self._jobs:
            raise ValueError(f"job {name} already exists")
        job = Job(name=name, statement=stmt.strip())
        if at is not None:
            job.at = _ts(at)
            job.next_run = job.at
        else:
            job.every_secs = int(n) * _UNIT_SECS[unit.upper()]
            job.starts = _ts(starts) if starts else None
            job.ends = _ts(ends) if ends else None
            job.next_run = job.starts  # None = due at first tick
        self._jobs[name] = job
        return job

    def _get(self, name: str) -> Job:
        if name not in self._jobs:
            raise ValueError(f"unknown job {name}")
        return self._jobs[name]

    def pause(self, name: str) -> None:
        self._get(name).status = "PAUSED"

    def resume(self, name: str) -> None:
        job = self._get(name)
        if job.status == "PAUSED":
            job.status = "RUNNING"

    def drop(self, name: str) -> None:
        self._jobs.pop(name, None)

    # ------------------------------------------------------------ tick

    def run_due(self, now: datetime) -> list[str]:
        """Execute every job due at `now`; returns executed job names.
        Recurring jobs advance next_run by whole intervals past `now`
        (a stalled orchestrator doesn't replay missed intervals — Doris
        skips them the same way); ENDS marks the job FINISHED."""
        ran = []
        for job in list(self._jobs.values()):
            if job.status != "RUNNING":
                continue
            if job.at is not None:
                if now >= job.at:
                    self._execute(job, now)
                    job.status = "FINISHED"
                    ran.append(job.name)
                continue
            if job.ends is not None and now > job.ends:
                job.status = "FINISHED"
                continue
            if job.next_run is not None and now < job.next_run:
                continue
            self._execute(job, now)
            ran.append(job.name)
            base = job.next_run or now
            step = timedelta(seconds=job.every_secs)
            nxt = base + step
            while nxt <= now:
                nxt += step
            job.next_run = nxt
            if job.ends is not None and job.next_run > job.ends:
                job.status = "FINISHED"
        return ran

    def _execute(self, job: Job, now: datetime) -> None:
        out = self._engine.sql(job.statement)
        out.collect()  # force the side effect (INSERT/UPDATE/...)
        job.run_count += 1
        job.last_run = now
        job.history.append(now)

    # ------------------------------------------------------------ show

    def show(self):
        rows = [
            (
                j.name,
                "ONE_TIME" if j.at is not None else "RECURRING",
                j.status,
                str(j.next_run) if j.next_run else None,
                j.run_count,
                j.statement,
            )
            for j in self._jobs.values()
        ]
        return self._engine.spark.createDataFrame(
            rows,
            "name string, type string, status string, next_run string, "
            "run_count bigint, statement string",
        )
