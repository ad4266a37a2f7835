"""Doris JOB scheduler (streaming/jobs.py; reference: fe job manager,
doc suite data-operate/scheduler/job-scheduler.md.groovy)."""

from __future__ import annotations

from datetime import datetime

import pytest

from doris_spark.engine import Engine


@pytest.fixture
def eng(spark):
    e = Engine(spark)
    base = spark.createDataFrame([(1, 10.0)], "id bigint, v double")
    e.create_table(base, "job_target")
    return e


def test_one_time_job_fires_once(eng):
    eng.sql("CREATE JOB j1 ON SCHEDULE AT '2025-01-01 00:00:00' "
            "DO INSERT INTO job_target VALUES (2, 20.0)")
    assert eng.jobs.run_due(datetime(2024, 12, 31)) == []
    assert eng.jobs.run_due(datetime(2025, 1, 1)) == ["j1"]
    # finished: never fires again
    assert eng.jobs.run_due(datetime(2025, 1, 2)) == []
    assert eng.sql("SELECT count(*) AS n FROM job_target").collect()[0]["n"] == 2
    st = {r["name"]: r["status"] for r in eng.sql("SHOW JOBS").collect()}
    assert st["j1"] == "FINISHED"


def test_recurring_job_interval_and_ends(eng):
    eng.sql("CREATE JOB j2 ON SCHEDULE EVERY 1 DAY STARTS '2025-01-01 00:00:00' "
            "ENDS '2025-01-03 00:00:00' "
            "DO INSERT INTO job_target SELECT id + 100, v FROM job_target WHERE id = 1")
    assert eng.jobs.run_due(datetime(2025, 1, 1)) == ["j2"]
    # not due again same day
    assert eng.jobs.run_due(datetime(2025, 1, 1, 12)) == []
    assert eng.jobs.run_due(datetime(2025, 1, 2)) == ["j2"]
    assert eng.jobs.run_due(datetime(2025, 1, 3)) == ["j2"]
    # past ENDS -> finished
    assert eng.jobs.run_due(datetime(2025, 1, 4)) == []
    n = eng.sql("SELECT count(*) AS n FROM job_target WHERE id = 101").collect()[0]["n"]
    assert n == 3


def test_missed_intervals_skip_not_replay(eng):
    eng.sql("CREATE JOB j3 ON SCHEDULE EVERY 1 HOUR STARTS '2025-01-01 00:00:00' "
            "DO INSERT INTO job_target VALUES (7, 7.0)")
    # orchestrator stalls 5 hours: ONE catch-up run, not five
    assert eng.jobs.run_due(datetime(2025, 1, 1, 5, 30)) == ["j3"]
    assert eng.sql("SELECT count(*) AS n FROM job_target WHERE id = 7").collect()[0]["n"] == 1
    # next whole interval after now
    nxt = [r["next_run"] for r in eng.sql("SHOW JOBS").collect() if r["name"] == "j3"][0]
    assert nxt == "2025-01-01 06:00:00"


def test_pause_resume_drop(eng):
    eng.sql("CREATE JOB j4 ON SCHEDULE EVERY 1 MINUTE "
            "DO INSERT INTO job_target VALUES (9, 9.0)")
    eng.sql("PAUSE JOB j4")
    assert eng.jobs.run_due(datetime(2025, 1, 1)) == []
    eng.sql("RESUME JOB j4")
    assert eng.jobs.run_due(datetime(2025, 1, 1)) == ["j4"]
    eng.sql("DROP JOB j4")
    assert eng.sql("SHOW JOBS").count() == 0


def test_duplicate_and_malformed_rejected(eng):
    eng.sql("CREATE JOB j5 ON SCHEDULE AT '2025-01-01 00:00:00' DO SELECT 1")
    with pytest.raises(ValueError):
        eng.sql("CREATE JOB j5 ON SCHEDULE AT '2025-01-01 00:00:00' DO SELECT 1")
    with pytest.raises(ValueError):
        eng.sql("CREATE JOB bad ON SCHEDULE WHENEVER DO SELECT 1")
