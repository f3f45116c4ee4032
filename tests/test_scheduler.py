"""SchedulerCommand (`!scheduler`) + EngineResource (`!resource`) —
streamingpro_spark/scheduler.py, operators/infra_cmds.py."""

import time

import pytest


# ---------------------------------------------------------------------------
# CronPattern
# ---------------------------------------------------------------------------

def _t(minute=0, hour=0, mday=1):
    """struct_time for 2024-01-<mday>.  Jan 1 2024 is a Monday, so
    mday=1 is cron dow 1 and mday=7 is Sunday (cron dow 0)."""
    return time.struct_time(time.strptime(
        f"2024-01-{mday:02d} {hour:02d}:{minute:02d}", "%Y-%m-%d %H:%M"))


def test_cron_basic_fields():
    from streamingpro_spark.scheduler import CronPattern
    p = CronPattern("30 3 * * *")
    assert p.matches(_t(minute=30, hour=3))
    assert not p.matches(_t(minute=31, hour=3))
    assert not p.matches(_t(minute=30, hour=4))


def test_cron_steps_ranges_lists():
    from streamingpro_spark.scheduler import CronPattern
    p = CronPattern("*/15 8-10 1,15 * *")
    assert p.matches(_t(minute=45, hour=9, mday=1))
    assert not p.matches(_t(minute=46, hour=9, mday=1))
    q = CronPattern("0 0 * * 1-5")      # weekdays (cron 1=Monday)
    assert q.matches(_t(mday=1))        # Jan 1 2024: Monday
    assert not q.matches(_t(mday=7))    # Jan 7 2024: Sunday


def test_cron_validation_errors():
    from streamingpro_spark.scheduler import CronPattern
    with pytest.raises(ValueError):
        CronPattern("61 * * * *")       # out of range
    with pytest.raises(ValueError):
        CronPattern("* * * *")          # 4 fields


# ---------------------------------------------------------------------------
# SchedulerService
# ---------------------------------------------------------------------------

def test_service_run_due_and_dependencies(tmp_path):
    from streamingpro_spark.scheduler import SchedulerService
    ran = []
    svc = SchedulerService()
    svc.execute = ran.append
    a = tmp_path / "a.mlsql"
    b = tmp_path / "b.mlsql"
    a.write_text("select 1 as x as a_out;")
    b.write_text("select 2 as x as b_out;")
    svc.add_timer(str(a), "0 3 * * *")
    svc.add_dependency(str(b), [str(a)])
    assert svc.run_due(_t(minute=0, hour=3)) == [str(a)]
    assert ran == [a.read_text(), b.read_text()]   # parent then dependent
    assert svc.run_due(_t(minute=1, hour=3)) == []


def test_service_failing_parent_skips_dependent(tmp_path):
    from streamingpro_spark.scheduler import SchedulerService
    ran = []
    svc = SchedulerService()

    def boom(script):
        ran.append(script)
        raise RuntimeError("job failed")

    svc.execute = boom
    a = tmp_path / "a.mlsql"
    b = tmp_path / "b.mlsql"
    a.write_text("bad;")
    b.write_text("good;")
    svc.add_timer(str(a), "* * * * *")
    svc.add_dependency(str(b), [str(a)])
    svc.run_due(_t())
    assert ran == ["bad;"]              # dependent never ran
    assert str(a) in svc.last_error


def test_service_dependency_requires_timer_parent(tmp_path):
    from streamingpro_spark.scheduler import SchedulerService
    svc = SchedulerService()
    with pytest.raises(ValueError, match="should be timer job"):
        svc.add_dependency("dep", ["not-registered"])


def test_service_store_roundtrip(tmp_path):
    from streamingpro_spark.scheduler import SchedulerService
    store = str(tmp_path / "sched" / "scheduler.json")
    svc = SchedulerService(store_path=store)
    svc.add_timer("/x/a.mlsql", "0 0 * * *")
    svc2 = SchedulerService(store_path=store)
    svc2.load()
    assert svc2.timer_jobs == {"/x/a.mlsql": "0 0 * * *"}
    svc2.add_timer("/x/a.mlsql", "")      # empty cron removes
    svc3 = SchedulerService(store_path=store)
    svc3.load()
    assert svc3.timer_jobs == {}


# ---------------------------------------------------------------------------
# the !scheduler macro end-to-end through the engine
# ---------------------------------------------------------------------------

def test_scheduler_macro_add_list_run(engine, spark, tmp_path):
    job = tmp_path / "job.mlsql"
    job.write_text("select 41 + 1 as answer as sched_out;")
    listing = engine.execute(f"""
    !scheduler "{job}" with "0 4 * * *";
    !scheduler list;
    """)
    rows = listing.collect()
    assert len(rows) == 1 and rows[0]["cron"] == "0 4 * * *"
    engine.execute(f'!scheduler run "{job}";')
    assert spark.table("sched_out").collect()[0]["answer"] == 42
    after = engine.execute('!scheduler list;').collect()
    assert after[0]["lastRun"] != ""
    # remove
    engine.execute(f'!scheduler "{job}" with "";')
    assert engine.execute('!scheduler list;').collect() == []


def test_scheduler_background_thread_runs_due_job(engine, spark, tmp_path):
    """start → the minute loop fires a `* * * * *` job within ~2s of the
    first tick; stop terminates the thread."""
    job = tmp_path / "tick.mlsql"
    job.write_text("select 'ticked' as v as tick_out;")
    engine.execute(f"""
    !scheduler "{job}" with "* * * * *";
    !scheduler start;
    """)
    try:
        deadline = time.time() + 10
        ok = False
        while time.time() < deadline:
            try:
                if spark.table("tick_out").collect()[0]["v"] == "ticked":
                    ok = True
                    break
            except Exception:
                pass
            time.sleep(0.5)
        assert ok, "scheduler thread never ran the due job"
    finally:
        out = engine.execute('!scheduler stop;').collect()
        assert out[0]["scheduler"] == "stopped"


# ---------------------------------------------------------------------------
# EngineResource
# ---------------------------------------------------------------------------

def test_engine_resource_status_local(engine):
    rows = engine.execute(
        "run command as EngineResource.`` as output;").collect()
    assert rows[0]["master"].startswith("local")
    assert rows[0]["totalCores"] >= 1


def test_engine_resource_resize_rejected_in_local(engine):
    """Resize parity with the reference: local master raises
    (EngineResource.scala:40-43)."""
    with pytest.raises(Exception, match="Local mode"):
        engine.execute('!resource add 8c;')


def test_service_dependency_cycle_runs_each_once(tmp_path):
    """A→B→A dependency cycle: one trigger runs each job exactly once
    (visited set) instead of recursing forever."""
    from streamingpro_spark.scheduler import SchedulerService
    ran = []
    svc = SchedulerService()
    svc.execute = ran.append
    a = tmp_path / "a.mlsql"
    b = tmp_path / "b.mlsql"
    a.write_text("a;")
    b.write_text("b;")
    svc.add_timer(str(a), "* * * * *")
    svc.add_timer(str(b), "* * * * *")
    svc.add_dependency(str(b), [str(a)])
    svc.add_dependency(str(a), [str(b)])
    svc.run_job(str(a))
    assert ran == ["a;", "b;"]


def test_for_child_inherits_home(spark, tmp_path):
    """Sub-script engines (RunScript, scheduler jobs) keep the parent's
    per-owner path prefix — a child without `home` would write relative
    paths outside the multi-tenant sandbox."""
    from streamingpro_spark.engine import Engine
    parent = Engine(spark, owner="alice", home=str(tmp_path))
    child = Engine.for_child(spark, parent.context)
    assert child.context.home == str(tmp_path)
    assert child.context.owner == "alice"
    assert child.context.resource_real_path("data/x.parquet") == \
        parent.context.resource_real_path("data/x.parquet")


def test_cron_value_step():
    from streamingpro_spark.scheduler import CronPattern
    import time as _time
    p = CronPattern("5/15 * * * *")
    mins = p.sets[0]
    assert mins == {5, 20, 35, 50}


def test_scheduler_catches_up_missed_minutes(tmp_path):
    """A job running past the minute boundary must not swallow other
    jobs' firings for the skipped minutes — run_due is evaluated for
    every elapsed minute."""
    import time as _time
    from streamingpro_spark.scheduler import SchedulerService
    svc = SchedulerService()
    ran = []
    svc.execute = lambda s: ran.append(s)
    a = tmp_path / "a.mlsql"
    a.write_text("select 1 as t;")
    svc.timer_jobs[str(a)] = "* * * * *"
    # simulate: loop last processed minute M, clock jumps to M+3
    now = int(_time.time()) // 60 * 60
    svc._last_minute = now - 180
    # inline the loop body logic via run_due over each catchup minute
    m = svc._last_minute + 60
    fired = 0
    while m <= now:
        fired += len(svc.run_due(_time.localtime(m)))
        m += 60
    assert fired == 3


def test_scheduler_service_shared_across_contexts(spark, tmp_path):
    """Two engines (per-request contexts) with the same home must talk
    to the SAME scheduler service — a start from one is visible (and
    stoppable) from the other."""
    from streamingpro_spark import Engine
    e1, e2 = Engine(spark), Engine(spark)
    for e in (e1, e2):
        e.context.home = str(tmp_path)
        e.context.owner = "alice"
    script = tmp_path / "alice" / "job.mlsql"
    script.parent.mkdir(parents=True, exist_ok=True)
    script.write_text("select 1 as t;")
    e1.execute('!scheduler "job.mlsql" with "0 3 * * *";')
    rows = e2.execute("!scheduler list;").collect()
    assert len(rows) == 1 and rows[0]["script"].endswith("job.mlsql")
