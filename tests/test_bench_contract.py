"""bench.py's driver-facing output contract (the round-8 failure):
stdout must be exactly ONE JSON line printed LAST, notes go to stderr,
exit 2 only on in-window taint; the stderr scan classifies JVM ERROR
traces against the timed windows."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _log_line(epoch: float) -> str:
    stamp = time.strftime("%y/%m/%d %H:%M:%S", time.localtime(epoch))
    return (f"{stamp} ERROR DAGScheduler: Failed to update accumulator "
            f"0 (PythonAccumulatorV2) for task 3\n")


def test_scan_classifies_traces_against_windows(tmp_path, monkeypatch):
    base = time.mktime(time.strptime("26/01/02 12:00:00",
                                     "%y/%m/%d %H:%M:%S"))
    log = tmp_path / "jvm.log"
    log.write_text(
        _log_line(base + 5)      # inside [base+3, base+8]
        + _log_line(base + 100)  # outside every window
        + "not an error line\n")
    monkeypatch.setattr(bench, "TIMED_WINDOWS",
                        [("q1", base + 3, base + 8),
                         ("q2", base + 20, base + 25)])
    errors, inside = bench.scan_jvm_stderr(str(log))
    assert len(errors) == 2
    assert len(inside) == 1 and "task 3" in inside[0][1]
    # the ±1 s slack: a trace at window-edge+1s still taints
    monkeypatch.setattr(bench, "TIMED_WINDOWS", [("q1", base + 6, base + 99)])
    _, inside2 = bench.scan_jvm_stderr(str(log))
    assert len(inside2) == 2


def test_main_prints_single_json_line_last(tmp_path, monkeypatch, capfd):
    """Even with stderr notes, stdout is pure JSON and it is the LAST
    thing printed — the driver merges streams and parses the tail."""
    payload = {"metric": "headline_queries_total_sec", "value": 1.0,
               "unit": "sec", "queries": {"q": 1.0}, "sf": 0.1,
               "floor_ratio": {}, "retimed_fresh_session": []}
    monkeypatch.setattr(bench, "_run", lambda: dict(payload))

    def fake_scan(path):
        # an out-of-window teardown note must not break the contract
        return [(0.0, "26/01/02 12:00:00 ERROR teardown")], []
    monkeypatch.setattr(bench, "scan_jvm_stderr", fake_scan)
    bench.main()
    out, err = capfd.readouterr()
    lines = [ln for ln in out.splitlines() if ln.strip()]
    assert len(lines) == 1, out
    parsed = json.loads(lines[0])
    assert parsed["tainted_windows"] == 0
    assert parsed["queries"] == {"q": 1.0}
    assert "OUTSIDE timed windows" in err


def test_main_tainted_exits_2_but_still_emits_json(monkeypatch, capfd):
    payload = {"metric": "headline_queries_total_sec", "value": 1.0,
               "unit": "sec", "queries": {}, "sf": 0.1,
               "floor_ratio": {}, "retimed_fresh_session": []}
    monkeypatch.setattr(bench, "_run", lambda: dict(payload))
    monkeypatch.setattr(
        bench, "scan_jvm_stderr",
        lambda path: ([(1.0, "e")], [(1.0, "26/01/02 12:00:00 ERROR x")]))
    import pytest
    with pytest.raises(SystemExit) as ei:
        bench.main()
    assert ei.value.code == 2
    out, err = capfd.readouterr()
    parsed = json.loads(out.splitlines()[-1])
    assert parsed["tainted_windows"] == 1
    assert "tainted" in err


def test_escalation_needs_ratio_and_absolute_slack():
    """Round-10 policy: a sub-second query at 1.4x floor on pure fixed
    overhead (r9: running_total 0.51s vs 0.359s floor) must NOT
    escalate; a real 1.4x regression on a multi-second query must."""
    # the round-9 false positive: ratio 1.42 but delta only 0.15s
    assert not bench.needs_escalation(0.51, 0.359)
    # ratio under the bound never escalates, whatever the delta
    assert not bench.needs_escalation(12.0, 10.0)
    # a genuine regression: both conditions trip
    assert bench.needs_escalation(4.2, 3.0)
    # on multi-second floors the ratio term is the binding one (ratio
    # > 1.3 implies delta > 0.3 x floor >> the 0.25s constant)
    assert bench.needs_escalation(13.1, 10.0)
    # just over ratio but within the absolute slack floor
    assert not bench.needs_escalation(0.40, 0.30)


def test_retime_subprocess_parses_best_sec_and_probe(monkeypatch):
    class FakeOut:
        returncode = 0
        stdout = ('noise\n{"query": "q1", "best_sec": 1.234, '
                  '"probe": {"ext_cpus": 0.4, "load1": 3.1}}\n')
        stderr = ""
    import subprocess as sp
    monkeypatch.setattr(sp, "run", lambda *a, **k: FakeOut())
    rec = bench.retime_in_subprocess("q1")
    assert rec == {"best_sec": 1.234,
                   "probe": {"ext_cpus": 0.4, "load1": 3.1}}

    # a pre-round-11 child without a probe still parses (empty probe —
    # treated as unknown, i.e. cannot exonerate)
    class OldOut:
        returncode = 0
        stdout = '{"query": "q1", "best_sec": 1.234}\n'
        stderr = ""
    monkeypatch.setattr(sp, "run", lambda *a, **k: OldOut())
    assert bench.retime_in_subprocess("q1") == {"best_sec": 1.234,
                                                "probe": {}}

    class BadOut:
        returncode = 1
        stdout = ""
        stderr = "boom"
    monkeypatch.setattr(sp, "run", lambda *a, **k: BadOut())
    assert bench.retime_in_subprocess("q1") is None


def test_tree_pids_includes_descendants_not_strangers():
    """The probe's own-tree exclusion: a spawned child is in the tree,
    init and our own parent are not."""
    import subprocess
    p = subprocess.Popen([sys.executable, "-c",
                          "import time; time.sleep(30)"])
    try:
        tree = bench.tree_pids(os.getpid())
        assert os.getpid() in tree
        assert p.pid in tree
        assert 1 not in tree
        assert os.getppid() not in tree
    finally:
        p.terminate()
        p.wait()


def test_probe_host_shape():
    """probe_host returns the two stamped fields; on this Linux box
    both are real measurements (>= 0)."""
    pr = bench.probe_host(window=0.05)
    assert set(pr) == {"ext_cpus", "load1"}
    assert pr["ext_cpus"] >= 0.0
    assert pr["load1"] >= 0.0


def test_load_suspect_policy():
    """A big ratio is load_suspect ONLY when (a) it trips the
    escalation policy AND (b) its measurement ran hot or unprobed —
    a quiet-measured big ratio is a real regression signal and must
    NOT be exonerated; a sub-policy ratio is never suspect however
    hot the host was."""
    hot = {"ext_cpus": 8.0, "load1": 40.0}
    quiet = {"ext_cpus": 0.3, "load1": 2.0}
    unknown = {"ext_cpus": -1.0, "load1": 2.0}
    # not flagged by policy -> never suspect, even hot
    assert not bench.is_load_suspect(1.0, 1.0, hot)
    assert not bench.is_load_suspect(0.51, 0.359, hot)
    # flagged + hot -> suspect (round-10's near_dedup 2.12x case)
    assert bench.is_load_suspect(7.5, 3.548, hot)
    # flagged + quiet -> NOT suspect: adjudicable as a regression
    assert not bench.is_load_suspect(7.5, 3.548, quiet)
    # flagged + unknown probe -> suspect (can't prove quiet)
    assert bench.is_load_suspect(7.5, 3.548, unknown)
    assert bench.is_load_suspect(7.5, 3.548, None)
    # the threshold itself is exclusive: exactly-at-threshold is quiet
    at = {"ext_cpus": bench.LOAD_QUIET_EXT_CPUS, "load1": 5.0}
    assert not bench.is_load_suspect(7.5, 3.548, at)
    # a failed fresh-session retime's probe SUPERSEDES the in-session
    # one: quiet retime that confirmed the slow timing = real
    # regression even if the original sample was hot...
    assert not bench.is_load_suspect(
        7.5, 3.548, {"ext_cpus": 9.0, "load1": 40.0,
                     "retime_ext_cpus": 0.2})
    # ...and a hot retime exonerates nothing even if the original
    # probe read quiet (mid-sample burst invisible to the pre-probe)
    assert bench.is_load_suspect(
        7.5, 3.548, {"ext_cpus": 0.1, "load1": 2.0,
                     "retime_ext_cpus": 9.0})
    # an unknown retime probe cannot prove quiet either
    assert bench.is_load_suspect(
        7.5, 3.548, {"ext_cpus": 0.1, "retime_ext_cpus": -1.0})
