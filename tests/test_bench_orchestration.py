"""bench.py orchestration: the driver-facing artifact contract.

Round-4 post-mortem: the official perf artifact was EMPTY because the old
bench printed one buffered JSON line only after every phase finished and
the driver's timeout killed it first. These tests pin the replacement
contract — a cumulative, parseable summary line after EVERY phase, a wall
budget that records skipped phases, a retry pass for transient failures,
and the wedge-wait that stops a hung tunnel from eating every phase's
subprocess timeout — without touching any device or subprocess (all
collaborators are monkeypatched).
"""

import json

import pytest

import bench


class FakeClock:
    def __init__(self):
        self.t = 0.0
        self.sleeps = []

    def monotonic(self):
        return self.t

    def time(self):
        return self.t

    def sleep(self, s):
        self.sleeps.append(s)
        self.t += s


@pytest.fixture()
def clock(monkeypatch):
    # swap bench's `time` module reference for the fake (NOT the global
    # time module — pytest itself depends on real time.monotonic)
    clk = FakeClock()
    monkeypatch.setattr(bench, "time", clk)
    monkeypatch.setattr(bench, "_wait_for_tunnel", lambda: True)
    monkeypatch.setattr(bench.sys, "argv", ["bench.py"])
    return clk


def _summaries(capsys):
    """Every stdout line must parse as a cumulative summary JSON."""
    lines = [ln for ln in capsys.readouterr().out.strip().splitlines() if ln]
    return [json.loads(ln) for ln in lines]


def test_streaming_summary_after_every_phase(monkeypatch, clock, capsys):
    plan = [("teacher", 100), ("pruned", 100), ("kd_step", 100)]
    monkeypatch.setattr(bench, "PHASE_PLAN", plan)
    monkeypatch.setattr(
        bench, "_run_phase",
        lambda name, timeout: {"tput": {"teacher": 880.0, "pruned": 2018.0}[name]})
    monkeypatch.setattr(bench, "_run_kd", lambda: {"value": 57.0})
    monkeypatch.setenv("BENCH_BUDGET_S", "3300")

    bench.main()
    out = _summaries(capsys)
    # one parseable line per phase: a kill after ANY phase leaves a valid tail
    assert len(out) == 3
    assert out[0]["teacher_pairs_per_sec"] == 880.0 and out[0]["value"] is None
    assert out[1]["value"] == 2018.0
    assert out[1]["vs_baseline"] == pytest.approx(2018.0 / 880.0, rel=1e-3)
    assert out[2]["kd_step_ms_b16_224px"] == 57.0
    assert out[2]["completed_phases"] == ["teacher", "pruned", "kd_step"]
    assert out[2]["failed_phases"] == [] and out[2]["skipped_phases"] == []


def test_budget_skips_remaining_phases(monkeypatch, clock, capsys):
    plan = [("teacher", 100), ("pruned", 100), ("serving", 100)]
    monkeypatch.setattr(bench, "PHASE_PLAN", plan)

    def slow_phase(name, timeout):
        clock.t += 500.0  # each phase costs 500 "seconds"
        return {"tput": 1.0}

    monkeypatch.setattr(bench, "_run_phase", slow_phase)
    monkeypatch.setenv("BENCH_BUDGET_S", "600")  # only the first phase fits

    bench.main()
    out = _summaries(capsys)
    final = out[-1]
    assert final["completed_phases"] == ["teacher"]
    assert set(final["skipped_phases"]) == {"pruned", "serving"}
    # the final line (not just a mid-run one) must carry the skipped list
    assert json.loads(json.dumps(final))  # parseable end-to-end


def test_failure_is_recorded_and_retried(monkeypatch, clock, capsys):
    plan = [("teacher", 100), ("pruned", 100)]
    monkeypatch.setattr(bench, "PHASE_PLAN", plan)
    monkeypatch.setattr(bench, "_tunnel_alive", lambda: True)
    calls = {"teacher": 0}

    def flaky(name, timeout):
        if name == "teacher":
            calls["teacher"] += 1
            if calls["teacher"] == 1:
                raise RuntimeError("transient wedge")
            return {"tput": 880.0}
        return {"tput": 2018.0}

    monkeypatch.setattr(bench, "_run_phase", flaky)
    monkeypatch.setenv("BENCH_BUDGET_S", "3300")

    bench.main()
    out = _summaries(capsys)
    assert out[0]["failed_phases"] == ["teacher"]
    # retry pass recovered the headline: failed cleared, ratio present
    assert out[-1]["failed_phases"] == []
    assert out[-1]["vs_baseline"] == pytest.approx(2018.0 / 880.0, rel=1e-3)


def test_wedge_wait_blocks_dispatch_until_tunnel_recovers(
        monkeypatch, clock, capsys):
    """After a failure, the next phase must NOT be dispatched into an
    unresponsive tunnel (it would burn its whole subprocess timeout) —
    bench waits for the end-to-end probe to pass again."""
    plan = [("teacher", 100), ("pruned", 100)]
    monkeypatch.setattr(bench, "PHASE_PLAN", plan)
    probes = {"n": 0}

    def probe():
        probes["n"] += 1
        return probes["n"] > 2  # down for the first two probes, then up

    monkeypatch.setattr(bench, "_tunnel_alive", probe)
    ran = []

    def phases(name, timeout):
        ran.append(name)
        if name == "teacher" and ran.count("teacher") == 1:
            raise RuntimeError("wedge")
        return {"tput": 1.0}

    monkeypatch.setattr(bench, "_run_phase", phases)
    monkeypatch.setenv("BENCH_BUDGET_S", "3300")

    bench.main()
    assert clock.sleeps, "should have waited for the tunnel before dispatching"
    assert "pruned" in ran  # dispatched only after the probe recovered
    out = _summaries(capsys)
    assert out[-1]["failed_phases"] == []  # retry pass recovered teacher


def test_wedge_wait_skips_when_budget_exhausts(monkeypatch, clock, capsys):
    plan = [("teacher", 100), ("pruned", 100)]
    monkeypatch.setattr(bench, "PHASE_PLAN", plan)
    monkeypatch.setattr(bench, "_tunnel_alive", lambda: False)  # never recovers

    def phases(name, timeout):
        if name == "teacher":
            raise RuntimeError("wedge")
        raise AssertionError("pruned must not be dispatched into a dead tunnel")

    monkeypatch.setattr(bench, "_run_phase", phases)
    monkeypatch.setenv("BENCH_BUDGET_S", "900")

    bench.main()
    out = _summaries(capsys)
    assert out[-1]["failed_phases"] == ["teacher"]
    assert "pruned" in out[-1]["skipped_phases"]
