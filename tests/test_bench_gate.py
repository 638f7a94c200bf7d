"""The default bench's bounded quiet-launch gate (bench._wait_for_quiet):
contaminated probes trigger sleep-and-reprobe up to the budget; a quiet
first probe starts immediately.  Monkeypatched — no real sleeps."""

import importlib.util
import sys


def _bench():
    spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_quiet_first_probe_starts_immediately(monkeypatch):
    bench = _bench()
    monkeypatch.setattr(bench, "_calibrate", lambda reps=3: 55.0)
    monkeypatch.setattr(bench.time, "sleep",
                        lambda s: (_ for _ in ()).throw(AssertionError(
                            "must not sleep on a quiet probe")))
    probes, waited = bench._wait_for_quiet(max_wait_s=240.0)
    assert probes == [55.0]
    assert waited < 1.0


def test_contaminated_probes_reprobe_until_quiet(monkeypatch):
    bench = _bench()
    seq = iter([90.0, 82.0, 60.0])
    slept = []
    monkeypatch.setattr(bench, "_calibrate", lambda reps=3: next(seq))
    monkeypatch.setattr(bench.time, "sleep", slept.append)
    probes, waited = bench._wait_for_quiet(max_wait_s=240.0)
    assert probes == [90.0, 82.0, 60.0]
    assert slept == [45, 45]


def test_budget_exhausted_proceeds_anyway(monkeypatch):
    bench = _bench()
    monkeypatch.setattr(bench, "_calibrate", lambda reps=3: 99.0)
    clock = {"t": 0.0}

    def fake_sleep(s):
        clock["t"] += s

    monkeypatch.setattr(bench.time, "sleep", fake_sleep)
    real_time = bench.time.time
    t0 = real_time()
    monkeypatch.setattr(bench.time, "time", lambda: t0 + clock["t"])
    probes, waited = bench._wait_for_quiet(max_wait_s=100.0)
    # 0s: probe 99 -> sleep 45; 45s: probe 99 -> sleep 45; 90s: probe 99
    # -> sleep 45; 135s > budget: stop, run anyway
    assert all(p == 99.0 for p in probes)
    assert len(probes) == 4
    assert waited >= 100.0
