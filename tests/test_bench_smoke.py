"""bench.py robustness smoke tests (CPU).

The round-3 driver artifact was rc=124 with ZERO output because nothing
tested the bench's failure modes. These tests pin the round-4 guarantees:
one JSON line always comes out (deadline, phase error), the baseline cache
round-trips on miss/hit, and the emitted schema carries the required
fields.
"""
import importlib
import json
import sys
import threading

import numpy as np
import pytest


@pytest.fixture()
def bench(tmp_path, monkeypatch):
    import bench as b
    b = importlib.reload(b)          # fresh RESULTS/PHASES/_DONE per test
    monkeypatch.setattr(b, "_BASELINE_FILE",
                        str(tmp_path / "baseline.json"))
    # shrink the workload so the torch loop runs in ~a second
    monkeypatch.setattr(b, "USERS", 300)
    monkeypatch.setattr(b, "ITEMS", 400)
    monkeypatch.setattr(b, "INTERACTIONS", 5000)
    monkeypatch.setattr(b, "BATCH", 64)
    monkeypatch.setattr(b, "BASELINE_REPEATS", 1)
    monkeypatch.setattr(b, "BASELINE_STEPS", 1)
    return b


def _emitted(capsys):
    out = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(out) == 1, out
    return json.loads(out[0])


def test_baseline_cache_miss_then_hit(bench, capsys):
    """A cache miss measures + writes the file (the round-4 self-review
    found a NameError here that also truncated the committed cache); a
    second call hits it without re-measuring."""
    adj, u, p, n = bench._graph_and_batch()
    s1 = bench.baseline_steps_per_s(adj, u, p, n)
    assert bench.RESULTS["baseline_cached"] is False and s1 > 0
    rec = json.load(open(bench._BASELINE_FILE))
    assert rec["fingerprint"] == bench._fingerprint()
    assert rec["steps_per_s"] == s1
    s2 = bench.baseline_steps_per_s(adj, u, p, n)
    assert bench.RESULTS["baseline_cached"] is True and s2 == s1


def test_emit_exactly_once_with_truncation(bench, capsys):
    bench.RESULTS["value"] = 123.0
    bench._emit(truncated="test reason")
    bench._emit()                      # second call must be a no-op
    out = _emitted(capsys)
    assert out["value"] == 123.0
    assert out["truncated"] == "test reason"
    assert "phases" in out and "metric" in out and "unit" in out


def test_phase_error_still_emits(bench, capsys, monkeypatch):
    """An exception inside any phase must produce the JSON artifact with an
    error note, not a bare traceback (the exact zero-output failure mode
    of round 3)."""
    monkeypatch.setattr(bench, "_graph_and_batch",
                        lambda *a, **k: (_ for _ in ()).throw(
                            RuntimeError("boom")))
    bench.main()
    out = _emitted(capsys)
    assert "boom" in out["truncated"]
    assert out["vs_baseline"] is None  # honest: nothing measured


def test_watchdog_emits_partial(bench, capsys, monkeypatch):
    monkeypatch.setattr(bench, "DEADLINE_S", 0.2)
    fired = {}
    monkeypatch.setattr(bench.os, "_exit",
                        lambda code: fired.setdefault("code", code))
    bench.PHASES["data"] = 1.0
    t = threading.Thread(target=bench._watchdog)
    t.start()
    t.join(5)
    assert fired.get("code") == 0
    out = _emitted(capsys)
    assert "deadline" in out["truncated"] and "data" in out["truncated"]
