"""The bench driver contract: one parseable JSON line, outage or not.

The driver runs ``bench.py`` once per round and records the LAST complete
JSON line.  Two hard-won outage modes (VERDICT r3 weak #1) are locked here:

* backend-init *raise* (UNAVAILABLE) → bounded re-exec retry
  (``bench._devices_or_reexec``), and
* backend-init *hang* (the ~9-minute tunnel stall that produced the empty
  r3 record) → ``bench._stall_watchdog`` emits the persisted last-good
  result flagged ``"basis": "cached", "stale": true``.

These tests exercise the watchdog in-process with a fake cache; no device
or jax import is needed (``bench`` only imports jax inside ``main``).
"""

import contextlib
import io
import json
import threading

import pytest

import bench


@pytest.fixture
def fake_cache(tmp_path, monkeypatch):
    path = tmp_path / "last_bench.json"
    monkeypatch.setattr(bench, "_CACHE_PATH", str(path))
    saved = {
        "saved_at": "2026-08-19T07:27:00Z",
        "result": {
            "metric": "carve_128c4_ms_per_frame",
            "value": 1.6873,
            "unit": "ms/frame/chip",
            "vs_baseline": 2.963,
            "fallback": False,
            "basis": "marginal",
            "extra": {"kernel": "pallas"},
        },
    }
    path.write_text(json.dumps(saved))
    return saved


def _run_watchdog(event, timeout):
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        bench._stall_watchdog(event, timeout)
    return out.getvalue()


def test_stall_emits_cached_line_flagged_stale(fake_cache):
    line = _run_watchdog(threading.Event(), 0.05).strip()
    got = json.loads(line)  # exactly one complete JSON line
    assert got["basis"] == "cached"
    assert got["stale"] is True
    assert got["cached_at"] == fake_cache["saved_at"]
    assert got["value"] == fake_cache["result"]["value"]
    assert got["metric"] == fake_cache["result"]["metric"]
    assert "note" in got  # human-readable outage explanation


def test_healthy_run_prints_nothing(fake_cache):
    done = threading.Event()
    done.set()  # headline already emitted before the deadline
    assert _run_watchdog(done, 0.05) == ""


def test_stall_without_cache_prints_no_stdout(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "_CACHE_PATH", str(tmp_path / "absent.json"))
    # a fast code failure must NOT be masked by fabricated output
    assert _run_watchdog(threading.Event(), 0.05) == ""


def test_emit_persists_result_for_the_watchdog(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "_CACHE_PATH", str(tmp_path / "lb.json"))
    result = {"metric": "m", "value": 1.0, "unit": "u", "extra": {}}
    with contextlib.redirect_stdout(io.StringIO()):
        bench._Emitter(result).emit()
    saved = json.loads((tmp_path / "lb.json").read_text())
    assert saved["result"] == result
    assert "saved_at" in saved


def test_emit_never_persists_a_fallback_headline(tmp_path, monkeypatch):
    # an XLA-fallback number must not be replayable by a later watchdog
    # as "the last successful on-chip measurement"
    monkeypatch.setattr(bench, "_CACHE_PATH", str(tmp_path / "lb.json"))
    result = {"metric": "m", "value": 93.0, "unit": "u", "fallback": True,
              "extra": {"kernel": "tables"}}
    with contextlib.redirect_stdout(io.StringIO()):
        bench._Emitter(result).emit()
    assert not (tmp_path / "lb.json").exists()


def test_watchdog_rechecks_after_cache_read(fake_cache):
    # headline wins the race between wait() timing out and the cached
    # print: the stale line must never be the LAST (recorded) line
    class _SetAfterFirstWait:
        def __init__(self):
            self._set = False

        def wait(self, timeout):
            return False  # timed out → watchdog proceeds to the cache read

        def is_set(self):
            return True  # ...but the real headline printed meanwhile

    assert _run_watchdog(_SetAfterFirstWait(), 0.01) == ""


def test_watchdog_rejects_malformed_cache(tmp_path, monkeypatch):
    path = tmp_path / "bad.json"
    path.write_text(json.dumps({"no_result_key": 1}))
    monkeypatch.setattr(bench, "_CACHE_PATH", str(path))
    assert _run_watchdog(threading.Event(), 0.01) == ""
