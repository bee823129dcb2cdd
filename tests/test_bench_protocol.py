"""The bench driver contract: one parseable JSON line, rc 0, outage or not.

The driver runs ``bench.py`` once per round with a hard timeout and records
the LAST complete JSON line plus the return code.  Since r5 the entry
process is a SUPERVISOR that never imports jax — so no GIL-held
backend-init hang (the r3/r4 outage mode: ~9 minutes inside C code) can
wedge it — and that owns a wall-clock budget (``VBR_BENCH_BUDGET_S``):

* healthy run → worker lines relayed verbatim, rc 0;
* worker stalls before any headline → at the deadline the supervisor
  kills the worker group and prints the persisted last-good result
  flagged ``"basis": "cached", "stale": true`` — rc 0;
* worker stalls after the headline → killed at the deadline, the real
  headline stands as the last line — rc 0;
* fast worker failure without a headline and without a cache → nonzero
  (a code bug must fail loudly, not be masked by fabricated output).

These tests drive the real supervisor subprocess with scripted workers
via the ``VBR_BENCH_WORKER_ARGV`` seam; no device or jax import needed.
"""

import json
import os
import subprocess
import sys
import time

import pytest

import bench

BENCH = os.path.abspath(bench.__file__)


@pytest.fixture
def fake_cache(tmp_path):
    path = tmp_path / "last_bench.json"
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
    return str(path), saved


HEADLINE = {"metric": "m", "value": 2.0, "unit": "u", "basis": "marginal",
            "extra": {}}


def _run_supervisor(worker_src, cache_path, budget_s=2.0, run_timeout=30,
                    extra_env=None):
    env = dict(
        os.environ,
        VBR_BENCH_CACHE=cache_path,
        VBR_BENCH_BUDGET_S=str(budget_s),
        VBR_BENCH_WORKER_ARGV=json.dumps([sys.executable, "-c", worker_src]),
    )
    env.update(extra_env or {})
    return subprocess.run(
        [sys.executable, BENCH], capture_output=True, text=True,
        timeout=run_timeout, env=env,
    )


def test_healthy_run_relays_worker_lines_rc0(tmp_path, fake_cache):
    cache_path, _ = fake_cache
    src = f"import json; print(json.dumps({HEADLINE!r}))"
    proc = _run_supervisor(src, cache_path, budget_s=20)
    assert proc.returncode == 0
    lines = proc.stdout.strip().splitlines()
    assert len(lines) == 1
    assert json.loads(lines[0]) == HEADLINE


def test_stall_before_headline_emits_cached_line_rc0(tmp_path, fake_cache):
    cache_path, saved = fake_cache
    t0 = time.monotonic()
    proc = _run_supervisor("import time; time.sleep(600)", cache_path,
                           budget_s=1.0)
    assert time.monotonic() - t0 < 20  # killed at the deadline, not 600 s
    assert proc.returncode == 0
    got = json.loads(proc.stdout.strip().splitlines()[-1])
    assert got["basis"] == "cached"
    assert got["stale"] is True
    assert got["cached_at"] == saved["saved_at"]
    assert got["value"] == saved["result"]["value"]
    assert "note" in got  # human-readable outage explanation


def test_stall_after_headline_keeps_fresh_line_rc0(tmp_path, fake_cache):
    cache_path, _ = fake_cache
    src = (f"import json, time, sys\n"
           f"print(json.dumps({HEADLINE!r})); sys.stdout.flush()\n"
           f"time.sleep(600)\n")
    t0 = time.monotonic()
    # budget must exceed interpreter startup (~5 s in this environment)
    # so the headline lands before the deadline
    proc = _run_supervisor(src, cache_path, budget_s=12.0)
    assert time.monotonic() - t0 < 30
    assert proc.returncode == 0
    lines = proc.stdout.strip().splitlines()
    assert json.loads(lines[-1]) == HEADLINE  # fresh, not the cached stale


def test_gil_held_stall_still_produces_output(tmp_path, fake_cache):
    """End-to-end lock of the r4 failure mode: a worker whose main thread
    hangs while HOLDING the GIL still yields a cached line and rc 0,
    because the supervisor is a separate process."""
    cache_path, saved = fake_cache
    # catastrophic-backtracking regex: C-level, holds the GIL for many
    # seconds — far past the supervisor's 1 s budget
    src = "import re; re.match(r'(a+)+$', 'a' * 30 + 'b')"
    proc = _run_supervisor(src, cache_path, budget_s=1.0)
    assert proc.returncode == 0
    got = json.loads(proc.stdout.strip().splitlines()[-1])
    assert got["basis"] == "cached" and got["stale"] is True
    assert got["value"] == saved["result"]["value"]


def test_fast_failure_without_cache_fails_loudly(tmp_path):
    proc = _run_supervisor("import sys; sys.exit(7)",
                           str(tmp_path / "absent.json"), budget_s=20)
    assert proc.returncode != 0
    assert proc.stdout.strip() == ""
    assert "no cached fallback" in proc.stderr


def test_fast_failure_with_cache_emits_cached_rc0(tmp_path, fake_cache):
    # a worker crash (e.g. UNAVAILABLE after capped retries) with a cache
    # present degrades to the honest stale line, rc 0
    cache_path, saved = fake_cache
    proc = _run_supervisor("import sys; sys.exit(7)", cache_path, budget_s=20)
    assert proc.returncode == 0
    got = json.loads(proc.stdout.strip().splitlines()[-1])
    assert got["stale"] is True and got["value"] == saved["result"]["value"]


def test_malformed_cache_rejected(tmp_path):
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"no_result_key": 1}))
    proc = _run_supervisor("import time; time.sleep(600)", str(bad),
                           budget_s=1.0)
    assert proc.returncode != 0
    assert proc.stdout.strip() == ""


def test_clean_exit_without_headline_is_protocol_bug(tmp_path, fake_cache):
    cache_path, _ = fake_cache
    proc = _run_supervisor("pass", cache_path, budget_s=20)
    assert proc.returncode != 0
    assert "without emitting a headline" in proc.stderr


def test_worker_rc2_fallback_propagates(tmp_path, fake_cache):
    # explicit-kernel fallback: headline printed but rc 2 must survive
    cache_path, _ = fake_cache
    line = dict(HEADLINE, fallback=True)
    src = (f"import json, sys\n"
           f"print(json.dumps({line!r})); sys.stdout.flush(); sys.exit(2)\n")
    proc = _run_supervisor(src, cache_path, budget_s=20)
    assert proc.returncode == 2


def test_emit_persists_result_for_the_supervisor(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "_CACHE_PATH", str(tmp_path / "lb.json"))
    import contextlib
    import io

    result = {"metric": "m", "value": 1.0, "unit": "u", "extra": {}}
    with contextlib.redirect_stdout(io.StringIO()):
        bench._Emitter(result).emit()
    saved = json.loads((tmp_path / "lb.json").read_text())
    assert saved["result"] == result
    assert "saved_at" in saved


def test_emit_never_persists_a_fallback_headline(tmp_path, monkeypatch):
    # an XLA-fallback number must not be replayable by a later outage
    # fallback as "the last successful on-chip measurement"
    monkeypatch.setattr(bench, "_CACHE_PATH", str(tmp_path / "lb.json"))
    import contextlib
    import io

    result = {"metric": "m", "value": 93.0, "unit": "u", "fallback": True,
              "extra": {"kernel": "tables"}}
    with contextlib.redirect_stdout(io.StringIO()):
        bench._Emitter(result).emit()
    assert not (tmp_path / "lb.json").exists()


def test_budget_gating_skips_and_records(monkeypatch, capsys):
    # with 30 s left, a 60 s extra is skipped and recorded in the line;
    # a 5 s extra still runs
    monkeypatch.setenv(bench._DEADLINE_ENV, repr(time.time() + 30))
    em = bench._Emitter({"metric": "m", "value": 1.0, "unit": "u",
                         "extra": {}})
    monkeypatch.setattr(bench, "_CACHE_PATH", "/nonexistent/dir/x.json")
    assert em.budget_ok("cheap", 5) is True
    assert em.budget_ok("expensive", 60) is False
    assert em.result["extra"]["skipped_extras"] == ["expensive"]
    out = capsys.readouterr().out.strip().splitlines()
    assert json.loads(out[-1])["extra"]["skipped_extras"] == ["expensive"]


def test_remaining_unbounded_without_deadline(monkeypatch):
    monkeypatch.delenv(bench._DEADLINE_ENV, raising=False)
    assert bench._remaining_s() == float("inf")
