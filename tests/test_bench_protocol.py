"""The bench driver contract: one parseable JSON line, outage or not.

The driver runs ``bench.py`` once per round and records the LAST complete
JSON line.  Two hard-won outage modes (VERDICT r3 weak #1) are locked here:

* backend-init *raise* (UNAVAILABLE) → bounded re-exec retry
  (``bench._devices_or_reexec``), and
* backend-init *hang* (the ~9-minute tunnel stall that produced the empty
  r3 record) → the watchdog emits the persisted last-good result flagged
  ``"basis": "cached", "stale": true``.

The watchdog is a SUBPROCESS (``bench.py --watchdog``), not a thread: the
stall happens inside backend-init C code that holds the GIL, so no thread
of the bench process runs during it (observed live in r4 — a 420 s stalled
run with a 240 s thread watchdog emitted zero bytes).  These tests run the
real child process with a fake cache via ``VBR_BENCH_CACHE``; no device or
jax import is needed (``bench`` only imports jax inside the measured run).
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


def _run_child(timeout_s, sentinel, parent_pid, cache_path, run_timeout=20):
    env = dict(os.environ, VBR_BENCH_CACHE=cache_path)
    return subprocess.run(
        [sys.executable, BENCH, "--watchdog", str(timeout_s), sentinel,
         str(parent_pid)],
        capture_output=True, text=True, timeout=run_timeout, env=env,
    )


def test_stall_emits_cached_line_flagged_stale(tmp_path, fake_cache):
    cache_path, saved = fake_cache
    # parent (this test process) stays alive past the deadline = a stall
    proc = _run_child(0.3, str(tmp_path / "sentinel"), os.getpid(), cache_path)
    assert proc.returncode == 0
    got = json.loads(proc.stdout.strip())  # exactly one complete JSON line
    assert got["basis"] == "cached"
    assert got["stale"] is True
    assert got["cached_at"] == saved["saved_at"]
    assert got["value"] == saved["result"]["value"]
    assert got["metric"] == saved["result"]["metric"]
    assert "note" in got  # human-readable outage explanation


def test_sentinel_silences_the_watchdog(tmp_path, fake_cache):
    cache_path, _ = fake_cache
    sentinel = tmp_path / "sentinel"
    sentinel.write_text("")  # headline already emitted
    t0 = time.monotonic()
    proc = _run_child(30.0, str(sentinel), os.getpid(), cache_path)
    assert proc.returncode == 0
    assert proc.stdout == ""  # healthy run: the watchdog prints nothing
    assert time.monotonic() - t0 < 10  # exited at once, not at the deadline


def test_parent_death_before_deadline_is_silent(tmp_path, fake_cache):
    # a fast code failure (parent exits before the deadline without a
    # headline) must NOT be masked by fabricated output
    cache_path, _ = fake_cache
    dead = subprocess.Popen([sys.executable, "-c", "pass"])
    dead.wait()
    t0 = time.monotonic()
    proc = _run_child(30.0, str(tmp_path / "sentinel"), dead.pid, cache_path)
    assert proc.returncode == 0
    assert proc.stdout == ""
    assert time.monotonic() - t0 < 10


def test_stall_without_cache_prints_no_stdout(tmp_path):
    proc = _run_child(0.3, str(tmp_path / "sentinel"), os.getpid(),
                      str(tmp_path / "absent.json"))
    assert proc.stdout == ""
    assert proc.returncode != 0
    assert "no cached result" in proc.stderr


def test_sentinel_rechecked_under_the_lock(tmp_path, fake_cache, monkeypatch):
    # headline wins the race between the deadline passing and the cached
    # print: the stale line must never be printed once the sentinel exists
    cache_path, _ = fake_cache
    monkeypatch.setenv("VBR_BENCH_CACHE", cache_path)
    monkeypatch.setattr(bench, "_CACHE_PATH", cache_path)
    sentinel = tmp_path / "sentinel"

    real_lock = bench._stdout_lock

    def lock_then_headline(path):
        sentinel.write_text("")  # the parent emitted while we slept
        return real_lock(path)

    monkeypatch.setattr(bench, "_stdout_lock", lock_then_headline)
    assert bench._watchdog_child(0.05, str(sentinel), os.getpid()) == 0


def test_watchdog_rejects_malformed_cache(tmp_path):
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"no_result_key": 1}))
    proc = _run_child(0.3, str(tmp_path / "sentinel"), os.getpid(), str(bad))
    assert proc.stdout == ""
    assert proc.returncode != 0


def test_emit_persists_result_for_the_watchdog(tmp_path, monkeypatch):
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
    # an XLA-fallback number must not be replayable by a later watchdog
    # as "the last successful on-chip measurement"
    monkeypatch.setattr(bench, "_CACHE_PATH", str(tmp_path / "lb.json"))
    import contextlib
    import io

    result = {"metric": "m", "value": 93.0, "unit": "u", "fallback": True,
              "extra": {"kernel": "tables"}}
    with contextlib.redirect_stdout(io.StringIO()):
        bench._Emitter(result).emit()
    assert not (tmp_path / "lb.json").exists()


def test_emit_with_sentinel_touches_it_first(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "_CACHE_PATH", str(tmp_path / "lb.json"))
    import contextlib
    import io

    sentinel = tmp_path / "sentinel"
    out = io.StringIO()
    result = {"metric": "m", "value": 1.0, "unit": "u", "extra": {}}
    with contextlib.redirect_stdout(out):
        bench._Emitter(result, sentinel=str(sentinel)).emit()
    assert sentinel.exists()  # any pending watchdog child now stays silent
    assert json.loads(out.getvalue().strip()) == result


def test_reexec_adopted_child_is_reaped_on_fast_exit(tmp_path, fake_cache):
    """The _devices_or_reexec retry path: the watchdog spawned by the
    first exec survives os.execv (same parent pid, env-carried sentinel
    + child pid).  A post-exec run that emits its headline and exits
    immediately must still terminate that adopted child — otherwise the
    orphan holds the stdout pipe open (the driver waits on EOF) and can
    print a stale cached line AFTER the real headline."""
    cache_path, _ = fake_cache
    script = tmp_path / "reexec_parent.py"
    script.write_text(
        "import os, sys\n"
        f"sys.path.insert(0, {os.path.dirname(BENCH)!r})\n"
        f"os.environ['VBR_BENCH_CACHE'] = {cache_path!r}\n"
        "import bench\n"
        "if len(sys.argv) == 1:\n"
        "    bench._spawn_watchdog(120.0)  # long deadline: never fires\n"
        "    os.execv(sys.executable, [sys.executable, __file__, 'stage2'])\n"
        "# stage 2 (post-exec): adopt the child, emit, exit at once\n"
        "sentinel, wd_child = bench._spawn_watchdog(120.0)\n"
        "assert wd_child and not hasattr(wd_child, 'poll')  # adopted pid\n"
        "bench._Emitter({'metric': 'm', 'value': 2.0, 'unit': 'u',\n"
        "                'extra': {}}, sentinel=sentinel).emit()\n"
        "bench._reap_watchdog(wd_child, sentinel)\n"
    )
    t0 = time.monotonic()
    proc = subprocess.run([sys.executable, str(script)], capture_output=True,
                          text=True, timeout=60)
    # EOF well before the 120 s watchdog deadline proves the adopted child
    # was killed, not left to expire; a single real line proves no stale
    # output followed it.  (The bound is load-tolerant: the unloaded run
    # takes ~7 s, and discrimination only needs < 120 s.)
    assert time.monotonic() - t0 < 60
    lines = proc.stdout.strip().splitlines()
    assert len(lines) == 1
    assert json.loads(lines[0])["value"] == 2.0


def test_gil_held_stall_still_produces_output(tmp_path, fake_cache):
    """End-to-end lock of the r4 failure mode: a parent whose main thread
    hangs while HOLDING the GIL still yields a parseable cached line,
    because the watchdog is a separate process."""
    cache_path, saved = fake_cache
    parent_src = (
        "import sys, os; sys.path.insert(0, %r); os.environ['VBR_BENCH_CACHE'] = %r;\n"
        "import bench\n"
        "sentinel, child = bench._spawn_watchdog(1.0)\n"
        "import re\n"
        # catastrophic-backtracking regex: C-level, holds the GIL ~3-5 s
        # (calibrated: n=26 ≈ 3.4 s) — long past the 1 s watchdog deadline
        "re.match(r'(a+)+$', 'a' * 26 + 'b')\n"
    ) % (os.path.dirname(BENCH), cache_path)
    proc = subprocess.run(
        [sys.executable, "-c", parent_src],
        capture_output=True, text=True, timeout=60,
    )
    got = json.loads(proc.stdout.strip().splitlines()[-1])
    assert got["basis"] == "cached" and got["stale"] is True
    assert got["value"] == saved["result"]["value"]
