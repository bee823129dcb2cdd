"""Benchmark: 128³ × 4-camera visual-hull carve, ms/frame on one chip.

North star (BASELINE.md): < 5 ms/frame/chip on TPU v5e at 128³ with
occupancy matching the OpenCV/reference semantics.  Prints one JSON line:
{"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
vs_baseline is the speedup factor against the 5 ms/frame target (>1 beats
the target).

Outage-resilient output protocol (VERDICT r3 #2): the headline metric is
measured FIRST and printed+flushed the moment it exists; every extra
measurement (canonical layout, batched, fused pipeline) re-prints the
full cumulative JSON line.  The consumer takes the LAST complete JSON
line, so a tunnel outage mid-run costs only the extras measured after it,
never the headline.  Backoff on backend-init failure is capped at ~30 s
total.  If backend init *hangs* (the observed ~9-minute outage mode that
produced an empty r3 record), a watchdog emits the last successful run's
persisted result flagged `"basis": "cached", "stale": true` so the driver
always receives an honest parseable line; any later real measurement
supersedes it.  The watchdog is a SUBPROCESS, not a thread: the hang
happens inside backend-init C code that holds the GIL, so no thread of
this process runs during it (observed live: a 420 s stalled run with the
earlier 240 s *thread* watchdog emitted zero bytes).  Parent and child
serialize their prints with a file lock, and the child stays silent once
the real headline exists — a stale line can never be the last one.

Kernel provenance is explicit: the headline value carries extra.kernel
("pallas" = fused blocked Pallas kernel, "tables" = XLA gather path) and a
top-level "fallback" flag.  If VBR_BENCH_KERNEL=pallas is set explicitly
and the Pallas kernel cannot run, the bench exits nonzero rather than
silently reporting the fallback number.  The headline also carries
"basis": "marginal" (two-batch-size difference, tunnel overhead removed)
or "mean" (marginal was noise-dominated) so rounds are comparable
(VERDICT r3 weak #5).

Occupancy parity vs the float64 table path is verified in-bench before
timing (bit-exact, reference trunc semantics of voxel_reconstruction.py:
105-122); colors are compared at occupied voxels.
"""

import contextlib
import json
import os
import subprocess
import sys
import time

import numpy as np

_CACHE_PATH = os.environ.get("VBR_BENCH_CACHE") or os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "artifacts", "last_bench.json"
)


def _load_cached():
    """The last successful run's persisted result, or None if absent/bad."""
    try:
        with open(_CACHE_PATH) as f:
            saved = json.load(f)
    except (OSError, ValueError):
        return None
    if not isinstance(saved, dict) or not isinstance(saved.get("result"), dict):
        return None
    return saved


def _cached_line(saved, timeout_s):
    """Format a persisted result as an honestly-flagged stale headline."""
    line = dict(saved["result"])
    line["basis"] = "cached"
    line["stale"] = True
    line["cached_at"] = saved["saved_at"]
    line["note"] = (
        f"TPU backend stalled >{timeout_s:.0f}s (tunnel outage); this is "
        "the last successful on-chip measurement, NOT a fresh one. A later "
        "JSON line, if any, supersedes this."
    )
    return line


@contextlib.contextmanager
def _stdout_lock(sentinel):
    """Serialize result lines between the bench and its watchdog child.

    Both sides print headline lines only while holding this lock, and the
    parent creates the sentinel before printing; the child re-checks the
    sentinel under the lock, so a stale cached line can never land AFTER
    the real headline (the consumer records the last complete line)."""
    import fcntl

    with open(sentinel + ".lock", "w") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        try:
            yield
        finally:
            sys.stdout.flush()
            fcntl.flock(lk, fcntl.LOCK_UN)


def _watchdog_child(timeout_s, sentinel, parent_pid, tick=0.2):
    """Runs as a SEPARATE PROCESS (``bench.py --watchdog ...``).

    Guarantees SOME parseable output even if the tunnel stalls.  The
    observed worst outage mode is not an UNAVAILABLE raise (handled by
    _devices_or_reexec) but a backend init that simply HANGS for ~9
    minutes *inside C code holding the GIL* — a watchdog thread in the
    bench process never gets scheduled (observed live in r4: a stalled
    420 s run with a 240 s thread watchdog emitted zero bytes).  A child
    process cannot be starved that way.

    Waits up to ``timeout_s`` for the parent to report its headline (the
    sentinel file).  Sentinel seen → exit silently.  Parent died without
    a headline → exit silently too: a fast failure is a code bug whose
    silence must not be masked by fabricated output.  Timeout with the
    parent still alive (the stall) → print the last persisted result
    flagged ``"basis": "cached", "stale": true`` to the inherited stdout
    and exit; if the parent later recovers, its real headline prints
    after ours and supersedes it."""
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        if os.path.exists(sentinel):
            return 0
        try:
            os.kill(parent_pid, 0)
        except OSError:
            return 0  # parent died before the deadline: not a stall
        time.sleep(tick)
    saved = _load_cached()
    try:
        with _stdout_lock(sentinel):
            if os.path.exists(sentinel):
                return 0  # the real headline won the race
            if saved is None:
                print(f"# watchdog: no headline after {timeout_s:.0f}s and "
                      "no cached result to fall back to", file=sys.stderr)
                sys.stderr.flush()
                return 1
            print(json.dumps(_cached_line(saved, timeout_s)))
        return 0
    except (BrokenPipeError, OSError):
        return 1


def _spawn_watchdog(timeout_s):
    """Start the watchdog subprocess; returns (sentinel_path, child|None).

    Across the _devices_or_reexec re-exec the pid and environment are
    preserved, so the child spawned by the first exec keeps watching —
    detected via the sentinel path already being in the environment."""
    sentinel = os.environ.get("VBR_BENCH_WATCHDOG_SENTINEL")
    if sentinel:
        return sentinel, int(os.environ.get("VBR_BENCH_WATCHDOG_PID", "0"))
    import tempfile

    fd, sentinel = tempfile.mkstemp(prefix="vbr_bench_headline_")
    os.close(fd)
    os.unlink(sentinel)  # path reserved; existence = headline emitted
    os.environ["VBR_BENCH_WATCHDOG_SENTINEL"] = sentinel
    child = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--watchdog",
         str(timeout_s), sentinel, str(os.getpid())],
        stdin=subprocess.DEVNULL,  # stdout/stderr inherited on purpose
    )
    os.environ["VBR_BENCH_WATCHDOG_PID"] = str(child.pid)
    return sentinel, child


def _marginal_ms(step, iters, pairs=3):
    """Steady-state marginal cost: difference of two batch sizes removes
    the fixed dispatch/sync overhead of the tunnel.  Median over several
    pairs; falls back to the (overhead-inclusive) mean if the difference
    is noise-dominated (never reports a negative or clamped value).
    Returns (ms, mean_ms, basis)."""
    iters = max(2, iters)  # the marginal needs two batch sizes
    half = max(1, iters // 2)

    def run(k):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = step()
        for x in out:
            np.asarray(x.ravel()[:1])  # true sync (tunnel-safe)
        return time.perf_counter() - t0

    run(3)
    run(3)
    margs, means = [], []
    for _ in range(pairs):
        t_half = run(half)
        t_full = run(iters)
        margs.append((t_full - t_half) / (iters - half))
        means.append(t_full / iters)
    marginal = sorted(margs)[len(margs) // 2]
    mean = sorted(means)[len(means) // 2]
    basis = "marginal"
    if marginal <= 0:  # tunnel noise exceeded the signal: report the mean
        marginal = mean
        basis = "mean"
    return marginal * 1e3, mean * 1e3, basis


def _devices_or_reexec(jax):
    """Survive transient tunnel outages at session establishment.

    The tunneled TPU backend can fail its first contact with UNAVAILABLE
    (observed: axon session setup racing a recovering tunnel).  jax caches
    a failed backend init process-wide, so an in-process retry is useless —
    re-exec the interpreter with a bounded attempt counter.  Total sleep
    across all retries is capped at ~30 s (VERDICT r3: a long backoff
    burns the driver's whole budget and salvages nothing)."""
    try:
        return jax.devices()
    except RuntimeError as e:
        n = int(os.environ.get("VBR_BENCH_INIT_RETRY", "0"))
        limit = int(os.environ.get("VBR_BENCH_INIT_RETRY_LIMIT", "3"))
        if "UNAVAILABLE" not in str(e) or n >= limit:
            raise
        wait = 10  # 3 × 10 s ≈ 30 s total, then fail loudly
        print(f"# backend init failed ({e}); retry {n + 1}/{limit} "
              f"in {wait}s", file=sys.stderr)
        time.sleep(wait)
        os.environ["VBR_BENCH_INIT_RETRY"] = str(n + 1)
        sys.stderr.flush()
        sys.stdout.flush()
        os.execv(sys.executable, [sys.executable] + sys.argv)


class _Emitter:
    """Cumulative result line: print+flush after every new measurement.

    The consumer parses the LAST complete JSON line, so each re-print
    supersedes the previous one; a kill between prints loses at most the
    measurement in flight."""

    def __init__(self, result, sentinel=None):
        self.result = result
        self.sentinel = sentinel

    def emit(self):
        sys.stderr.flush()
        if self.sentinel:
            # sentinel first (silences the watchdog child), then the line,
            # all under the shared lock so lines never interleave
            with _stdout_lock(self.sentinel):
                with open(self.sentinel, "w"):
                    pass
                print(json.dumps(self.result))
        else:
            print(json.dumps(self.result))
        sys.stdout.flush()
        if self.result.get("fallback"):
            # never persist an XLA-fallback headline: a later stalled run's
            # watchdog would republish it as "the last successful on-chip
            # measurement", laundering a fail-loudly run into a headline
            return
        try:  # persist for the stall watchdog's cached fallback
            os.makedirs(os.path.dirname(_CACHE_PATH), exist_ok=True)
            tmp = _CACHE_PATH + ".tmp"
            with open(tmp, "w") as f:
                json.dump(
                    {
                        "saved_at": time.strftime(
                            "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
                        ),
                        "result": self.result,
                    },
                    f,
                    indent=1,
                )
            os.replace(tmp, _CACHE_PATH)
        except OSError:
            pass

    def extra(self, **kv):
        self.result["extra"].update(kv)
        self.emit()


def main():
    sentinel, wd_child = _spawn_watchdog(
        float(os.environ.get("VBR_BENCH_WATCHDOG_S", "240"))
    )
    try:
        return _main_measured(sentinel)
    finally:
        _reap_watchdog(wd_child, sentinel)


def _reap_watchdog(wd_child, sentinel):
    """Terminate the watchdog child, then remove the sentinel files.

    The child must be GONE before the sentinel is removed: on a run that
    exits quickly after its headline, deleting the sentinel while the
    child is still polling would let a stale cached line print AFTER the
    real one.  `wd_child` is a Popen handle, or (on the re-exec retry
    path, where the pre-exec child survives — same parent pid, same
    sentinel) the adopted child's pid from the env."""
    if isinstance(wd_child, subprocess.Popen):
        with contextlib.suppress(OSError):
            wd_child.terminate()
        with contextlib.suppress(Exception):
            wd_child.wait(timeout=5)
    elif wd_child:  # adopted across os.execv: pid only
        import signal

        with contextlib.suppress(OSError):
            os.kill(wd_child, signal.SIGTERM)
        deadline = time.monotonic() + 5
        while time.monotonic() < deadline:
            try:
                if os.waitpid(wd_child, os.WNOHANG) != (0, 0):
                    break
            except OSError:
                break  # already reaped / not our child
            time.sleep(0.05)
    for p in (sentinel, sentinel + ".lock"):
        with contextlib.suppress(OSError):
            os.unlink(p)


def _main_measured(sentinel):
    import jax

    _devices_or_reexec(jax)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from vbr_tpu.ops import carve
    from vbr_tpu.pipelines import reconstruction
    from vbr_tpu.utils.config import GridConfig, RigConfig

    data_dir = os.environ.get("VBR_DATA_DIR", "/root/reference/data")
    grid = GridConfig()  # 128^3, production extents
    rig = RigConfig()

    if os.path.isdir(data_dir):
        import cv2

        cameras = reconstruction.load_rig(data_dir)
        masks = []
        frames = []
        for i in range(1, 5):
            m = cv2.imread(os.path.join(data_dir, f"cam{i}", "mask_MOG.jpg"), 0)
            masks.append((m > 127).astype(np.uint8) * 255)
            cap = cv2.VideoCapture(os.path.join(data_dir, f"cam{i}", "video.avi"))
            ok, f = cap.read()
            cap.release()
            frames.append(f)
        masks = np.stack(masks)
        frames = np.stack(frames)
    else:  # synthetic fallback if dataset is absent
        from vbr_tpu.utils.synthetic import synthetic_rig

        cameras, masks, frames = synthetic_rig()

    H, W = masks.shape[1:3]
    masks_d = jnp.asarray(masks)
    frames_d = jnp.asarray(frames)
    iters = int(os.environ.get("VBR_BENCH_ITERS", "50"))

    # Reference-parity oracle: the float64 table path (bit-exact vs the
    # reference loop semantics, established by tests/test_carve.py).
    tables = carve.build_projection_tables(cameras, grid, (H, W))

    def step_tables():
        return carve.carve_from_tables(
            masks_d, frames_d, tables.valid, tables.lin_idx,
            views_threshold=rig.views_threshold,
            color_camera=rig.color_camera,
        )

    occ_ref, col_ref = step_tables()
    occ_ref = np.asarray(occ_ref)
    col_ref = np.asarray(col_ref)
    n_occ = int(occ_ref.sum())

    requested = os.environ.get("VBR_BENCH_KERNEL", "pallas")
    kernel = requested
    fallback = False
    err = None
    step = None
    btab = None
    frame_color = None

    if requested == "pallas":
        try:
            from vbr_tpu.ops import carve_pallas

            btab = carve_pallas.build_block_tables(
                cameras, grid, (H, W), color_camera=rig.color_camera
            )
            frame_color = frames_d[rig.color_camera]

            def step():  # noqa: F811
                return carve_pallas.carve_blocked(
                    masks_d, frame_color, btab,
                    views_threshold=rig.views_threshold, layout="blocked",
                )

            occ_b, col_b = step()
            # bit-exactness gates (occupancy everywhere; colors at occupied)
            occ_can = carve_pallas.canonicalize_host(
                np.asarray(occ_b), btab
            ).astype(bool)
            if not (occ_can == occ_ref).all():
                raise AssertionError("pallas occupancy mismatch vs f64 tables")
            col_can = carve_pallas.canonicalize_host(
                np.moveaxis(np.asarray(col_b), 2, 3), btab
            )
            if not (col_can[occ_can] == col_ref[occ_ref]).all():
                raise AssertionError("pallas color mismatch at occupied voxels")
        except Exception as e:  # Mosaic compile unavailable → XLA fallback
            err = f"{type(e).__name__}: {e}"
            print(f"# PALLAS KERNEL UNAVAILABLE ({err}); "
                  "falling back to XLA table path", file=sys.stderr)
            step = None
            kernel = "tables"
            fallback = True

    if step is None:
        step = step_tables

    # ---- HEADLINE: measured and printed before anything else -------------
    ms, mean_ms, basis = _marginal_ms(step, iters)
    voxels_per_sec = grid.num_voxels * len(cameras) / (ms * 1e-3)
    result = {
        "metric": "carve_128c4_ms_per_frame",
        "value": round(ms, 4),
        "unit": "ms/frame/chip",
        "vs_baseline": round(5.0 / ms, 3),
        "fallback": fallback,
        "basis": basis,
        "extra": {
            "mean_ms_per_frame": round(mean_ms, 4),
            "voxel_tests_per_sec": voxels_per_sec,
            "occupied_voxels": n_occ,
            "grid": "128x128x128",
            "cameras": len(cameras),
            "kernel": kernel,
            "requested_kernel": requested,
            "device": str(jax.devices()[0]),
            "iters": iters,
        },
    }
    if err:
        result["extra"]["fallback_reason"] = err
    if kernel == "pallas":
        result["extra"]["parity"] = "bit-exact vs f64 table path"
    out = _Emitter(result, sentinel=sentinel)
    out.emit()

    if kernel == "pallas":
        from vbr_tpu.ops import carve_pallas

        # ---- extras, cheapest-first; each one re-prints the line ----------
        def step_canonical():
            return carve_pallas.carve_blocked(
                masks_d, frame_color, btab,
                views_threshold=rig.views_threshold, layout="canonical",
            )

        ms_canon, _, _ = _marginal_ms(step_canonical, max(10, iters // 2))
        out.extra(canonical_layout_ms=round(ms_canon, 4))

        # offline multi-frame throughput: N frames per kernel launch
        # (one-hot matmuls shared across frames; colors host-side)
        F = 32
        masks_batch = jnp.broadcast_to(masks_d[None], (F,) + masks_d.shape)

        def step_batched():
            return (carve_pallas.carve_frames_blocked(
                masks_batch, btab, views_threshold=rig.views_threshold,
            ),)

        ms_batch, _, _ = _marginal_ms(step_batched, 6)
        out.extra(offline_batched_ms_per_frame=round(ms_batch / F, 4))

        # Full fused per-frame production pipeline, compute-only:
        # HSV → frozen-GMM apply (prefix-compressed) → morphology →
        # CCL cleanup → carve, one device program (north star: the
        # 50 fps native camera rate, i.e. <=20 ms/frame).
        try:
            from vbr_tpu.models import visual_hull as vhm
            from vbr_tpu.models.visual_hull import VisualHull

            vh = VisualHull.from_data_dir(data_dir, train_background=False)
            bg_cache = os.path.join("artifacts", "bg_cache")
            if not vh.load_background_models(bg_cache):
                vh.train_background(data_dir)
                os.makedirs(bg_cache, exist_ok=True)
                vh.save_background_models(bg_cache)
            vh._ensure_fast_state()
            vh._ensure_btab()

            def step_pipeline():
                out_ = vhm._full_step_pallas(
                    vh._stacked_fz, frames_d,
                    vh._btab.pk, vh._btab.lcc, vh._btab.vorig,
                    vh._btab.uorig, vh._btab.allv, vh._btab.ry,
                    vh._btab.rx,
                    btab_static=vhm._btab_static(vh._btab),
                    mask_params=vh._mask_params_t,
                    use_hsv=vh.mog_params[0].use_hsv,
                    fig_thresholds=vh._fig_thresholds,
                    inner_thresholds=vh._inner_thresholds,
                    views_threshold=rig.views_threshold,
                    layout="blocked",
                )
                return (jax.tree_util.tree_leaves(out_)[0],)

            ms_pipe, _, _ = _marginal_ms(step_pipeline, 12)
            out.extra(
                fused_pipeline_ms_per_frame=round(ms_pipe, 4),
                fused_pipeline_fps=round(1e3 / ms_pipe, 1),
            )

            # Fused frame→SURFACE step (r4): the same program + the
            # device-resident marching cubes (dense config grid +
            # fixed-capacity compaction + generated-table MXU emission)
            # — frames in, world-space triangles out, ONE device program.
            from vbr_tpu.ops import marching_cubes as mc_ops

            mc_ops.table_emitter("cubes", "join", 0.5)  # build pre-trace

            def step_surface():
                out_ = vhm._full_step_surface(
                    vh._stacked_fz, frames_d,
                    vh._btab.pk, vh._btab.lcc, vh._btab.vorig,
                    vh._btab.uorig, vh._btab.allv, vh._btab.ry,
                    vh._btab.rx,
                    btab_static=vhm._btab_static(vh._btab),
                    mask_params=vh._mask_params_t,
                    use_hsv=vh.mog_params[0].use_hsv,
                    fig_thresholds=vh._fig_thresholds,
                    inner_thresholds=vh._inner_thresholds,
                    views_threshold=rig.views_threshold,
                    grid_shape=grid.shape, algorithm="cubes",
                    ambiguity="join", capacity=32768,
                )
                return (out_[0],)

            ms_surf, _, _ = _marginal_ms(step_surface, 10)
            out.extra(fused_surface_ms_per_frame=round(ms_surf, 4))
        except Exception as e:  # never fail the headline on this
            out.extra(fused_pipeline_error=f"{type(e).__name__}: {e}")

        # Marching-cubes surface of the carved hull (viewer surface mode):
        # binary fast path — dense device config pass + generated-table
        # host emission (bit-identical to the per-cell device emitters).
        try:
            from vbr_tpu.ops import marching_cubes as mc

            vol = np.asarray(occ_ref).reshape(grid.shape)
            tris, ntri = mc.extract_mesh(vol, algorithm="cubes")
            t0 = time.perf_counter()
            reps = 5
            for _ in range(reps):
                tris, ntri = mc.extract_mesh(vol, algorithm="cubes")
            out.extra(
                mc_surface_ms=round(
                    (time.perf_counter() - t0) / reps * 1e3, 2
                ),
                mc_surface_triangles=int(ntri),
            )
        except Exception as e:  # never fail the headline on this
            out.extra(mc_surface_error=f"{type(e).__name__}: {e}")

        # Balanced grid sharding (cost-LPT superblock order): the honest
        # single-chip protocol — time each of the 8 shards' actual local
        # Pallas program and report the critical path (max) plus the ICI
        # mask/frame all_gather bound (v5e ring, 45 GB/s per link).
        try:
            from vbr_tpu.parallel import pallas_sharded

            nsh = 8
            costs = pallas_sharded.superblock_costs(
                btab, masks, rig.views_threshold
            )
            order = pallas_sharded.superblock_order(
                btab.nsuper, nsh, "cost", costs=costs
            )
            # Sub-ms shard kernels: tunnel sync noise (~ms) swamps the
            # marginal at headline iteration counts, so scale iters until
            # the half-batch signal is ~50 ms of kernel time per pair.
            est_shard_ms = max(ms / nsh, 0.05)
            it_shard = min(512, max(48, int(100.0 / est_shard_ms)))
            shard_ms = []
            for k in range(nsh):
                loc = pallas_sharded.local_table_slice(
                    btab, k, nsh, order=order
                )

                def step_shard():
                    return carve_pallas.carve_blocked(
                        masks_d, frame_color, loc,
                        views_threshold=rig.views_threshold,
                        layout="blocked",
                    )

                m_k, _, _ = _marginal_ms(step_shard, it_shard)
                shard_ms.append(m_k)
            ici_ms = (nsh - 1) / nsh * masks.size * 4 / 45e9 * 1e3
            out.extra(
                sharded_cost_lpt_ms_per_frame=round(max(shard_ms) + ici_ms, 4),
                sharded_cost_lpt_shard_ms=[round(m, 3) for m in shard_ms],
                sharded_shards=nsh,
                sharded_iters=it_shard,
                sharded_balance=round(
                    max(shard_ms) / (sum(shard_ms) / nsh), 3
                ),
            )
        except Exception as e:  # never fail the headline on this
            out.extra(sharded_error=f"{type(e).__name__}: {e}")

    if fallback and "VBR_BENCH_KERNEL" in os.environ:
        return 2  # explicit kernel request not honored: fail loudly
    return 0


if __name__ == "__main__":
    if len(sys.argv) >= 5 and sys.argv[1] == "--watchdog":
        sys.exit(_watchdog_child(
            float(sys.argv[2]), sys.argv[3], int(sys.argv[4])
        ))
    sys.exit(main())
