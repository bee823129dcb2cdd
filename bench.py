"""Benchmark: 128³ × 4-camera visual-hull carve, ms/frame on one chip.

North star (BASELINE.md): < 5 ms/frame/chip on TPU v5e at 128³ with
occupancy matching the OpenCV/reference semantics.  Prints one JSON line:
{"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
vs_baseline is the speedup factor against the 5 ms/frame target (>1 beats
the target).

Outage-resilient output protocol (VERDICT r4 #1): ``python bench.py`` is a
thin SUPERVISOR that never imports jax, so no GIL-held backend-init hang
can wedge it.  It spawns the measurement as a killable child
(``bench.py --worker``), relays the child's stdout line by line, and
enforces a hard wall-clock budget (VBR_BENCH_BUDGET_S, default 360 s —
safely inside the driver's window):

  * headline measured and printed FIRST; every extra re-prints the full
    cumulative JSON line (consumer takes the LAST complete line);
  * the worker self-gates: each extra block runs only if enough budget
    remains, otherwise it is skipped with a note in the line;
  * at the deadline the supervisor kills the worker's process group and
    EXITS 0 with whatever was measured — never rides init-retries or a
    stalled extra into the driver's timeout (r3/r4 failure mode);
  * only if the tunnel stalls before ANY headline exists does the
    supervisor fall back to the last persisted on-chip result, honestly
    flagged ``"basis": "cached", "stale": true`` — and still exits 0.

Kernel provenance is explicit: the headline value carries extra.kernel
("pallas" = fused blocked Pallas kernel, "tables" = XLA gather path) and a
top-level "fallback" flag.  If VBR_BENCH_KERNEL=pallas is set explicitly
and the Pallas kernel cannot run, the bench exits nonzero rather than
silently reporting the fallback number.  The headline also carries
"basis": "marginal" (two-batch-size difference, tunnel overhead removed)
or "mean" (marginal was noise-dominated) so rounds are comparable.

Occupancy parity vs the float64 table path is verified in-bench before
timing (bit-exact, reference trunc semantics of voxel_reconstruction.py:
105-122); colors are compared at occupied voxels.
"""

import contextlib
import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

_CACHE_PATH = os.environ.get("VBR_BENCH_CACHE") or os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "artifacts", "last_bench.json"
)

_DEADLINE_ENV = "VBR_BENCH_DEADLINE_EPOCH"


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


def _cached_line(saved, budget_s):
    """Format a persisted result as an honestly-flagged stale headline."""
    line = dict(saved["result"])
    line["basis"] = "cached"
    line["stale"] = True
    line["cached_at"] = saved["saved_at"]
    line["note"] = (
        f"no fresh on-chip headline within the {budget_s:.0f}s budget "
        "(tunnel outage); this is the last successful on-chip measurement, "
        "NOT a fresh one."
    )
    return line


# --------------------------------------------------------------------------
# Supervisor: owns the wall-clock budget; never imports jax.
# --------------------------------------------------------------------------

def _supervise():
    budget_s = float(os.environ.get("VBR_BENCH_BUDGET_S", "360"))
    deadline = time.time() + budget_s
    env = dict(os.environ, **{_DEADLINE_ENV: repr(deadline)})
    # test seam: the protocol tests substitute a scripted worker
    argv_override = os.environ.get("VBR_BENCH_WORKER_ARGV")
    argv = (json.loads(argv_override) if argv_override
            else [sys.executable, os.path.abspath(__file__), "--worker"])
    child = subprocess.Popen(
        argv,
        stdin=subprocess.DEVNULL,
        stdout=subprocess.PIPE,
        stderr=None,  # inherited: diagnostics flow straight through
        env=env,
        start_new_session=True,  # killable as a group, incl. any grandkids
        text=True,
    )
    saw_headline = False
    import threading

    def relay():
        nonlocal saw_headline
        for line in child.stdout:
            sys.stdout.write(line)
            sys.stdout.flush()
            s = line.strip()
            if s.startswith("{"):
                try:
                    parsed = json.loads(s)
                except ValueError:
                    continue
                if "metric" in parsed and not parsed.get("stale"):
                    saw_headline = True

    t = threading.Thread(target=relay, daemon=True)
    t.start()
    try:
        child.wait(timeout=max(1.0, deadline - time.time()))
        timed_out = False
    except subprocess.TimeoutExpired:
        timed_out = True
        _kill_group(child)
    t.join(timeout=10)
    if saw_headline:
        # Worker rc 2 = explicit kernel request not honored: fail loudly
        # even though a (fallback) headline was printed.
        if not timed_out and child.returncode == 2:
            return 2
        return 0
    if timed_out or child.returncode != 0:
        saved = _load_cached()
        if saved is not None:
            print(json.dumps(_cached_line(saved, budget_s)))
            sys.stdout.flush()
            return 0
        print("# bench: no headline measured and no cached fallback",
              file=sys.stderr)
        return child.returncode if child.returncode else 3
    # Worker exited 0 without a headline line: a protocol bug; fail loudly.
    print("# bench: worker exited 0 without emitting a headline",
          file=sys.stderr)
    return 3


def _kill_group(child):
    """TERM then KILL the worker's whole process group by pgid (never by
    name pattern), giving it a short grace to flush."""
    with contextlib.suppress(OSError):
        os.killpg(child.pid, signal.SIGTERM)
    deadline = time.monotonic() + 5
    while time.monotonic() < deadline:
        if child.poll() is not None:
            break
        time.sleep(0.1)
    if child.poll() is None:
        with contextlib.suppress(OSError):
            os.killpg(child.pid, signal.SIGKILL)
        with contextlib.suppress(Exception):
            child.wait(timeout=5)


# --------------------------------------------------------------------------
# Worker: the actual measurement.
# --------------------------------------------------------------------------

def _remaining_s():
    """Seconds left before the supervisor's hard deadline (inf if none)."""
    raw = os.environ.get(_DEADLINE_ENV)
    if not raw:
        return float("inf")
    return float(raw) - time.time()


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
    across all retries is capped at ~30 s; the supervisor's deadline is
    the overall backstop."""
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

    def __init__(self, result):
        self.result = result

    def emit(self):
        sys.stderr.flush()
        print(json.dumps(self.result))
        sys.stdout.flush()
        if self.result.get("fallback"):
            # never persist an XLA-fallback headline: a later stalled run's
            # supervisor would republish it as "the last successful on-chip
            # measurement", laundering a fail-loudly run into a headline
            return
        try:  # persist for the supervisor's outage fallback
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

    def skip(self, name, need_s):
        """Record that an extra was skipped for lack of budget."""
        skipped = self.result["extra"].setdefault("skipped_extras", [])
        skipped.append(name)
        print(f"# bench: skipping {name} (needs ~{need_s:.0f}s, "
              f"{_remaining_s():.0f}s left in budget)", file=sys.stderr)
        self.emit()

    def budget_ok(self, name, need_s):
        """True if ``need_s`` seconds fit in the remaining budget with a
        15 s exit margin; otherwise records the skip."""
        if _remaining_s() - 15.0 >= need_s:
            return True
        self.skip(name, need_s)
        return False


def _worker():
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
    out = _Emitter(result)
    out.emit()

    if kernel == "pallas":
        from vbr_tpu.ops import carve_pallas

        # ---- extras, cheapest-first; each one re-prints the line;
        # each block is budget-gated so the worker exits before the
        # supervisor's deadline instead of being killed mid-extra --------
        if out.budget_ok("canonical_layout", 15):
            def step_canonical():
                return carve_pallas.carve_blocked(
                    masks_d, frame_color, btab,
                    views_threshold=rig.views_threshold, layout="canonical",
                )

            ms_canon, _, _ = _marginal_ms(step_canonical, max(10, iters // 2))
            out.extra(canonical_layout_ms=round(ms_canon, 4))

        # offline multi-frame throughput: N frames per kernel launch
        # (one-hot matmuls shared across frames; colors host-side)
        if out.budget_ok("offline_batched", 30):
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
        vh = None
        if out.budget_ok("fused_pipeline", 60):
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
            except Exception as e:  # never fail the headline on this
                vh = None
                out.extra(fused_pipeline_error=f"{type(e).__name__}: {e}")

        # Fused frame→SURFACE step (r4/r5): the same program + the
        # device-resident marching cubes — frames in, world-space
        # triangles out, ONE device program.
        if vh is not None and out.budget_ok("fused_surface", 60):
            try:
                from vbr_tpu.models import visual_hull as vhm
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
                out.extra(fused_surface_error=f"{type(e).__name__}: {e}")

        # End-to-end streaming over the tunnel with the thin-link
        # production mode (yuv420_roi ingest + the r5 wire format):
        # decode → tracker → pack → upload → fused step → download →
        # viewer arrays.  Weather-dependent by nature (the guard result
        # rides along so the number is evidence-backed).
        if vh is not None and os.path.isdir(data_dir) and \
                out.budget_ok("stream_e2e", 75):
            try:
                from vbr_tpu.native import PrefetchingSource

                src = PrefetchingSource([
                    os.path.join(data_dir, f"cam{i}", "video.avi")
                    for i in range(1, 5)
                ])

                def frames_iter(limit):
                    n = 0
                    while n < limit:
                        f = src.next_frames()
                        if f is None:
                            return
                        yield f
                        n += 1

                guard = vh.validate_reduced_ingest(
                    frames, ingest="yuv420_roi")
                for _ in vh.stream_viewer(frames_iter(3),
                                          ingest="yuv420_roi"):
                    pass  # warm-up/compile
                t0 = time.perf_counter()
                n = 0
                for _pos, _rgb in vh.stream_viewer(
                        frames_iter(40), ingest="yuv420_roi"):
                    n += 1
                dt = time.perf_counter() - t0
                src.close()
                out.extra(
                    stream_e2e_roi_fps=round(n / dt, 2),
                    stream_e2e_roi_ms_per_frame=round(dt / n * 1e3, 2),
                    stream_e2e_guard_mask_iou_min=guard["mask_iou_min"],
                    stream_e2e_guard_occ_diff=guard["occ_diff_voxels"],
                )
            except Exception as e:  # never fail the headline on this
                out.extra(stream_e2e_error=f"{type(e).__name__}: {e}")

        # Balanced grid sharding (cost-LPT superblock order): the honest
        # single-chip protocol — time each of the 8 shards' actual local
        # Pallas program and report the critical path (max) plus the ICI
        # mask/frame all_gather bound (v5e ring, 45 GB/s per link).
        if out.budget_ok("sharded_cost_lpt", 90):
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
                    if _remaining_s() < 25:
                        raise TimeoutError(
                            f"budget exhausted after shard {k}/{nsh}"
                        )
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
                    sharded_cost_lpt_ms_per_frame=round(
                        max(shard_ms) + ici_ms, 4
                    ),
                    sharded_cost_lpt_shard_ms=[round(m, 3) for m in shard_ms],
                    sharded_shards=nsh,
                    sharded_iters=it_shard,
                    sharded_balance=round(
                        max(shard_ms) / (sum(shard_ms) / nsh), 3
                    ),
                )
            except Exception as e:  # never fail the headline on this
                out.extra(sharded_error=f"{type(e).__name__}: {e}")

        # Marching-cubes surface of the carved hull (viewer surface mode):
        # binary fast path — dense device config pass + generated-table
        # host emission (bit-identical to the per-cell device emitters).
        if out.budget_ok("mc_surface", 20):
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

    if fallback and "VBR_BENCH_KERNEL" in os.environ:
        return 2  # explicit kernel request not honored: fail loudly
    return 0


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "--worker":
        sys.exit(_worker())
    sys.exit(_supervise())
