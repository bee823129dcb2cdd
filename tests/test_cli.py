"""End-to-end CLI surface tests on a synthetic on-disk rig.

Builds a real data directory (per-camera config.xml + background.avi +
video.avi with a synthetic sphere foreground) and drives the masks /
carve / mesh / render subcommands in-process — locking the CLI wiring the
reference exposes through its __main__ drivers (camera_calibration.py:
867-978, background_subtraction.py:343-419) and the viewer data path
(assignment.py:54-149).  The bg-model cache is shared across subcommands
(one training, like production use).
"""

import os

import numpy as np
import pytest

from vbr_tpu.apps import cli
from vbr_tpu.utils import synthetic, xmlio

IMG_HW = (486, 644)
SPHERE = dict(center=(100.0, -50.0, -700.0), radius=500.0)


@pytest.fixture(scope="module")
def rig_dir(tmp_path_factory):
    """Synthetic 4-camera data dir: config.xml + background/video avi."""
    from vbr_tpu import native

    root = tmp_path_factory.mktemp("rig")
    H, W = IMG_HW
    cams = synthetic.synthetic_cameras(4, image_hw=IMG_HW)
    rng = np.random.default_rng(0)
    bg = rng.integers(40, 200, size=(H, W, 3), dtype=np.uint8)
    for i, cp in enumerate(cams, start=1):
        d = root / f"cam{i}"
        d.mkdir()
        K = np.array([[cp.fx, 0, cp.cx], [0, cp.fy, cp.cy], [0, 0, 1.0]])
        xmlio.save_camera_config(str(d), K, np.zeros(5), cp.rvec, cp.tvec)
        sil = synthetic.sphere_silhouette_mask(
            cp, np.asarray(SPHERE["center"]), SPHERE["radius"], IMG_HW
        ) > 0
        sink = native.VideoSink(str(d / "background.avi"), 10.0, W, H)
        for _ in range(8):
            sink.write(bg)
        sink.close()
        fg_frame = bg.copy()
        fg_frame[sil] = (200, 40, 160)
        sink = native.VideoSink(str(d / "video.avi"), 10.0, W, H)
        for _ in range(2):
            sink.write(fg_frame)
        sink.close()
    return str(root)


@pytest.fixture(scope="module")
def out_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("out"))


def test_cli_masks(rig_dir, out_dir):
    cli.main(["masks", "--cpu", "--data", rig_dir, "--out-dir", out_dir])
    for c in range(1, 5):
        import cv2

        m = cv2.imread(os.path.join(out_dir, f"mask_cam{c}.png"), 0)
        assert m is not None and m.shape == IMG_HW
        # the sphere is ~10k px — it must survive the 5000-px figure gate
        assert (m > 0).mean() > 0.01


def test_cli_carve_writes_ply(rig_dir, out_dir):
    ply = os.path.join(out_dir, "hull.ply")
    cli.main(["carve", "--cpu", "--data", rig_dir, "--out-dir", out_dir,
              "--grid", "16", "--ply", ply])
    with open(ply, "rb") as f:
        head = f.read(400).decode("latin1")
    n = int([ln for ln in head.splitlines()
             if ln.startswith("element vertex")][0].split()[-1])
    assert n > 0  # the sphere is seen by all 4 cameras


def test_cli_mesh_writes_obj(rig_dir, out_dir):
    obj = os.path.join(out_dir, "hull.obj")
    cli.main(["mesh", "--cpu", "--data", rig_dir, "--out-dir", out_dir,
              "--grid", "16", "--obj", obj])
    with open(obj) as f:
        txt = f.read()
    assert txt.count("\nf ") > 10 and txt.startswith(("#", "v"))


@pytest.fixture(scope="module")
def board_dir(tmp_path_factory):
    """Data dir with a rendered checkerboard video for cam1 + board XML."""
    import test_photometric_calibration as tpc
    from vbr_tpu import native

    root = tmp_path_factory.mktemp("boards")
    xmlio.save_storage(
        str(root / "checkerboard.xml"),
        {"CheckerBoardWidth": 8, "CheckerBoardHeight": 6,
         "CheckerBoardSquareSize": tpc.SQUARE},
    )
    d = root / "cam1"
    d.mkdir()
    # distortion-free boards at 2× resolution: these tests lock the CLI
    # WIRING of both intrinsics routes; distortion recovery itself is
    # gated at op level (test_photometric_calibration) on uncompressed
    # frames — at 320×240, mp4 compression degrades tilted-view corner
    # positions by several px and the planar LM collapses along fx·tz
    K2 = tpc.K_TRUE.copy()
    K2[:2] *= 2.0
    W2, H2 = tpc.IMG_W * 2, tpc.IMG_H * 2
    frames = [tpc.render_board(K2, np.zeros(5), rv, tv, ss=2,
                               size=(W2, H2))
              for rv, tv in tpc._poses()]
    sink = native.VideoSink(str(d / "checkerboard.avi"), 10.0, W2, H2)
    for f in frames:
        sink.write(f)
    sink.close()
    return str(root), tpc, K2


def test_cli_calibrate_intrinsics_corners(board_dir, tmp_path):
    """The reference-parity corners route: per-frame detection + LM."""
    root, tpc, K2 = board_dir
    out = str(tmp_path / "out")
    cli.main(["calibrate", "--cpu", "--data", root, "--out-dir", out,
              "--mode", "intrinsics", "--cams", "1",
              "--video", "checkerboard.avi", "--frame-interval", "1",
              "--no-annotate"])
    K, dist, _, _ = xmlio.load_camera_config(os.path.join(out, "cam1"))
    assert abs(K[0, 0] - K2[0, 0]) / K2[0, 0] < 0.02
    assert abs(K[1, 2] - K2[1, 2]) < 6.0


def test_cli_calibrate_intrinsics_photometric(board_dir, tmp_path):
    """The detector-free photometric route through the CLI."""
    root, tpc, K2 = board_dir
    out = str(tmp_path / "out")
    cli.main(["calibrate", "--cpu", "--data", root, "--out-dir", out,
              "--mode", "intrinsics", "--method", "photometric",
              "--cams", "1", "--video", "checkerboard.avi",
              "--frame-interval", "1", "--photometric-iters", "60"])
    K, _, _, _ = xmlio.load_camera_config(os.path.join(out, "cam1"))
    assert abs(K[0, 0] - K2[0, 0]) / K2[0, 0] < 0.10
    assert os.path.exists(os.path.join(out, "cam1",
                                       "photometric_calib.npz"))


def test_cli_pipeline_stream(rig_dir, out_dir):
    """Streaming loop: native prefetch decode + single-dispatch full step
    (XLA table route on CPU) + PLY of the first frame."""
    ply = os.path.join(out_dir, "stream.ply")
    cli.main(["pipeline", "--cpu", "--data", rig_dir, "--out-dir", out_dir,
              "--grid", "16", "--frames", "2", "--ply", ply])
    with open(ply, "rb") as f:
        head = f.read(400).decode("latin1")
    n = int([ln for ln in head.splitlines()
             if ln.startswith("element vertex")][0].split()[-1])
    assert n > 0


def test_cli_pipeline_offline(rig_dir, out_dir):
    """Offline whole-video mode: chunks of N frames per fused launch,
    host color gather, PLY of frame 0."""
    ply = os.path.join(out_dir, "offline.ply")
    cli.main(["pipeline", "--cpu", "--data", rig_dir, "--out-dir", out_dir,
              "--grid", "16", "--frames", "3", "--offline", "2",
              "--ply", ply])
    with open(ply, "rb") as f:
        head = f.read(400).decode("latin1")
    n = int([ln for ln in head.splitlines()
             if ln.startswith("element vertex")][0].split()[-1])
    assert n > 0


def test_cli_render_headless_png(rig_dir, out_dir):
    png = os.path.join(out_dir, "render.png")
    cli.main(["render", "--cpu", "--data", rig_dir, "--out-dir", out_dir,
              "--grid", "16", "--png", png])
    import cv2

    img = cv2.imread(png)
    assert img is not None and img.shape[0] > 100
    assert img.std() > 1.0  # not a blank canvas


def test_cli_render_animate_mp4(rig_dir, out_dir):
    """--animate N streams frames through the pipeline and encodes an
    orbit mp4 (splat renderer on CPU; the GL path shares the loop)."""
    mp4 = os.path.join(out_dir, "anim.mp4")
    cli.main(["render", "--cpu", "--data", rig_dir, "--out-dir", out_dir,
              "--grid", "16", "--animate", "2", "--png", mp4])
    import cv2

    cap = cv2.VideoCapture(mp4)
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    ok, frame = cap.read()
    cap.release()
    assert n == 2 and ok
    assert frame.shape == (720, 1280, 3)
    assert frame.std() > 1.0
