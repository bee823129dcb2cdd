"""uniform dims, warnings, profiling, model loading."""

import json
import logging

import numpy as np
import pytest

from vbr_tpu.utils import imageproc, profiling, warnings_
from vbr_tpu.viewer import models3d


class TestImageProc:
    def test_uniform_dims(self):
        imgs = [
            np.zeros((10, 12, 3), np.uint8),
            np.ones((8, 16, 3), np.uint8),
            np.full((9, 12, 3), 2, np.uint8),
        ]
        out, (h, w) = imageproc.uniform_image_dimensions(imgs)
        assert (h, w) == (8, 12)
        assert all(o.shape[:2] == (8, 12) for o in out)
        # center crop preserves values
        assert out[1].max() == 1

    def test_empty(self):
        out, hw = imageproc.uniform_image_dimensions([])
        assert out == [] and hw == (0, 0)


class TestWarnings:
    def test_known_ids(self, caplog):
        with caplog.at_level(logging.WARNING, logger="vbr_tpu"):
            msg = warnings_.show_warning("video_none")
        assert "Video" in msg
        assert "Video" in caplog.text

    def test_unknown_id(self):
        assert "unknown" in warnings_.show_warning("no_such_id")


class TestProfiling:
    def test_stage_timer(self):
        t = profiling.StageTimer()
        with t("a"):
            sum(range(1000))
        with t("a"):
            pass
        assert t.counts["a"] == 2
        assert "a:" in t.report()

    def test_checked_raises_on_nan(self):
        import jax
        import jax.numpy as jnp

        @profiling.checked
        @jax.jit
        def f(x):
            return jnp.log(x)

        f(jnp.ones(3))  # fine
        with pytest.raises(Exception):
            f(-jnp.ones(3))  # log of negative → nan


class TestModelLoading:
    def _write_model(self, path):
        doc = {
            "rootnode": {
                "transformation": list(np.eye(4).reshape(-1)),
                "meshes": [0],
                "children": [],
            },
            "meshes": [
                {
                    "vertices": [0, 0, 0, 1, 0, 0, 0, 1, 0, 1, 1, 0],
                    "normals": [0, 0, 1] * 4,
                    "texturecoords": [[0, 0, 1, 0, 0, 1, 1, 1]],
                    "faces": [[0, 1, 2], [1, 3, 2]],
                }
            ],
        }
        with open(path, "w") as f:
            json.dump(doc, f)

    def test_load_and_flatten(self, tmp_path):
        p = str(tmp_path / "quad.json")
        self._write_model(p)
        meshes = models3d.load_assimp_json(p)
        assert len(meshes) == 1
        m = meshes[0]
        assert m.vertices.shape == (4, 3)
        assert m.faces.shape == (2, 3)
        assert m.uvs.shape == (4, 2)
        tris = models3d.mesh_to_tris(meshes)
        assert tris.shape == (2, 3, 3)

    def test_transform_applied(self, tmp_path):
        p = str(tmp_path / "moved.json")
        doc = {
            "rootnode": {
                "transformation": [1, 0, 0, 5, 0, 1, 0, 0, 0, 0, 1, 0,
                                   0, 0, 0, 1],
                "meshes": [0],
            },
            "meshes": [
                {"vertices": [0, 0, 0], "faces": []}
            ],
        }
        with open(p, "w") as f:
            json.dump(doc, f)
        meshes = models3d.load_assimp_json(p)
        np.testing.assert_allclose(meshes[0].vertices[0], [5, 0, 0])


class TestPreview:
    """Timed result previews (reference background_subtraction.py:277-280,
    camera_calibration.py:503-506) with headless degrade."""

    def test_disabled_by_nonpositive_ms(self):
        from vbr_tpu.utils import preview

        img = np.zeros((4, 4), np.uint8)
        assert preview.show_result("w", img, 0) is False
        assert preview.show_result("w", img, -1) is False

    def test_headless_degrades_once(self, monkeypatch):
        from vbr_tpu.utils import preview

        monkeypatch.setattr(preview, "_DISABLED", False)
        calls = []

        class FakeCv2:
            def imshow(self, *a):
                calls.append("imshow")
                raise RuntimeError("no display")

        import sys
        monkeypatch.setitem(sys.modules, "cv2", FakeCv2())
        img = np.zeros((4, 4), np.uint8)
        assert preview.show_result("w", img, 10) is False
        assert preview._DISABLED is True
        # second call is a no-op: cv2 not touched again
        assert preview.show_result("w", img, 10) is False
        assert calls == ["imshow"]

    def test_bad_call_does_not_latch_disable(self, monkeypatch):
        # a per-image failure (e.g. unsupported dtype) must not disable
        # previews of later, valid images — only display errors latch
        from vbr_tpu.utils import preview

        monkeypatch.setattr(preview, "_DISABLED", False)
        calls = []

        class FakeCv2:
            error = type("error", (Exception,), {})

            def imshow(self, name, img):
                calls.append(name)
                if name == "bad":
                    raise self.error("mat type assertion failed")

            def waitKey(self, ms):
                pass

        import sys
        monkeypatch.setitem(sys.modules, "cv2", FakeCv2())
        img = np.zeros((4, 4), np.uint8)
        assert preview.show_result("bad", img, 10) is False
        assert preview._DISABLED is False
        assert preview.show_result("good", img, 10) is True
        assert calls == ["bad", "good"]

    def test_shown_when_gui_works(self, monkeypatch):
        from vbr_tpu.utils import preview

        monkeypatch.setattr(preview, "_DISABLED", False)
        shown = []

        class FakeCv2:
            def imshow(self, name, img):
                shown.append(name)

            def waitKey(self, ms):
                shown.append(ms)

        import sys
        monkeypatch.setitem(sys.modules, "cv2", FakeCv2())
        img = np.zeros((4, 4), np.uint8)
        assert preview.show_result("w", img, 25) is True
        assert shown == ["w", 25]
