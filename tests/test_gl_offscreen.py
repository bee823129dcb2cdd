"""Drive the REAL GL engine offscreen (EGL surfaceless + swrast)."""

import numpy as np
import pytest


def _egl_available():
    try:
        from vbr_tpu.viewer.offscreen import OffscreenContext

        with OffscreenContext(64, 64):
            return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not _egl_available(), reason="no EGL surfaceless support"
)


def test_instanced_cubes_hdr_chain(tmp_path):
    from OpenGL import GL as gl

    from vbr_tpu.viewer import gl_engine as eng
    from vbr_tpu.viewer.offscreen import OffscreenContext

    W, H = 320, 240
    with OffscreenContext(W, H) as ctx:
        gl.glEnable(gl.GL_DEPTH_TEST)
        prog = eng.compile_program(eng.VERT_SRC, eng.FRAG_SRC)
        cubes = eng.InstancedCubes(max_instances=1000)
        hdr = eng.HDRPipeline(W, H, blur_passes=2)
        cam = eng.FlyCamera(position=(0, 0, 10), pitch=0, yaw=-90)

        rng = np.random.default_rng(0)
        pos = rng.uniform(-3, 3, (200, 3)).astype(np.float32)
        col = rng.uniform(0.2, 1.0, (200, 3)).astype(np.float32)
        cubes.set_instances(pos, col)

        hdr.bind_scene()
        gl.glClearColor(0.0, 0.0, 0.0, 1.0)
        gl.glClear(gl.GL_COLOR_BUFFER_BIT | gl.GL_DEPTH_BUFFER_BIT)
        vp = (eng.perspective(45.0, W / H, 0.1, 100.0) @ cam.view_matrix())
        gl.glUseProgram(prog)
        gl.glUniformMatrix4fv(
            gl.glGetUniformLocation(prog, "u_view_proj"), 1, True,
            vp.astype(np.float32),
        )
        gl.glUniform1f(gl.glGetUniformLocation(prog, "u_scale"), 0.5)
        cubes.draw()
        hdr.resolve(target_fbo=ctx._fbo)

        img = ctx.read_pixels()
        assert img.shape == (H, W, 3)
        assert img.std() > 10, "scene should contain visible cubes"
        # tonemap never reaches pure white (1 - exp(-x*0.72) < 1)
        assert img.max() <= 255

        from vbr_tpu.viewer import headless

        headless.save_png(str(tmp_path / "gl_offscreen.png"), img)


def test_shadow_pipeline_builds():
    from vbr_tpu.viewer import gl_engine as eng
    from vbr_tpu.viewer.offscreen import OffscreenContext

    with OffscreenContext(64, 64) as ctx:
        shadow = eng.ShadowPipeline(size=256)
        shadow.bind()
        cubes = eng.InstancedCubes(max_instances=10)
        cubes.set_instances(
            np.zeros((5, 3), np.float32), np.ones((5, 3), np.float32)
        )
        from OpenGL import GL as gl

        gl.glUniform1f(
            gl.glGetUniformLocation(shadow.prog, "u_scale"), 1.0
        )
        cubes.draw()
        shadow.unbind((64, 64))
