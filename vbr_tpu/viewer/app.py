"""Interactive voxel-hull viewer (GLFW + GL 3.3 core).

The ``executable.py`` equivalent: window + render loop + input handling;
``G`` advances to the next video frame and re-carves (the reference's
re-voxelize key, executable.py:185-188), WASD/mouse fly the camera.

Consumes ONLY the reconstruction pipeline's public contract — positions +
colors arrays — exactly like the reference viewer's 4-function seam
(executable.py:9).
"""

from __future__ import annotations

import os
import time

import numpy as np

from vbr_tpu.utils.config import AppConfig, GridConfig, RigConfig
from vbr_tpu.pipelines import background, reconstruction
from vbr_tpu.utils import video as vio


def run_viewer(data_dir: str, config: AppConfig = AppConfig()):
    import glfw
    from OpenGL import GL as gl

    from vbr_tpu.viewer import gl_engine as eng

    if not glfw.init():
        raise RuntimeError("glfw.init failed (no display?)")
    glfw.window_hint(glfw.CONTEXT_VERSION_MAJOR, 3)
    glfw.window_hint(glfw.CONTEXT_VERSION_MINOR, 3)
    glfw.window_hint(glfw.OPENGL_PROFILE, glfw.OPENGL_CORE_PROFILE)
    glfw.window_hint(glfw.SAMPLES, config.sampling_level)
    window = glfw.create_window(
        config.window_width, config.window_height, "vbr_tpu viewer", None, None
    )
    if not window:
        glfw.terminate()
        raise RuntimeError("window creation failed")
    glfw.make_context_current(window)

    gl.glEnable(gl.GL_DEPTH_TEST)
    gl.glEnable(gl.GL_CULL_FACE)

    prog = eng.compile_program(eng.VERT_SRC, eng.FRAG_SRC)
    cubes = eng.InstancedCubes()
    floor = eng.InstancedCubes(max_instances=config.world_width * config.world_depth)
    cams_mesh = eng.InstancedCubes(max_instances=16)
    hdr = eng.HDRPipeline(config.window_width, config.window_height)
    camera = eng.FlyCamera()

    # pipeline state
    grid = GridConfig(
        nx=config.world_width, ny=config.world_height * 2, nz=config.world_depth
    )
    rig = RigConfig()
    cams = reconstruction.load_rig(data_dir)
    recon = reconstruction.Reconstructor(cams, grid, rig)
    bg_pipe = background.BackgroundPipeline(data_dir)
    source = vio.MultiCameraSource(data_dir)

    floor_pos, floor_col = reconstruction.generate_grid(
        config.world_width, config.world_width
    )
    floor.set_instances(np.asarray(floor_pos), np.asarray(floor_col))
    cam_pos, cam_col = reconstruction.get_cam_positions(cams)
    cams_mesh.set_instances(np.asarray(cam_pos, np.float64), np.asarray(cam_col))

    def recarve():
        frames = source.next_frames()
        if frames is None:
            return
        masks = bg_pipe.masks_for_frames(frames)
        pos, col = recon.carve_frame_compact(masks, frames)
        cubes.set_instances(pos, col)

    state = {"last_x": None, "last_y": None}

    def key_cb(win, key, scancode, action, mods):
        import glfw as g

        if action != g.PRESS:
            return
        if key == g.KEY_ESCAPE:
            g.set_window_should_close(win, True)
        if key == g.KEY_G:
            recarve()

    def mouse_cb(win, x, y):
        if state["last_x"] is not None:
            camera.rotate((x - state["last_x"]) * 0.2,
                          -(y - state["last_y"]) * 0.2)
        state["last_x"], state["last_y"] = x, y

    glfw.set_key_callback(window, key_cb)
    glfw.set_cursor_pos_callback(window, mouse_cb)

    proj = eng.perspective(
        45.0, config.window_width / config.window_height, config.near, config.far
    )

    while not glfw.window_should_close(window):
        speed = 0.4
        if glfw.get_key(window, glfw.KEY_W) == glfw.PRESS:
            camera.move(forward=1, speed=speed)
        if glfw.get_key(window, glfw.KEY_S) == glfw.PRESS:
            camera.move(forward=-1, speed=speed)
        if glfw.get_key(window, glfw.KEY_A) == glfw.PRESS:
            camera.move(right=-1, speed=speed)
        if glfw.get_key(window, glfw.KEY_D) == glfw.PRESS:
            camera.move(right=1, speed=speed)

        hdr.bind_scene()
        gl.glClearColor(0.05, 0.05, 0.07, 1.0)
        gl.glClear(gl.GL_COLOR_BUFFER_BIT | gl.GL_DEPTH_BUFFER_BIT)

        vp = (proj @ camera.view_matrix()).astype(np.float32)
        gl.glUseProgram(prog)
        gl.glUniformMatrix4fv(
            gl.glGetUniformLocation(prog, "u_view_proj"), 1, True, vp
        )
        for mesh, scale in ((floor, 1.0), (cubes, 1.0), (cams_mesh, 1.5)):
            gl.glUniform1f(gl.glGetUniformLocation(prog, "u_scale"), scale)
            mesh.draw()

        hdr.resolve()
        glfw.swap_buffers(window)
        glfw.poll_events()

    glfw.terminate()
