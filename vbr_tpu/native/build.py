"""Build the native host runtime (libvbr_host.so) with g++.

Invoked lazily by vbr_tpu.native on first import, or manually:
    python -m vbr_tpu.native.build
"""

from __future__ import annotations

import os
import subprocess
import sys

SRC = os.path.join(os.path.dirname(__file__), "vbr_host.cpp")
OUT = os.path.join(os.path.dirname(__file__), "libvbr_host.so")

LIBS = ["opencv_core", "opencv_videoio", "opencv_video", "opencv_bgsegm",
        "opencv_imgproc"]


def build(force: bool = False) -> str:
    if (
        not force
        and os.path.exists(OUT)
        and os.path.getmtime(OUT) >= os.path.getmtime(SRC)
    ):
        return OUT
    cmd = (
        ["g++", "-O2", "-fPIC", "-shared", "-std=c++17", SRC, "-o", OUT,
         "-I/usr/include/opencv4"]
        + [f"-l{l}" for l in LIBS]
        + ["-lpthread"]
    )
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    print(build(force="--force" in sys.argv))
