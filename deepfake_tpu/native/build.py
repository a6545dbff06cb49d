"""Build the native ingest library: python -m deepfake_tpu.native.build"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "ingest.cpp")
OUT = os.path.join(HERE, "libdfingest.so")

OPENCV_LIBS = ["opencv_core", "opencv_imgproc", "opencv_videoio"]
FFMPEG_LIBS = ["avformat", "avcodec", "avutil", "swresample"]


def build(verbose: bool = True) -> str:
    cmd = (
        ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", SRC, "-o", OUT,
         "-I/usr/include/opencv4"]
        + [f"-l{l}" for l in OPENCV_LIBS + FFMPEG_LIBS]
        + ["-lpthread"]
    )
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    build()
    print(f"built {OUT}")
    sys.exit(0)
