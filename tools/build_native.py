"""Build the native host-side library (line3dpp_tpu/native/libl3dnative.so).

Usage: python tools/build_native.py
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
NATIVE = os.path.join(HERE, "..", "line3dpp_tpu", "native")


def build() -> str:
    src = os.path.join(NATIVE, "l3dnative.cc")
    out = os.path.join(NATIVE, "libl3dnative.so")
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", out]
    subprocess.check_call(cmd)
    return out


if __name__ == "__main__":
    path = build()
    print(f"built {path}")
    sys.exit(0)
