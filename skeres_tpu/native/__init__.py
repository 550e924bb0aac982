"""Native (C++) tier: fast loaders and host-side runtime pieces.

Shared objects build on demand with g++ (no pybind11 in this image —
bindings go through ctypes, per the environment constraints) and cache
next to the sources. A failed toolchain never breaks the package: callers
treat ImportError as "fall back to the Python path".
"""

from __future__ import annotations

import os
import subprocess
import sysconfig

_HERE = os.path.dirname(os.path.abspath(__file__))


def build_shared(name: str, sources: list[str], extra_flags=()) -> str:
    """Compile ``sources`` into ``_HERE/lib{name}.so`` if stale; return path."""
    out = os.path.join(_HERE, f"lib{name}.so")
    srcs = [os.path.join(_HERE, s) for s in sources]
    if os.path.exists(out) and all(
        os.path.getmtime(out) >= os.path.getmtime(s) for s in srcs
    ):
        return out
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-std=c++17",
        "-shared",
        "-fPIC",
        *extra_flags,
        *srcs,
        "-o",
        out,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return out
