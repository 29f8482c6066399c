"""On-demand g++ build for the native extensions in this directory.

pybind11 is not available in the image, so extensions use the raw CPython
C API and are compiled directly with g++ (no setuptools sandbox needed).
Build artifacts land next to the sources and are imported from there.
"""

from __future__ import annotations

import os
import subprocess
import sysconfig

_THIS_DIR = os.path.dirname(os.path.abspath(__file__))


def _ext_suffix() -> str:
    return sysconfig.get_config_var("EXT_SUFFIX") or ".so"


def _build(stem: str, force: bool = False) -> str:
    src = os.path.join(_THIS_DIR, f"{stem}.cpp")
    out = os.path.join(_THIS_DIR, f"_{stem}" + _ext_suffix())
    if not force and os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        f"-I{include}", src, "-o", out,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def build_cphoc(force: bool = False) -> str:
    """Compile _cphoc if needed; returns the path to the shared object."""
    return _build("cphoc", force)


def build_featio(force: bool = False) -> str:
    """Compile _featio (threaded npy reader) if needed."""
    return _build("featio", force)


if __name__ == "__main__":
    print(build_cphoc(force=True))
    print(build_featio(force=True))
