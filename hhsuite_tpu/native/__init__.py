"""Native (C++) runtime kernels with build-on-demand loading.

`load()` returns the compiled `_hhsuite_native` module, building it
with g++ on first use (cached next to the source, invalidated by
source mtime), or None when no compiler/headers are available — all
callers fall back to their pure-Python implementations.
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig

_cached = None
_tried = False


def _so_path() -> str:
    d = os.path.dirname(os.path.abspath(__file__))
    tag = f"{sys.version_info.major}{sys.version_info.minor}"
    return os.path.join(d, f"_hhsuite_native.cpython-{tag}.so")


def build(verbose: bool = False) -> str:
    """Compile the extension; returns the .so path."""
    d = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(d, "hhsuite_native.cpp")
    so = _so_path()
    if (os.path.exists(so)
            and os.path.getmtime(so) >= os.path.getmtime(src)):
        return so
    inc = sysconfig.get_paths()["include"]
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
           f"-I{inc}", src, "-o", so]
    if verbose:
        print(" ".join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=True, capture_output=not verbose)
    return so


def load():
    """The compiled module, or None if it cannot be built."""
    global _cached, _tried
    if _tried:
        return _cached
    _tried = True
    try:
        build()
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "_hhsuite_native", _so_path())
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _cached = mod
    except Exception:
        _cached = None
    return _cached


if __name__ == "__main__":
    build(verbose=True)
    print(_so_path())
