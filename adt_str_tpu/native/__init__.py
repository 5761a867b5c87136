"""Native extension loader: compiles `adt_native.cpp` on demand with g++.

Exposes `native()` -> the compiled module or None; callers keep pure-Python
fallbacks (tokenizer decode, onset matcher) so the framework works without a
toolchain. The build is a single translation unit against Python.h — no
pybind11 (absent in this image), no setuptools invocation at import time.
"""

from __future__ import annotations

import importlib.util
import logging
import subprocess
import sys
import sysconfig
from pathlib import Path

logger = logging.getLogger(__name__)

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "adt_native.cpp"
_cached: object | bool | None = None


def _so_path() -> Path:
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return _HERE / f"_adt_native{suffix}"


def build(force: bool = False) -> Path | None:
    """Compile the extension; returns the .so path or None on failure."""
    so = _so_path()
    if so.exists() and not force and so.stat().st_mtime >= _SRC.stat().st_mtime:
        return so
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        f"-I{include}", str(_SRC), "-o", str(so),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        return so
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        msg = getattr(e, "stderr", str(e))
        logger.info("native build unavailable: %s", msg)
        return None


def native():
    """-> compiled `_adt_native` module, or None."""
    global _cached
    if _cached is not None:
        return _cached or None
    so = build()
    if so is None:
        _cached = False
        return None
    try:
        spec = importlib.util.spec_from_file_location("_adt_native", so)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        sys.modules["_adt_native"] = mod
        _cached = mod
        return mod
    except Exception as e:  # pragma: no cover
        logger.info("native load failed: %s", e)
        _cached = False
        return None
