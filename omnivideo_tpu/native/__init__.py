"""Native (C++) host-side kernels with on-demand compilation.

The frame-ops library compiles once per machine into this package directory
(g++ -O3 -shared); ctypes bindings with transparent numpy fallbacks live in
utils/frame_native.py.
"""

import ctypes
import logging
import pathlib
import subprocess

log = logging.getLogger(__name__)

_DIR = pathlib.Path(__file__).parent
_SO = _DIR / "libframe_ops.so"  # lib- prefix: not an importable Python module
_SRC = _DIR / "frame_ops.cpp"


def load_frame_ops():
    """Compile (if needed) and load the frame-ops shared library, or None."""
    try:
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(_SO)],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(str(_SO))
        lib.frames_to_chw_norm.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.sample_frames_to_chw_norm.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.chw_to_frames_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ]
        return lib
    except Exception as e:  # pragma: no cover - toolchain-less environments
        log.warning("native frame_ops unavailable (%s); using numpy fallback", e)
        return None
