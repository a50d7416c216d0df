"""On-demand build of the libjpeg shim (gdal_ray/_native/jpegshim.c).

The reference links the system libjpeg in C (frmts/jpeg/); we do the
same through a ~150-line shim compiled once per machine into this
directory (atomic tmp+rename, so concurrent Ray workers race safely).
If no compiler or libjpeg development files exist, ``load()`` returns
None and callers fall back to the from-spec decoder in codecs/jpeg.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "jpegshim.c")
_SO = os.path.join(_DIR, "libgrjpeg.so")

_lib = None
_tried = False


def _build() -> bool:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return True
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_DIR)
    os.close(fd)
    try:
        r = subprocess.run(
            ["gcc", "-O2", "-shared", "-fPIC", _SRC, "-o", tmp, "-ljpeg"],
            capture_output=True, timeout=120)
        if r.returncode != 0:
            return False
        os.replace(tmp, _SO)  # atomic; concurrent builders all win
        return True
    except (OSError, subprocess.SubprocessError):
        return False
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load():
    """ctypes handle to the built shim, or None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("GRAFT_NO_SYSCODECS") == "1":
        return None
    try:
        if not _build():
            return None
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.gr_jpeg_header.restype = ctypes.c_int
    lib.gr_jpeg_decode.restype = ctypes.c_int
    lib.gr_jpeg_encode.restype = ctypes.c_int
    lib.gr_free.restype = None
    lib.gr_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib
