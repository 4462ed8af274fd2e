"""ctypes bindings for the native sensor runtime (csrc/pvio_core.cpp).

Builds libpviocore.so on first use (g++, no external deps) and caches it
next to the source. Falls back gracefully: `available()` is False when no
compiler is present, and callers keep the pure-Python path.
"""

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_CSRC = Path(__file__).resolve().parents[2] / "csrc"
_SO = _CSRC / "libpviocore.so"
_lib = None
_tried = False


def _build():
    src = _CSRC / "pvio_core.cpp"
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
           "-o", str(_SO), str(src)]
    subprocess.run(cmd, check=True, capture_output=True)


def load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _SO.exists() or _SO.stat().st_mtime < (_CSRC / "pvio_core.cpp").stat().st_mtime:
            _build()
        lib = ctypes.CDLL(str(_SO))
    except Exception:
        return None
    lib.hub_create.restype = ctypes.c_void_p
    lib.hub_destroy.argtypes = [ctypes.c_void_p]
    lib.hub_push_gyro.argtypes = [ctypes.c_void_p] + [ctypes.c_double] * 4
    lib.hub_push_accel.argtypes = [ctypes.c_void_p] + [ctypes.c_double] * 4
    lib.hub_push_frame.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_double]
    lib.hub_poll_frame.restype = ctypes.c_int64
    lib.hub_poll_frame.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
    ]
    lib.hub_predict.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_double), ctypes.c_double,
        ctypes.c_double, ctypes.POINTER(ctypes.c_double),
    ]
    lib.hub_fused_count.restype = ctypes.c_int64
    lib.hub_fused_count.argtypes = [ctypes.c_void_p]
    lib.tum_open.restype = ctypes.c_void_p
    lib.tum_open.argtypes = [ctypes.c_char_p]
    lib.tum_write.argtypes = [ctypes.c_void_p, ctypes.c_double,
                              ctypes.POINTER(ctypes.c_double),
                              ctypes.POINTER(ctypes.c_double)]
    lib.tum_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available():
    return load() is not None


class NativeSensorHub:
    """Native IMU pairing + frame association + IMU-rate prediction."""

    def __init__(self, imu_capacity=256):
        self._lib = load()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        self._h = self._lib.hub_create()
        self.cap = imu_capacity
        self._ts = np.zeros(imu_capacity)
        self._ws = np.zeros((imu_capacity, 3))
        self._as = np.zeros((imu_capacity, 3))

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.hub_destroy(self._h)
            self._h = None

    def push_gyro(self, t, x, y, z):
        self._lib.hub_push_gyro(self._h, t, x, y, z)

    def push_accel(self, t, x, y, z):
        self._lib.hub_push_accel(self._h, t, x, y, z)

    def push_frame(self, frame_id, t):
        self._lib.hub_push_frame(self._h, frame_id, t)

    def poll_frame(self):
        """Returns (id, t, ts, ws, accs) or None when no frame is ready."""
        fid = ctypes.c_int64()
        ft = ctypes.c_double()
        D = ctypes.POINTER(ctypes.c_double)
        n = self._lib.hub_poll_frame(
            self._h, ctypes.byref(fid), ctypes.byref(ft),
            self._ts.ctypes.data_as(D), self._ws.ctypes.data_as(D),
            self._as.ctypes.data_as(D), self.cap,
        )
        if n < 0:
            return None
        return (int(fid.value), float(ft.value), self._ts[:n].copy(),
                self._ws[:n].copy(), self._as[:n].copy())

    def predict(self, state16, t0, t_now):
        """state16 = [q(4) p(3) v(3) bg(3) ba(3)] -> (q(4), p(3))."""
        s = np.ascontiguousarray(state16, dtype=np.float64)
        out = np.zeros(7)
        D = ctypes.POINTER(ctypes.c_double)
        self._lib.hub_predict(self._h, s.ctypes.data_as(D), t0, t_now,
                              out.ctypes.data_as(D))
        return out[:4].copy(), out[4:].copy()

    @property
    def fused_count(self):
        return int(self._lib.hub_fused_count(self._h))


class NativeTumWriter:
    def __init__(self, path):
        self._lib = load()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        self._f = self._lib.tum_open(str(path).encode())

    def write_pose(self, t, q_wxyz, p):
        D = ctypes.POINTER(ctypes.c_double)
        q = np.ascontiguousarray(q_wxyz, dtype=np.float64)
        pp = np.ascontiguousarray(p, dtype=np.float64)
        self._lib.tum_write(self._f, float(t), q.ctypes.data_as(D),
                            pp.ctypes.data_as(D))

    def close(self):
        if self._f:
            self._lib.tum_close(self._f)
            self._f = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()
