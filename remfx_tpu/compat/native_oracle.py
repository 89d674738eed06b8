"""ctypes loader for the C++ reference DSP oracle (native/librefdsp.so).

Used by golden-parity tests and debugging tools; builds on demand with
``make -C native`` if the shared library is missing.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB = None


def _lib():
    global _LIB
    if _LIB is None:
        so = _NATIVE_DIR / "librefdsp.so"
        if not so.exists():
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True)
        _LIB = ctypes.CDLL(str(so))
    return _LIB


def _f32(x):
    return np.ascontiguousarray(np.asarray(x, np.float32).reshape(-1))


def distortion(x, drive_db):
    x = _f32(x)
    y = np.empty_like(x)
    _lib().ref_distortion(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_long(len(x)), ctypes.c_float(drive_db))
    return y


def delay(x, sr, delay_seconds, feedback, mix):
    x = _f32(x)
    y = np.empty_like(x)
    _lib().ref_delay(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_long(len(x)), ctypes.c_double(sr),
        ctypes.c_double(delay_seconds), ctypes.c_double(feedback),
        ctypes.c_double(mix))
    return y


def compressor(x, sr, threshold_db, ratio, attack_ms, release_ms):
    x = _f32(x)
    y = np.empty_like(x)
    _lib().ref_compressor(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_long(len(x)), ctypes.c_double(sr),
        ctypes.c_double(threshold_db), ctypes.c_double(ratio),
        ctypes.c_double(attack_ms), ctypes.c_double(release_ms))
    return y


def limiter(x, sr, threshold_db, release_ms):
    x = _f32(x)
    y = np.empty_like(x)
    _lib().ref_limiter(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_long(len(x)), ctypes.c_double(sr),
        ctypes.c_double(threshold_db), ctypes.c_double(release_ms))
    return y


def chorus(x, sr, rate_hz, depth, centre_ms, feedback, mix):
    x = _f32(x)
    y = np.empty_like(x)
    _lib().ref_chorus(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_long(len(x)), ctypes.c_double(sr), ctypes.c_double(rate_hz),
        ctypes.c_double(depth), ctypes.c_double(centre_ms),
        ctypes.c_double(feedback), ctypes.c_double(mix))
    return y


def reverb_mono(x, sr, room_size, damping, wet_level, dry_level, width):
    x = _f32(x)
    y = np.empty_like(x)
    _lib().ref_reverb_mono(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_long(len(x)), ctypes.c_long(int(sr)),
        ctypes.c_double(room_size), ctypes.c_double(damping),
        ctypes.c_double(wet_level), ctypes.c_double(dry_level),
        ctypes.c_double(width))
    return y


def biquad(x, b, a):
    x = _f32(x)
    y = np.empty_like(x)
    b = np.ascontiguousarray(np.asarray(b, np.float64))
    a = np.ascontiguousarray(np.asarray(a, np.float64))
    _lib().ref_biquad(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_long(len(x)),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return y
