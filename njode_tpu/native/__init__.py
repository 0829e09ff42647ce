"""ctypes bindings for the native collation kernels (collate.cc).

The shared library is built on first use with g++ (cached next to the
source); when the toolchain or build is unavailable, callers fall back to
the pure-Python implementations in data/grid.py — behavior is identical
(tests/test_native.py checks both paths against each other).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libnjode_collate.so")
_SRC = os.path.join(_DIR, "collate.cc")
_lock = threading.Lock()
_lib = None
_tried = False

_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_f64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")


def _build():
    subprocess.run(
        ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-o", _SO, _SRC],
        check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_SO)
            lib.njode_build_union_grid.restype = ctypes.c_int64
            lib.njode_build_union_grid.argtypes = [
                _f64, ctypes.c_int64, ctypes.c_double, ctypes.c_double,
                ctypes.c_int64, _f64, _f64, _i64]
            lib.njode_densify_events.restype = None
            lib.njode_densify_events.argtypes = [
                _i64, _i64, _i64, _f32, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, _f32, _f32, _f32]
            lib.njode_densify_paths.restype = None
            lib.njode_densify_paths.argtypes = [
                _f64, _i64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                _f32, _f32, _f32, _f32]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return get_lib() is not None


def build_union_grid(obs_times, delta_t, T, max_steps):
    """Native grid construction; returns (times, dts, obs_step, K) or None
    when the library is unavailable / max_steps is exceeded (caller falls
    back to Python, which raises the descriptive error)."""
    lib = get_lib()
    if lib is None:
        return None
    obs_times = np.ascontiguousarray(obs_times, np.float64)
    times = np.empty(max_steps, np.float64)
    dts = np.empty(max_steps, np.float64)
    obs_step = np.empty(len(obs_times), np.int64)
    k = lib.njode_build_union_grid(obs_times, len(obs_times), float(delta_t),
                                   float(T), max_steps, times, dts, obs_step)
    if k < 0:
        return None
    return times, dts, obs_step, int(k)


def densify_events(obs_step, time_ptr, obs_idx, X, M, K, B):
    """Native event scatter; returns (obs [K,B], X [K,B,D], M [K,B,D])."""
    lib = get_lib()
    if lib is None:
        return None
    D = X.shape[1]
    out_obs = np.zeros((K, B), np.float32)
    out_X = np.zeros((K, B, D), np.float32)
    out_M = np.zeros((K, B, D), np.float32)
    X = np.ascontiguousarray(X, np.float32)
    m_ptr = None
    if M is not None:
        M = np.ascontiguousarray(M, np.float32)
        m_ptr = M.ctypes.data_as(ctypes.c_void_p)
    lib.njode_densify_events(
        np.ascontiguousarray(obs_step, np.int64),
        np.ascontiguousarray(time_ptr, np.int64),
        np.ascontiguousarray(obs_idx, np.int64),
        X, m_ptr, len(obs_step), B, D, out_obs, out_X, out_M)
    return out_obs, out_X, out_M


def densify_paths(paths, observed):
    """Native dense batch from grid-sampled paths; returns
    (obs [K,B], X [K,B,D], M [K,B,D], n_obs [B])."""
    lib = get_lib()
    if lib is None:
        return None
    paths = np.ascontiguousarray(paths, np.float64)
    observed = np.ascontiguousarray(observed, np.int64)
    B, D, T1 = paths.shape
    K = T1 - 1
    out_obs = np.empty((K, B), np.float32)
    out_X = np.empty((K, B, D), np.float32)
    out_M = np.empty((K, B, D), np.float32)
    out_n = np.empty(B, np.float32)
    lib.njode_densify_paths(paths, observed, B, D, T1, out_obs, out_X,
                            out_M, out_n)
    return out_obs, out_X, out_M, out_n
