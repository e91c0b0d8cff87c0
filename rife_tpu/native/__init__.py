"""ctypes binding for the native frame-ops library (numpy fallback).

Builds native/frameops.cpp on first use when g++ is available (no
pybind11 in the environment; plain C ABI + ctypes).  All entry points
degrade to numpy transparently, so the framework never hard-depends on
the toolchain.
"""
from __future__ import annotations

import ctypes
import os
import shutil
import subprocess
import tempfile

import numpy as np

_LIB = None
_TRIED = False
_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "frameops.cpp")
_THREADS = min(8, os.cpu_count() or 1)


def _build_and_load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.abspath(_SRC)
    if not os.path.exists(src) or shutil.which("g++") is None:
        return None
    cache = os.path.join(tempfile.gettempdir(), "rife_tpu_native")
    os.makedirs(cache, exist_ok=True)
    so = os.path.join(cache, "libframeops.so")
    try:
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
                 "-o", so, src, "-lpthread"],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so)
        lib.rife_u8_to_f32_pad.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p] + [ctypes.c_int] * 6
        lib.rife_f32_to_u8_crop.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p] + [ctypes.c_int] * 6
        lib.rife_yuv420_to_rgb.argtypes = [ctypes.c_void_p] * 4 + [ctypes.c_int] * 2
        assert lib.rife_frameops_version() == 1
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def have_native() -> bool:
    return _build_and_load() is not None


def u8_to_f32_pad(frame_u8: np.ndarray, pad_h: int, pad_w: int) -> np.ndarray:
    """uint8 HWC -> float32 [0,1] zero-padded to (pad_h, pad_w)."""
    h, w, c = frame_u8.shape
    lib = _build_and_load()
    if lib is None:
        out = np.zeros((pad_h, pad_w, c), np.float32)
        out[:h, :w] = frame_u8.astype(np.float32) / 255.0
        return out
    src = np.ascontiguousarray(frame_u8)
    out = np.empty((pad_h, pad_w, c), np.float32)
    lib.rife_u8_to_f32_pad(src.ctypes.data, out.ctypes.data, h, w, c,
                           pad_h, pad_w, _THREADS)
    return out


def u8_to_f32(frames_u8: np.ndarray) -> np.ndarray:
    """uint8 [0,255] -> float32 [0,1], any leading dims over HWC.

    Batched arrays fold their leading dims into rows (contiguous layout),
    so a whole (N, H, W, C) training batch is one threaded native call.
    """
    shape = frames_u8.shape
    flat = np.ascontiguousarray(frames_u8).reshape(-1, shape[-2], shape[-1])
    out = u8_to_f32_pad(flat, flat.shape[0], flat.shape[1])
    return out.reshape(shape)


def f32_to_u8(frames_f32: np.ndarray) -> np.ndarray:
    """float32 [0,1] -> clamped+rounded uint8, any leading dims over HWC."""
    shape = frames_f32.shape
    flat = np.ascontiguousarray(frames_f32, dtype=np.float32).reshape(
        -1, shape[-2], shape[-1])
    out = f32_to_u8_crop(flat, flat.shape[0], flat.shape[1])
    return out.reshape(shape)


def f32_to_u8_crop(frame_f32: np.ndarray, dst_h: int, dst_w: int) -> np.ndarray:
    """float32 HWC [0,1] -> clamped+rounded uint8 crop from the origin."""
    src_h, src_w, c = frame_f32.shape
    lib = _build_and_load()
    if lib is None:
        return (np.clip(frame_f32[:dst_h, :dst_w], 0, 1) * 255.0 + 0.5).astype(np.uint8)
    src = np.ascontiguousarray(frame_f32, dtype=np.float32)
    out = np.empty((dst_h, dst_w, c), np.uint8)
    lib.rife_f32_to_u8_crop(src.ctypes.data, out.ctypes.data, src_h, src_w,
                            dst_h, dst_w, c, _THREADS)
    return out
