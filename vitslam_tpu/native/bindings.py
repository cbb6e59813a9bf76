"""ctypes bindings + lazy g++ build for the native preprocessing kernels."""
from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import threading

import numpy as np

_HERE = osp.dirname(osp.abspath(__file__))
_SRC = osp.join(_HERE, "preprocess.cpp")
_LIB = osp.join(_HERE, "libvitslam_preprocess.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("VITSLAM_NATIVE", "1") == "0":
            return None
        if not osp.exists(_LIB) or osp.getmtime(_LIB) < osp.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        c_f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        c_f64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        c_u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.lidar_splat_depth.argtypes = [
            c_f32, ctypes.c_int64, c_f64, c_f64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_float, c_f32,
        ]
        lib.depth_to_points.argtypes = [
            c_f32, ctypes.c_int64, ctypes.c_int64, c_f64, c_f64,
            c_f32, c_f32, c_u8,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def lidar_splat_depth_native(points_xyz: np.ndarray, K: np.ndarray,
                             extr: np.ndarray, image_size,
                             eps: float = 0.05):
    """C++ LiDAR splat. points_xyz (N, 3). Returns (H, W) depth or None if
    the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    H, W = int(image_size[0]), int(image_size[1])
    pts = np.ascontiguousarray(points_xyz, np.float32)
    out = np.zeros(H * W, np.float32)
    lib.lidar_splat_depth(
        pts, pts.shape[0],
        np.ascontiguousarray(K, np.float64).reshape(-1),
        np.ascontiguousarray(extr[:3, :4], np.float64).reshape(-1),
        H, W, np.float32(eps), out,
    )
    return out.reshape(H, W)


def depth_to_points_native(depth: np.ndarray, extr: np.ndarray,
                           K: np.ndarray):
    """C++ depth back-projection. Returns (world, cam, mask) or None."""
    lib = _load()
    if lib is None:
        return None
    H, W = depth.shape
    d = np.ascontiguousarray(depth, np.float32)
    world = np.zeros(H * W * 3, np.float32)
    cam = np.zeros(H * W * 3, np.float32)
    mask = np.zeros(H * W, np.uint8)
    lib.depth_to_points(
        d.reshape(-1), H, W,
        np.ascontiguousarray(K, np.float64).reshape(-1),
        np.ascontiguousarray(extr[:3, :4], np.float64).reshape(-1),
        world, cam, mask,
    )
    return (world.reshape(H, W, 3), cam.reshape(H, W, 3),
            mask.reshape(H, W).astype(bool))
