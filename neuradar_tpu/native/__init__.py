"""Native (C++) host-side batch sampler, loaded via ctypes.

Compiled on first import with g++ (cached next to the source); everything
degrades gracefully to numpy when the toolchain is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_HERE = Path(__file__).parent
_SO_PATH = _HERE / "_batch_sampler.so"
_LIB = None


def _build() -> Optional[ctypes.CDLL]:
    src = _HERE / "batch_sampler.cc"
    if not _SO_PATH.exists() or _SO_PATH.stat().st_mtime < src.stat().st_mtime:
        try:
            # no -march=native: the gathers are memory-bound (no vector win)
            # and a copied workspace must not dlopen an ISA-mismatched binary
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-o", str(_SO_PATH), str(src), "-lpthread"],
                check=True,
                capture_output=True,
            )
        except (OSError, subprocess.CalledProcessError):
            return None
    try:
        lib = ctypes.CDLL(str(_SO_PATH))
    except OSError:
        return None
    lib.sample_patches_u8.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
    ]
    lib.sample_points.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
    ]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is None:
        _LIB = _build() or False
    return _LIB or None


def sample_patches_u8(images: np.ndarray, frame_idx: np.ndarray, top_left: np.ndarray, patch: int) -> np.ndarray:
    """Threaded raw uint8 patch gather: images [N, H, W, 3] uint8,
    frame_idx [B] int32, top_left [B, 2] int32 -> [B, patch, patch, 3] uint8
    (normalization happens on-device; uint8 ships 4x less H2D traffic)."""
    lib = get_lib()
    B = len(frame_idx)
    if B == 0:
        return np.zeros((0, patch, patch, 3), np.uint8)
    if lib is None:
        return np.stack(
            [images[f, r : r + patch, c : c + patch] for f, (r, c) in zip(frame_idx, top_left)]
        )
    images = np.ascontiguousarray(images)
    frame_idx = np.ascontiguousarray(frame_idx.astype(np.int32))
    top_left = np.ascontiguousarray(top_left.astype(np.int32))
    out = np.empty((B, patch, patch, 3), np.uint8)
    lib.sample_patches_u8(
        images.ctypes.data, images.shape[0], images.shape[1], images.shape[2],
        frame_idx.ctypes.data, top_left.ctypes.data, B, patch, out.ctypes.data,
    )
    return out


def sample_points(points: np.ndarray, scan_ids: np.ndarray, idx: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Threaded row gather: points [N, D] f32, scan_ids [N] i64, idx [K] i64
    -> ([K, D] f32, [K] i32)."""
    lib = get_lib()
    if lib is None:
        return points[idx].astype(np.float32), scan_ids[idx].astype(np.int32)
    points = np.ascontiguousarray(points.astype(np.float32))
    scan_ids = np.ascontiguousarray(scan_ids.astype(np.int64))
    idx = np.ascontiguousarray(idx.astype(np.int64))
    K, D = len(idx), points.shape[1]
    out_p = np.empty((K, D), np.float32)
    out_s = np.empty((K,), np.int32)
    lib.sample_points(points.ctypes.data, scan_ids.ctypes.data, len(points), D,
                      idx.ctypes.data, K, out_p.ctypes.data, out_s.ctypes.data)
    return out_p, out_s
