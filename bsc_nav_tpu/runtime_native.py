"""ctypes bindings for the native runtime (runtime/navgrid.cpp).

Builds the shared library on first use (g++ -O3, cached next to the
source) and exposes:

  - NativeNavGrid: Dijkstra distance fields, A* paths, frontier masks,
    connected-component labels over numpy grids (drop-in accelerators
    for env/pathfinding.py and memory/frontier.py on large grids);
  - FrameQueue: C++ ring buffer staging RGB-D frames + poses into packed
    contiguous batch buffers for device transfer.

Everything degrades gracefully: `available()` is False when no compiler
exists, and the pure-Python paths remain the reference implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO, "runtime", "navgrid.cpp")
_LIB = os.path.join(_REPO, "runtime", "libnavgrid.so")

_lib = None
_tried = False


def _build() -> Optional[str]:
    if os.path.exists(_LIB) and (os.path.getmtime(_LIB)
                                 >= os.path.getmtime(_SRC)):
        return _LIB
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC,
             "-o", _LIB],
            check=True, capture_output=True, timeout=180)
        return _LIB
    except Exception as e:              # noqa: BLE001 (no compiler, etc.)
        print(f"native runtime build failed: {e}")
        return None


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    path = _build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    ci = ctypes.c_int
    lib.distance_field.argtypes = [u8p, ci, ci, ci, ci, f32p]
    lib.astar_path.argtypes = [u8p, ci, ci, ci, ci, ci, ci, i32p, ci]
    lib.astar_path.restype = ci
    lib.find_frontiers.argtypes = [u8p, u8p, ci, ci, u8p]
    lib.label_components.argtypes = [u8p, ci, ci, ci, i32p]
    lib.label_components.restype = ci
    lib.fq_create.argtypes = [ci, ci, ci]
    lib.fq_create.restype = ctypes.c_void_p
    lib.fq_destroy.argtypes = [ctypes.c_void_p]
    lib.fq_size.argtypes = [ctypes.c_void_p]
    lib.fq_size.restype = ci
    lib.fq_push.argtypes = [ctypes.c_void_p, u8p, f32p, f32p]
    lib.fq_push.restype = ci
    lib.fq_pop_batch.argtypes = [ctypes.c_void_p, ci, u8p, f32p, f32p]
    lib.fq_pop_batch.restype = ci
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _u8(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i32(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


class NativeNavGrid:
    """Native kernels over a navigability grid (cells, not metres)."""

    def __init__(self, nav: np.ndarray):
        self.lib = _load()
        if self.lib is None:
            raise RuntimeError("native runtime unavailable")
        self.nav = np.ascontiguousarray(nav.astype(np.uint8))
        self.nx, self.nz = self.nav.shape

    def distance_field(self, si: int, sj: int) -> np.ndarray:
        out = np.empty((self.nx, self.nz), np.float32)
        self.lib.distance_field(_u8(self.nav), self.nx, self.nz,
                                si, sj, _f32(out))
        return out

    def astar(self, si: int, sj: int, gi: int, gj: int
              ) -> Optional[np.ndarray]:
        buf = np.empty((self.nx * self.nz, 2), np.int32)
        m = self.lib.astar_path(_u8(self.nav), self.nx, self.nz,
                                si, sj, gi, gj, _i32(buf),
                                self.nx * self.nz)
        if m <= 0:
            return None
        return buf[:m].copy()

    @staticmethod
    def frontiers(known: np.ndarray, navigable: np.ndarray) -> np.ndarray:
        lib = _load()
        known = np.ascontiguousarray(known.astype(np.uint8))
        navigable = np.ascontiguousarray(navigable.astype(np.uint8))
        nx, nz = known.shape
        out = np.empty((nx, nz), np.uint8)
        lib.find_frontiers(_u8(known), _u8(navigable), nx, nz, _u8(out))
        return out.astype(bool)

    @staticmethod
    def label(mask: np.ndarray, connectivity: int = 4
              ) -> Tuple[np.ndarray, int]:
        lib = _load()
        mask = np.ascontiguousarray(mask.astype(np.uint8))
        nx, nz = mask.shape
        labels = np.empty((nx, nz), np.int32)
        n = lib.label_components(_u8(mask), nx, nz, connectivity,
                                 _i32(labels))
        return labels, n


class FrameQueue:
    """Native frame-staging ring buffer (producer/consumer batching)."""

    def __init__(self, capacity: int, h: int, w: int):
        self.lib = _load()
        if self.lib is None:
            raise RuntimeError("native runtime unavailable")
        self._q = self.lib.fq_create(capacity, h, w)
        self.capacity, self.h, self.w = capacity, h, w

    def __del__(self):
        if getattr(self, "_q", None) and self.lib is not None:
            self.lib.fq_destroy(self._q)
            self._q = None

    def __len__(self) -> int:
        return self.lib.fq_size(self._q)

    def push(self, rgb: np.ndarray, depth: np.ndarray,
             pose: np.ndarray) -> bool:
        rgb = np.ascontiguousarray(rgb[:, :, :3], np.uint8)
        depth = np.ascontiguousarray(depth, np.float32)
        pose = np.ascontiguousarray(pose, np.float32)
        return bool(self.lib.fq_push(self._q, _u8(rgb), _f32(depth),
                                     _f32(pose)))

    def pop_batch(self, n: int
                  ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
        rgb = np.empty((n, self.h, self.w, 3), np.uint8)
        depth = np.empty((n, self.h, self.w), np.float32)
        poses = np.empty((n, 7), np.float32)
        m = self.lib.fq_pop_batch(self._q, n, _u8(rgb), _f32(depth),
                                  _f32(poses))
        return rgb, depth, poses, m
