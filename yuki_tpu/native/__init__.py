"""Native (C++) components, bound via ctypes.

The reference's perf-critical host tiers are native Rust; ours are C++
compiled on demand with the system toolchain (no pybind11 in the image —
plain C ABI + ctypes).  Components:

  bvh_builder.cpp — SAH/middle/equal-counts BVH build (bvh.rs:305-522
                    algorithm); ~30x the numpy builder on one host core.

Set YUKI_TPU_NO_NATIVE=1 to force the pure-python fallbacks.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

log = logging.getLogger("yuki")

_DIR = Path(__file__).parent
_LIB_PATH = _DIR / "libyuki_native.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _compile() -> bool:
    src = _DIR / "bvh_builder.cpp"
    try:
        subprocess.run(
            [
                "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                "-o", str(_LIB_PATH), str(src),
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception as e:  # missing toolchain -> python fallback
        log.warning("native build failed (%s); using python fallbacks", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Loads (compiling if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("YUKI_TPU_NO_NATIVE"):
        return None
    src = _DIR / "bvh_builder.cpp"
    if not _LIB_PATH.exists() or (
        src.exists() and src.stat().st_mtime > _LIB_PATH.stat().st_mtime
    ):
        if not _compile():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError as e:
        log.warning("native load failed (%s)", e)
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.build_bvh.restype = ctypes.c_int
    lib.build_bvh.argtypes = [
        f32p, f32p, ctypes.c_int64,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32p, f32p, i32p, i32p, i32p, i32p, i32p, i32p, i32p, i64p,
    ]
    lib.thread_links.restype = ctypes.c_int
    lib.thread_links.argtypes = [i32p, i32p, i32p, i32p, ctypes.c_int64, i32p]
    _lib = lib
    return _lib


_SPLIT_IDS = {"sah": 0, "middle": 1, "equal_counts": 2}


def native_build_bvh(
    lo: np.ndarray,
    hi: np.ndarray,
    split_method: str,
    max_shapes_in_node: int,
    max_leaf_size: int,
):
    """Returns the BvhHost field dict, or None when native is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = lo.shape[0]
    lo = np.ascontiguousarray(lo, dtype=np.float32)
    hi = np.ascontiguousarray(hi, dtype=np.float32)
    cap = 2 * n
    node_lo = np.empty((cap, 3), np.float32)
    node_hi = np.empty((cap, 3), np.float32)
    prim_offset = np.empty(cap, np.int32)
    prim_count = np.empty(cap, np.int32)
    child0 = np.empty(cap, np.int32)
    child1 = np.empty(cap, np.int32)
    axis = np.empty(cap, np.int32)
    depth = np.empty(cap, np.int32)
    prim_order = np.empty(n, np.int32)
    n_nodes = ctypes.c_int64(0)

    def p(a, t=ctypes.c_float):
        return a.ctypes.data_as(ctypes.POINTER(t))

    rc = lib.build_bvh(
        p(lo), p(hi), n,
        _SPLIT_IDS[split_method], max_shapes_in_node, max_leaf_size,
        p(node_lo), p(node_hi),
        p(prim_offset, ctypes.c_int32), p(prim_count, ctypes.c_int32),
        p(child0, ctypes.c_int32), p(child1, ctypes.c_int32),
        p(axis, ctypes.c_int32), p(depth, ctypes.c_int32),
        p(prim_order, ctypes.c_int32),
        ctypes.byref(n_nodes),
    )
    if rc != 0:
        log.warning("native build_bvh returned %d; python fallback", rc)
        return None
    m = n_nodes.value
    links = np.empty((8, m, 2), np.int32)
    lib.thread_links(
        p(child0, ctypes.c_int32), p(child1, ctypes.c_int32),
        p(axis, ctypes.c_int32), p(prim_count, ctypes.c_int32),
        m, p(links, ctypes.c_int32),
    )
    return dict(
        links=links,
        node_lo=node_lo[:m].copy(),
        node_hi=node_hi[:m].copy(),
        prim_offset=prim_offset[:m].copy(),
        prim_count=prim_count[:m].copy(),
        child0=child0[:m].copy(),
        child1=child1[:m].copy(),
        axis=axis[:m].copy(),
        depth=depth[:m].copy(),
        prim_order=prim_order.copy(),
    )
