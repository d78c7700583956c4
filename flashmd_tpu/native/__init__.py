"""Native host-side components (C++ via ctypes).

The TPU hot loop never calls into this package — on-device work is
XLA/Pallas. This is the host-runtime side: the jobs the reference
delegates to torch_cluster's C++/CUDA extension (radius searches during
model load, capacity sizing, analysis-time edge lists) run here through
a small C++ cell-list engine (radius.cpp), compiled once per machine
with the system toolchain and loaded with ctypes (pybind11 is not
available in this environment).

Every entry point has a numpy fallback, selected automatically when the
toolchain is missing or ``FLASHMD_NO_NATIVE=1``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sysconfig
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_SRC = Path(__file__).parent / "radius.cpp"
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_dir() -> Path:
    tag = sysconfig.get_platform().replace("-", "_")
    d = Path(__file__).parent / "_build"
    d.mkdir(exist_ok=True)
    return d / f"libflashmd_radius_{tag}.so"


def _load() -> Optional[ctypes.CDLL]:
    """Compile (once) and dlopen the native library; None on any failure."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("FLASHMD_NO_NATIVE", "0") == "1":
            return None
        so = _build_dir()
        try:
            if (
                not so.exists()
                or so.stat().st_mtime < _SRC.stat().st_mtime
            ):
                subprocess.run(
                    [
                        "g++", "-O3", "-march=native", "-shared", "-fPIC",
                        "-std=c++17", str(_SRC), "-o", str(so),
                    ],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            lib = ctypes.CDLL(str(so))
        except (OSError, subprocess.SubprocessError):
            return None
        i64 = ctypes.c_int64
        pd = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        pi = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.flashmd_neighbor_counts.restype = i64
        lib.flashmd_neighbor_counts.argtypes = [pd, i64, ctypes.c_double, pi]
        lib.flashmd_neighbor_counts_pbc.restype = i64
        lib.flashmd_neighbor_counts_pbc.argtypes = [
            pd, i64, ctypes.c_double, pd, pi,
        ]
        lib.flashmd_radius_pairs.restype = i64
        lib.flashmd_radius_pairs.argtypes = [
            pd, i64, ctypes.c_double, i64, pi, pi,
        ]
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return _load() is not None


def _counts_numpy(pos, rcut, cell=None) -> np.ndarray:
    dr = pos[None, :, :] - pos[:, None, :]
    if cell is not None:
        frac = dr @ np.linalg.inv(cell)
        frac -= np.round(frac)
        dr = frac @ cell
    d2 = np.einsum("ijk,ijk->ij", dr, dr)
    np.fill_diagonal(d2, np.inf)
    return (d2 < rcut * rcut).sum(axis=1)


def neighbor_counts(pos, rcut: float, cell=None) -> np.ndarray:
    """Per-atom neighbor counts at ``rcut`` (host-side, exact).

    Open boundaries use the O(A) cell list; periodic cells use
    minimum-image (triclinic supported).
    """
    pos = np.ascontiguousarray(pos, dtype=np.float64)
    lib = _load()
    if lib is None:
        return _counts_numpy(
            pos, rcut, None if cell is None else np.asarray(cell)
        )
    counts = np.zeros(pos.shape[0], dtype=np.int64)
    if cell is None:
        lib.flashmd_neighbor_counts(pos, pos.shape[0], float(rcut), counts)
    else:
        cell = np.ascontiguousarray(cell, dtype=np.float64)
        r = lib.flashmd_neighbor_counts_pbc(
            pos, pos.shape[0], float(rcut), cell, counts
        )
        if r < 0:
            raise ValueError("Singular cell matrix")
    return counts


def max_neighbor_count(pos, rcut: float, cell=None) -> int:
    """Max per-atom neighbor count — sizes the static capacity K."""
    return int(neighbor_counts(pos, rcut, cell).max(initial=0))


def radius_pairs(pos, rcut: float) -> Tuple[np.ndarray, np.ndarray]:
    """All directed pairs (src, dst) with d < rcut (open boundaries).

    Host-side analog of torch_cluster ``radius_graph`` for term-list and
    analysis use; the simulation hot loop uses the on-device padded
    matrix instead.
    """
    pos = np.ascontiguousarray(pos, dtype=np.float64)
    lib = _load()
    if lib is None:
        dr = pos[None, :, :] - pos[:, None, :]
        d2 = np.einsum("ijk,ijk->ij", dr, dr)
        np.fill_diagonal(d2, np.inf)
        i, j = np.nonzero(d2 < rcut * rcut)
        return i.astype(np.int64), j.astype(np.int64)
    cap = max(64, pos.shape[0] * 64)
    while True:
        src = np.zeros(cap, dtype=np.int64)
        dst = np.zeros(cap, dtype=np.int64)
        m = lib.flashmd_radius_pairs(
            pos, pos.shape[0], float(rcut), cap, src, dst
        )
        if m <= cap:
            return src[:m], dst[:m]
        cap = int(m)
