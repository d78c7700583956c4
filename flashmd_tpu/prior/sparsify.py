"""Sparse <-> dense conversions for prior parameter storage.

TPU-native counterpart of the reference's prior sparsify utilities
(reference: src/flashmd/models/utils.py:6-35 ``to_sparse``/``to_dense``,
which compress Harmonic/Dihedral type-indexed buffer tensors for
checkpoint size).

Our priors are term-list based, i.e. "sparse by construction" — the only
dense buffers in this framework are (a) the optional dense-pair repulsion
matrix produced by :func:`flashmd_tpu.prior.priors.densify_repulsion`
(an [A, A] sigma^6 table the hot loop multiplies without gathers) and
(b) dense type-keyed statistics tables ``table[type_i, type_j, ...]``
used while building priors. Both get sparse round-trip helpers here so
checkpoints never have to store O(A^2) or O(T^order) zeros.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from .priors import Prior


def sparsify_repulsion(prior: Prior) -> Prior:
    """Inverse of :func:`densify_repulsion`: dense-pair -> term list.

    Recovers the (i, j) interaction terms and their sigma parameters from
    the [A, A] sigma^6 matrix. Entries are one-directional (the dense form
    stores each term once), so the recovered term list matches the one
    ``densify_repulsion`` consumed up to term order.
    """
    if prior.kind != "repulsion_dense":
        raise ValueError("sparsify_repulsion expects a repulsion_dense prior")
    mat = np.asarray(prior.params["sigma6"], dtype=np.float64)
    i, j = np.nonzero(mat)
    sigma = mat[i, j] ** (1.0 / 6.0)
    return Prior(
        index_mapping=jnp.asarray(np.stack([i, j]), jnp.int32),
        params={"sigma": jnp.asarray(sigma, jnp.float32)},
        kind="repulsion",
        name=prior.name,
        feature="distance",
    )


def table_to_sparse(table, order: int = None) -> Tuple[np.ndarray, np.ndarray]:
    """Dense type-keyed table -> (indices [order, n], values [n, ...]).

    ``table`` has ``order`` leading type axes (e.g. ``k[type_i, type_j]``
    for bonds; defaults to every axis, i.e. scalar payload) and any
    trailing parameter axes. Type combinations whose payload is entirely
    zero (absent interactions) are dropped. The reference's ``to_sparse``
    does the same with torch sparse tensors (models/utils.py:6-19).
    """
    arr = np.asarray(table)
    if order is None:
        order = arr.ndim
    payload_axes = tuple(range(order, arr.ndim))
    present = np.abs(arr).sum(axis=payload_axes) if payload_axes else arr
    nz = np.nonzero(present)
    idx = np.stack(nz).astype(np.int64)
    return idx, arr[nz]


def sparse_to_table(idx, values, shape) -> np.ndarray:
    """(indices, values) -> dense table of ``shape`` (zeros elsewhere).

    Mirror of the reference's ``to_dense`` (models/utils.py:22-35).
    """
    idx = np.asarray(idx)
    values = np.asarray(values)
    out = np.zeros(shape, dtype=values.dtype)
    out[tuple(idx)] = values
    return out
