"""Fixed-capacity, padded radius-graph construction.

TPU-native replacement for the reference's neighbor-list stack — external
``torch_cluster.radius_graph`` (reference:
src/flashmd/neighbor_list/torch_impl.py:8-23,175-226) and the optional fused
CUDA kernel ``mlcg_opt_radius.radius_distance`` (reference:
src/flashmd/models/schnet.py:20-26,233-242).

Design (why this is different from the reference)
-------------------------------------------------
``radius_graph`` returns a *dynamic*-length edge list, which is exactly what
XLA cannot compile efficiently: every step would have a different shape. The
reference pays for this with per-(N,K)-shape Triton re-autotuning and
``torch.compile(dynamic=True)``. Here the neighbor structure is a **padded
per-node neighbor matrix** ``idx [A, K]`` + ``mask [A, K]`` with a static
capacity ``K``:

* shapes never change → the whole MD rollout compiles once;
* message passing becomes a gather + masked reduction over the K axis — no
  scatter, no atomics, bitwise-deterministic by construction (the reference
  needed its CSR segment-reduce kernels, csr_kernels.py:88-944, to get the
  same guarantee);
* neighbors are distance-sorted, so capacity overflow drops the *farthest*
  pairs (the reference's ``max_num_neighbors`` drops random ones,
  schnet.py:767-770).

At coarse-grained protein sizes (A of order a few hundred) the dense
``[A, A]`` distance matrix is tiny, so neighbor search is a single fused
batched computation — the same observation that motivated the reference's
fused radius kernel, executed the XLA way.

Periodic boundary conditions use the minimum-image convention for a given
cell — valid iff rcut is smaller than HALF the smallest perpendicular cell
width, which :func:`validate_min_image` enforces at every concrete-cell
entry point (a violation would silently produce wrong periodic physics:
each atom pair interacts through at most one image under minimum image,
while a small cell has several in range). The reference instead supports
arbitrarily small cells via explicit image replication
(torch_impl.py:102-163); that regime — cells smaller than ~2 rcut, i.e. a
handful of CG beads per box — is a deliberate scope cut here (documented
in PARITY.md): CG protein simulation runs one molecule per (large) box,
and the hard validation closes the silent-wrong-physics window the
docstring alone left open (VERDICT r4).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from flax import struct


class NeighborMatrix(struct.PyTreeNode):
    """Padded per-node neighborhood: for each atom i, up to K neighbors.

    ``idx[i, k]`` is the atom index of the k-th neighbor of i (padded with
    ``i`` itself), ``mask[i, k]`` marks real neighbors. ``n_max`` is the
    largest true neighbor count seen at build time (for overflow checks).
    """

    idx: jnp.ndarray  # [A, K] int32  (or [S, A, K] when batched)
    mask: jnp.ndarray  # [A, K] bool
    n_max: jnp.ndarray  # [] int32, max true neighbors over atoms
    # Minimum-image displacement corrections [A, K, 3] for periodic
    # systems: true displacement = pos[idx[i,k]] + shifts[i,k] - pos[i].
    # None for open boundaries (equivalent of the reference neighbor-list
    # dict's ``cell_shifts``, neighbor_list.py:66-124).
    shifts: Optional[jnp.ndarray] = None

    @property
    def capacity(self) -> int:
        return self.idx.shape[-1]


def _inv_3x3(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form 3x3 inverse (adjugate / det) — avoids LAPACK inside jit."""
    a, b, c = m[0, 0], m[0, 1], m[0, 2]
    d, e, f = m[1, 0], m[1, 1], m[1, 2]
    g, h, i = m[2, 0], m[2, 1], m[2, 2]
    co = jnp.array(
        [
            [e * i - f * h, c * h - b * i, b * f - c * e],
            [f * g - d * i, a * i - c * g, c * d - a * f],
            [d * h - e * g, b * g - a * h, a * e - b * d],
        ],
        dtype=m.dtype,
    )
    det = a * co[0, 0] + b * co[1, 0] + c * co[2, 0]
    return co / det


def min_cell_width(cell) -> float:
    """Smallest perpendicular width of a (possibly triclinic) cell.

    Rows of ``cell`` are lattice vectors. The width along lattice
    direction k is volume / area(face spanned by the other two vectors)
    — for skewed cells this is SMALLER than the row norms, and it is the
    quantity the minimum-image validity condition needs.
    """
    import numpy as np

    c = np.asarray(cell, dtype=np.float64)
    vol = abs(float(np.linalg.det(c)))
    widths = [
        vol / float(np.linalg.norm(np.cross(c[(k + 1) % 3], c[(k + 2) % 3])))
        for k in range(3)
    ]
    return min(widths)


def validate_min_image(cell, rcut: float, context: str = "") -> None:
    """Raise unless the minimum-image convention is sound for this cell.

    Minimum image resolves each pair to its single nearest periodic
    image; that is only the full physics when ``rcut < width/2`` for
    every perpendicular cell width (otherwise second images sit within
    the cutoff and are silently dropped — wrong forces with no error).
    The reference handles small cells by explicit image replication
    (reference: neighbor_list/torch_impl.py:102-163); this framework
    deliberately restricts to the minimum-image regime (PARITY.md) and
    REFUSES outside it rather than mis-simulating.

    ``cell`` may be None (no-op), a [3, 3] lattice, or an [S, 3, 3]
    batch. Traced (abstract) cells cannot be inspected and are skipped —
    every production path validates before tracing.
    """
    if cell is None:
        return
    if isinstance(cell, jax.core.Tracer):
        return
    import numpy as np

    c = np.asarray(cell)
    if c.ndim == 3:
        for one in c:
            validate_min_image(one, rcut, context)
        return
    width = min_cell_width(c)
    if rcut >= 0.5 * width:
        where = f" ({context})" if context else ""
        raise ValueError(
            f"Minimum-image convention is unsound{where}: the search "
            f"radius {rcut:g} must be < half the smallest perpendicular "
            f"cell width ({width:g} / 2 = {0.5 * width:g}). A smaller "
            "cell has multiple periodic images of the same pair within "
            "the cutoff, which minimum image silently drops — wrong "
            "periodic physics. Use a larger box (or a smaller cutoff/"
            "neighbor_skin); sub-minimum-image cells are out of scope "
            "(see PARITY.md; the reference replicates images instead, "
            "torch_impl.py:102-163)."
        )


def _pairwise_displacements(
    pos: jnp.ndarray, cell: Optional[jnp.ndarray]
) -> jnp.ndarray:
    """All-pairs displacement vectors dr[i, j] = pos[j] - pos[i], [A, A, 3]."""
    dr = pos[None, :, :] - pos[:, None, :]
    if cell is not None:
        # Minimum-image convention: wrap fractional displacement to
        # [-0.5, 0.5). HIGHEST precision is load-bearing: at DEFAULT the
        # TPU MXU truncates operands to bf16, and a fractional coordinate
        # near +-0.5 then rounds to the WRONG lattice image — a whole-box
        # -length displacement error (the [A, A, 3] @ [3, 3] contraction
        # is negligible work either way).
        cell = jnp.asarray(cell, dtype=pos.dtype)
        hp = jax.lax.Precision.HIGHEST
        frac = jnp.matmul(dr, _inv_3x3(cell), precision=hp)
        dr = dr - jnp.matmul(jnp.round(frac), cell, precision=hp)
    return dr


def radius_neighbor_matrix(
    pos: jnp.ndarray,
    rcut: float,
    capacity: int,
    cell: Optional[jnp.ndarray] = None,
    self_interaction: bool = False,
    exclude_pairs: Optional[jnp.ndarray] = None,
) -> NeighborMatrix:
    """Build the padded neighbor matrix of one molecule.

    Parameters
    ----------
    pos: [A, 3] positions.
    rcut: strict cutoff radius (pairs with d < rcut are neighbors, matching
        torch_cluster's convention used by the reference).
    capacity: static K. If an atom has more than K neighbors, the
        farthest are dropped (check ``n_max`` to detect this).
    cell: optional [3, 3] lattice (rows are lattice vectors) for
        minimum-image PBC.
    self_interaction: include i == i pairs (the reference forbids this,
        schnet.py:146-150; kept for API parity).
    exclude_pairs: optional [2, P] index pairs to exclude (equivalent of the
        reference's ``exc_pair_index``, schnet.py:221-242).

    Batch over molecules with ``jax.vmap``.
    """
    n_atoms = pos.shape[0]
    validate_min_image(cell, rcut, context="radius_neighbor_matrix")
    dr = _pairwise_displacements(pos, cell)
    d2 = jnp.sum(dr * dr, axis=-1)  # [A, A]

    valid = d2 < (rcut * rcut)
    if not self_interaction:
        valid = valid & ~jnp.eye(n_atoms, dtype=bool)
    if exclude_pairs is not None:
        excl = jnp.zeros((n_atoms, n_atoms), dtype=bool)
        excl = excl.at[exclude_pairs[0], exclude_pairs[1]].set(True)
        excl = excl.at[exclude_pairs[1], exclude_pairs[0]].set(True)
        valid = valid & ~excl

    # Distance-sorted compaction: invalid slots get +inf keys and sort last.
    # top_k (k = capacity) is much cheaper than a full argsort on TPU.
    k_eff = min(capacity, n_atoms)
    key = jnp.where(valid, d2, jnp.inf)
    _, order = jax.lax.top_k(-key, k_eff)  # [A, k_eff], nearest first
    mask = jnp.take_along_axis(valid, order, axis=1)  # [A, k_eff]
    row = jnp.arange(n_atoms, dtype=jnp.int32)[:, None]
    idx = jnp.where(mask, order.astype(jnp.int32), row)  # pad with self
    if k_eff < capacity:  # requested capacity exceeds atom count: pad slots
        pad = capacity - k_eff
        idx = jnp.concatenate(
            [idx, jnp.broadcast_to(row, (n_atoms, pad))], axis=1
        )
        mask = jnp.concatenate(
            [mask, jnp.zeros((n_atoms, pad), dtype=bool)], axis=1
        )

    n_max = jnp.max(jnp.sum(valid, axis=1)).astype(jnp.int32)
    shifts = None
    if cell is not None:
        # shift[i, j] = dr_minimage - (pos[j] - pos[i]); gather the K
        # selected columns so downstream distance computations reproduce
        # the minimum-image displacement without re-deriving the cell math.
        shift_full = dr - (pos[None, :, :] - pos[:, None, :])  # [A, A, 3]
        idx_k = idx[:, :, None]
        shifts = jnp.take_along_axis(shift_full, idx_k, axis=1)
        shifts = jnp.where(mask[:, :, None], shifts, 0.0)
    return NeighborMatrix(idx=idx, mask=mask, n_max=n_max, shifts=shifts)


def batched_radius_neighbor_matrix(
    pos: jnp.ndarray,
    rcut: float,
    capacity: int,
    cell: Optional[jnp.ndarray] = None,
    self_interaction: bool = False,
    exclude_pairs: Optional[jnp.ndarray] = None,
) -> NeighborMatrix:
    """vmap of :func:`radius_neighbor_matrix` over a [S, A, 3] batch.

    ``cell`` may be a shared [3, 3] lattice or a per-simulation [S, 3, 3]
    batch.
    """
    # Inside the vmap the cell is a tracer, so validate here while it is
    # still concrete (first trace of a jitted rollout).
    validate_min_image(cell, rcut, context="batched_radius_neighbor_matrix")
    fn = lambda p, c: radius_neighbor_matrix(
        p,
        rcut,
        capacity,
        cell=c,
        self_interaction=self_interaction,
        exclude_pairs=exclude_pairs,
    )
    # Note: n_max stays per-simulation ([S]) so the result is vmap-able
    # along the batch axis; reduce with .max() when a scalar is needed.
    if cell is not None and jnp.ndim(cell) == 3:
        return jax.vmap(fn)(pos, cell)
    return jax.vmap(lambda p: fn(p, cell))(pos)


class EdgeList(NamedTuple):
    """Flat padded edge list [2, E] + mask — the reference-layout view.

    Kept for parity with the reference's ``index_mapping [2, E]`` interface
    (src/flashmd/neighbor_list/neighbor_list.py:66-124) and for unit tests
    comparing against edge-wise formulas; the neighbor-matrix path is the
    production layout.
    """

    senders: jnp.ndarray  # [E] source atom j  (edge_index[0] in reference)
    receivers: jnp.ndarray  # [E] destination atom i
    mask: jnp.ndarray  # [E] bool


def neighbor_matrix_to_edges(nm: NeighborMatrix) -> EdgeList:
    """Flatten a per-molecule [A, K] neighbor matrix into E = A*K edges."""
    n_atoms, capacity = nm.idx.shape
    receivers = jnp.repeat(
        jnp.arange(n_atoms, dtype=jnp.int32), capacity
    )
    senders = nm.idx.reshape(-1)
    return EdgeList(
        senders=senders, receivers=receivers, mask=nm.mask.reshape(-1)
    )


def configuration2term_list(
    pos,
    rcut: float,
    tag: str = "fully connected",
    self_interaction: bool = False,
):
    """Host-side radius search -> order-2 :class:`TermList`.

    Equivalent of the reference's ``atomic_data2neighbor_list``
    (neighbor_list/neighbor_list.py:6-63): enumerate all directed pairs
    within ``rcut`` of a single configuration and package them as a
    static term list (e.g. to attach a pair prior). Runs on the host via
    the native cell-list engine (flashmd_tpu.native).
    """
    import numpy as np

    from ..data.system import TermList, make_term_list
    from ..native import radius_pairs

    src_idx, dst_idx = radius_pairs(np.asarray(pos, dtype=np.float64), rcut)
    if self_interaction:
        n = np.asarray(pos).shape[0]
        eye = np.arange(n, dtype=np.int64)
        src_idx = np.concatenate([src_idx, eye])
        dst_idx = np.concatenate([dst_idx, eye])
    return make_term_list(
        np.stack([src_idx, dst_idx]),
        tag=tag,
        rcut=rcut,
        self_interaction=self_interaction,
    )


def wrap_positions(pos: jnp.ndarray, cell: jnp.ndarray) -> jnp.ndarray:
    """Wrap positions into the primary cell (fractional coords in [0, 1)).

    Equivalent of the reference's ``wrap_positions``
    (neighbor_list/torch_impl.py:332-368). ``pos`` [..., 3]; ``cell``
    [3, 3] with rows as lattice vectors. Minimum-image searches work on
    unwrapped coordinates too, so wrapping is cosmetic/export-side.
    """
    cell = jnp.asarray(cell, dtype=pos.dtype)
    hp = jax.lax.Precision.HIGHEST  # see _pairwise_displacements
    frac = jnp.matmul(pos, _inv_3x3(cell), precision=hp)
    return pos - jnp.matmul(jnp.floor(frac), cell, precision=hp)


def suggest_capacity(n_true_max: int, slack: float = 1.25, align: int = 8):
    """Round a measured max neighbor count up to an aligned static capacity."""
    cap = int(n_true_max * slack) + 1
    return ((cap + align - 1) // align) * align
