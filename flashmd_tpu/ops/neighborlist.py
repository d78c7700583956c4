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
while a small cell has several in range). Cells BELOW that regime are
served by explicit image replication (:func:`compute_image_shifts` +
the ``images=`` build — the counterpart of the reference's
torch_impl.py:102-163): candidate neighbors enumerate every lattice
image that can reach the search radius, indices fold back to real atoms,
and the image offsets ride the shift vectors, so downstream consumers
are unchanged. The engine switches automatically on the xla path
(simulation/base._check_min_image_soundness); paths that compute the
minimum image in-kernel (cheb) refuse loudly instead (VERDICT r4).
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


def compute_image_shifts(cell, rcut: float):
    """Integer lattice shift set for explicit image replication.

    For cells SMALLER than the minimum-image regime (rcut >= width/2),
    the full periodic physics needs every lattice image whose shifted
    copy of an atom can sit within ``rcut`` of another (wrapped) atom.
    Along reciprocal direction k a displacement's perpendicular
    component is |f_k| * width_k with wrapped fractional difference
    |f_k| < 1, so shifts up to ``floor(rcut / width_k) + 1`` suffice
    (the deliberate overshoot only adds images that fail the distance
    test). Returns an [M, 3] int numpy array with the ZERO shift first
    (callers rely on images[0] == 0 to exclude the self diagonal).

    The counterpart of the reference's ``compute_images``
    (reference: src/flashmd/neighbor_list/torch_impl.py:102-163),
    computed host-side once per (cell, rcut) — the shift set is a
    static property of the run, not a traced value.

    ``cell`` may be [3, 3] or [S, 3, 3] (the union range over the batch).
    """
    import numpy as np

    c = np.asarray(cell, dtype=np.float64)
    if c.ndim == 2:
        c = c[None]
    n = [0, 0, 0]
    for k in range(3):
        # per-axis perpendicular width: the tightest over the batch
        wk = min(
            abs(float(np.linalg.det(one)))
            / float(np.linalg.norm(np.cross(one[(k + 1) % 3],
                                            one[(k + 2) % 3])))
            for one in c
        )
        n[k] = int(np.floor(rcut / wk)) + 1
    grids = np.meshgrid(
        *(np.arange(-nk, nk + 1) for nk in n), indexing="ij"
    )
    shifts = np.stack([g.ravel() for g in grids], axis=1)
    # zero shift first
    zero = np.all(shifts == 0, axis=1)
    return np.concatenate([shifts[zero], shifts[~zero]], axis=0).astype(
        np.int64
    )


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
    images=None,
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
        schnet.py:146-150; kept for API parity). With image replication
        this excludes only the ZERO-shift self pair — an atom genuinely
        interacts with its own periodic images in a sub-rcut cell.
    exclude_pairs: optional [2, P] index pairs to exclude (equivalent of the
        reference's ``exc_pair_index``, schnet.py:221-242). Under image
        replication the exclusion removes EVERY image of the pair.
    images: optional [M, 3] integer lattice shifts (STATIC — from
        :func:`compute_image_shifts`, zero shift first) switching the
        build to explicit image replication: the full periodic physics
        for cells SMALLER than the minimum-image regime (the regime the
        reference serves via torch_impl.py:102-163). Neighbor indices
        fold back to real atoms; the image offset rides ``shifts``, so
        downstream consumers are unchanged.

    Batch over molecules with ``jax.vmap``.
    """
    n_atoms = pos.shape[0]
    if images is not None:
        if cell is None:
            raise ValueError("image replication requires a cell")
        return _radius_neighbor_matrix_images(
            pos, rcut, capacity, cell, images, self_interaction,
            exclude_pairs,
        )
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


def _radius_neighbor_matrix_images(
    pos, rcut, capacity, cell, images, self_interaction, exclude_pairs
):
    """Image-replication neighbor build (sub-minimum-image cells).

    Candidate columns are (image m, atom j) pairs over wrapped
    positions; selected neighbors fold back to the real atom index with
    the image offset carried by the shift vector, computed so that
    ``pos[j] + shift - pos[i]`` reproduces the periodic displacement for
    the RAW (unwrapped) positions the model sees.
    """
    n_atoms = pos.shape[0]
    hp = jax.lax.Precision.HIGHEST
    cellj = jnp.asarray(cell, pos.dtype)
    posw = wrap_positions(pos, cellj)
    import numpy as np

    images_np = np.asarray(images)
    if images_np.ndim != 2 or images_np.shape[1] != 3:
        raise ValueError(f"images must be [M, 3], got {images_np.shape}")
    if np.any(images_np[0] != 0):
        raise ValueError(
            "images[0] must be the zero shift (compute_image_shifts "
            "puts it first; the self-pair exclusion relies on it)"
        )
    imgs = jnp.asarray(images_np, pos.dtype)  # [M, 3] integer shifts
    m_img = imgs.shape[0]
    sv = jnp.matmul(imgs, cellj, precision=hp)  # [M, 3]
    ghost = (posw[None, :, :] + sv[:, None, :]).reshape(-1, 3)  # [M*A, 3]
    dr = ghost[None, :, :] - posw[:, None, :]  # [A, M*A, 3]
    d2 = jnp.sum(dr * dr, axis=-1)  # [A, M*A]

    valid = d2 < (rcut * rcut)
    if not self_interaction:
        # zero-shift self pairs only (images[0] == 0): an atom IS a
        # neighbor of its own non-zero images in a sub-rcut cell.
        eye = jnp.eye(n_atoms, dtype=bool)
        valid = valid & ~jnp.concatenate(
            [eye, jnp.zeros((n_atoms, (m_img - 1) * n_atoms), bool)],
            axis=1,
        )
    if exclude_pairs is not None:
        excl = jnp.zeros((n_atoms, n_atoms), dtype=bool)
        excl = excl.at[exclude_pairs[0], exclude_pairs[1]].set(True)
        excl = excl.at[exclude_pairs[1], exclude_pairs[0]].set(True)
        valid = valid & ~jnp.tile(excl, (1, m_img))

    k_eff = min(capacity, m_img * n_atoms)
    key = jnp.where(valid, d2, jnp.inf)
    _, order = jax.lax.top_k(-key, k_eff)  # [A, k_eff] column indices
    mask = jnp.take_along_axis(valid, order, axis=1)
    row = jnp.arange(n_atoms, dtype=jnp.int32)[:, None]
    j_real = (order % n_atoms).astype(jnp.int32)
    idx = jnp.where(mask, j_real, row)

    # shift s.t. pos[j] + shift - pos[i] == the periodic displacement,
    # exact for raw (unwrapped) coordinates: dr is built from wrapped
    # ghosts, so fold the wrap offsets into the shift.
    pos_cols = pos[j_real]  # [A, k_eff, 3]
    dr_sel = jnp.take_along_axis(dr, order[..., None], axis=1)
    shifts = dr_sel - (pos_cols - pos[:, None, :])
    shifts = jnp.where(mask[:, :, None], shifts, 0.0)

    if k_eff < capacity:
        pad = capacity - k_eff
        idx = jnp.concatenate(
            [idx, jnp.broadcast_to(row, (n_atoms, pad))], axis=1
        )
        mask = jnp.concatenate(
            [mask, jnp.zeros((n_atoms, pad), dtype=bool)], axis=1
        )
        shifts = jnp.concatenate(
            [shifts, jnp.zeros((n_atoms, pad, 3), shifts.dtype)], axis=1
        )
    n_max = jnp.max(jnp.sum(valid, axis=1)).astype(jnp.int32)
    return NeighborMatrix(idx=idx, mask=mask, n_max=n_max, shifts=shifts)


def batched_radius_neighbor_matrix(
    pos: jnp.ndarray,
    rcut: float,
    capacity: int,
    cell: Optional[jnp.ndarray] = None,
    self_interaction: bool = False,
    exclude_pairs: Optional[jnp.ndarray] = None,
    images=None,
) -> NeighborMatrix:
    """vmap of :func:`radius_neighbor_matrix` over a [S, A, 3] batch.

    ``cell`` may be a shared [3, 3] lattice or a per-simulation [S, 3, 3]
    batch. ``images`` (static [M, 3] integer shifts) selects the
    image-replication build for sub-minimum-image cells — one shared
    shift set for the whole batch (compute_image_shifts takes the union
    range over [S, 3, 3] cells).
    """
    # Inside the vmap the cell is a tracer, so validate here while it is
    # still concrete (first trace of a jitted rollout).
    if images is None:
        validate_min_image(
            cell, rcut, context="batched_radius_neighbor_matrix"
        )
    fn = lambda p, c: radius_neighbor_matrix(
        p,
        rcut,
        capacity,
        cell=c,
        self_interaction=self_interaction,
        exclude_pairs=exclude_pairs,
        images=images,
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
