"""Padded neighbor matrix vs brute-force O(A^2) search."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashmd_tpu.ops.neighborlist import (
    batched_radius_neighbor_matrix,
    neighbor_matrix_to_edges,
    radius_neighbor_matrix,
    suggest_capacity,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def brute_force_pairs(pos, rcut):
    pairs = set()
    n = len(pos)
    for i in range(n):
        for j in range(n):
            if i != j and np.linalg.norm(pos[j] - pos[i]) < rcut:
                pairs.add((i, j))
    return pairs


def nm_pairs(nm):
    idx = np.asarray(nm.idx)
    mask = np.asarray(nm.mask)
    pairs = set()
    for i in range(idx.shape[0]):
        for k in range(idx.shape[1]):
            if mask[i, k]:
                pairs.add((i, int(idx[i, k])))
    return pairs


def test_exact_neighbors_with_enough_capacity(rng):
    pos = rng.uniform(0, 5, size=(30, 3))
    rcut = 2.0
    nm = radius_neighbor_matrix(jnp.asarray(pos), rcut, capacity=30)
    assert nm_pairs(nm) == brute_force_pairs(pos, rcut)
    want_max = max(
        (sum(1 for p in brute_force_pairs(pos, rcut) if p[0] == i))
        for i in range(30)
    )
    assert int(nm.n_max) == want_max


def test_truncation_keeps_nearest(rng):
    pos = rng.uniform(0, 3, size=(20, 3))
    rcut = 3.0
    cap = 4
    nm = radius_neighbor_matrix(jnp.asarray(pos), rcut, capacity=cap)
    idx = np.asarray(nm.idx)
    mask = np.asarray(nm.mask)
    for i in range(20):
        d = np.linalg.norm(pos - pos[i], axis=-1)
        d[i] = np.inf
        true_nbrs = np.where(d < rcut)[0]
        kept = set(idx[i][mask[i]])
        # kept must be the `cap` nearest true neighbors
        nearest = set(true_nbrs[np.argsort(d[true_nbrs])][:cap])
        assert kept == nearest


def test_padding_is_self_index(rng):
    pos = rng.uniform(0, 50, size=(10, 3))  # sparse: few neighbors
    nm = radius_neighbor_matrix(jnp.asarray(pos), 1.0, capacity=8)
    idx = np.asarray(nm.idx)
    mask = np.asarray(nm.mask)
    rows = np.arange(10)[:, None]
    assert np.all(idx[~mask] == np.broadcast_to(rows, idx.shape)[~mask])


def test_exclude_pairs(rng):
    pos = rng.uniform(0, 2, size=(8, 3))
    excl = jnp.asarray(np.array([[0, 1], [1, 2]]))
    nm = radius_neighbor_matrix(
        jnp.asarray(pos), 5.0, capacity=8, exclude_pairs=excl
    )
    pairs = nm_pairs(nm)
    for a, b in [(0, 1), (1, 0), (1, 2), (2, 1)]:
        assert (a, b) not in pairs


def test_pbc_minimum_image():
    cell = jnp.eye(3) * 4.0
    pos = jnp.asarray([[0.1, 0.0, 0.0], [3.9, 0.0, 0.0]])
    nm = radius_neighbor_matrix(pos, rcut=0.5, capacity=2, cell=cell)
    assert nm_pairs(nm) == {(0, 1), (1, 0)}
    nm_free = radius_neighbor_matrix(pos, rcut=0.5, capacity=2)
    assert nm_pairs(nm_free) == set()


def test_batched_matches_single(rng):
    pos = rng.uniform(0, 4, size=(3, 15, 3))
    nm_b = batched_radius_neighbor_matrix(jnp.asarray(pos), 2.0, capacity=16)
    for s in range(3):
        nm_s = radius_neighbor_matrix(jnp.asarray(pos[s]), 2.0, capacity=16)
        np.testing.assert_array_equal(np.asarray(nm_b.idx[s]), nm_s.idx)
        np.testing.assert_array_equal(np.asarray(nm_b.mask[s]), nm_s.mask)


def test_edges_roundtrip(rng):
    pos = rng.uniform(0, 4, size=(12, 3))
    nm = radius_neighbor_matrix(jnp.asarray(pos), 2.0, capacity=12)
    edges = neighbor_matrix_to_edges(nm)
    got = {
        (int(r), int(s))
        for r, s, m in zip(edges.receivers, edges.senders, edges.mask)
        if m
    }
    assert got == brute_force_pairs(pos, 2.0)


def test_jit_static_shapes(rng):
    pos = jnp.asarray(rng.uniform(0, 4, size=(10, 3)))
    fn = jax.jit(
        lambda p: radius_neighbor_matrix(p, 2.0, capacity=8),
        static_argnames=(),
    )
    nm = fn(pos)
    assert nm.idx.shape == (10, 8)


def test_suggest_capacity():
    assert suggest_capacity(10) % 8 == 0
    assert suggest_capacity(10) >= 13


def test_wrap_positions():
    from flashmd_tpu.ops.neighborlist import wrap_positions

    cell = jnp.asarray(np.diag([4.0, 5.0, 6.0]), jnp.float32)
    pos = jnp.asarray([[4.5, -1.0, 13.0], [1.0, 2.0, 3.0]], jnp.float32)
    w = np.asarray(wrap_positions(pos, cell))
    np.testing.assert_allclose(
        w, [[0.5, 4.0, 1.0], [1.0, 2.0, 3.0]], atol=1e-5
    )
    # triclinic: wrapped fractional coordinates must land in [0, 1)
    cell_t = jnp.asarray(
        [[4.0, 0, 0], [1.0, 5.0, 0], [0.5, 0.3, 6.0]], jnp.float32
    )
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.uniform(-20, 20, (50, 3)), jnp.float32)
    w = np.asarray(wrap_positions(p, cell_t))
    frac = w @ np.linalg.inv(np.asarray(cell_t))
    assert frac.min() >= -1e-5 and frac.max() < 1.0 + 1e-5


def test_configuration2term_list():
    from flashmd_tpu.ops.neighborlist import configuration2term_list

    rng = np.random.default_rng(3)
    pos = rng.uniform(0, 6, (30, 3))
    tl = configuration2term_list(pos, rcut=2.0)
    assert tl.order == 2 and tl.rcut == 2.0
    idx = np.asarray(tl.index_mapping)
    d = np.linalg.norm(pos[idx[1]] - pos[idx[0]], axis=-1)
    assert np.all(d < 2.0)
    # count matches brute force
    dr = pos[None] - pos[:, None]
    d2 = np.einsum("ijk,ijk->ij", dr, dr)
    np.fill_diagonal(d2, np.inf)
    assert idx.shape[1] == int((d2 < 4.0).sum())


# ---------------------------------------------------------------------------
# Minimum-image soundness validation (VERDICT r4 #3). The reference supports
# sub-minimum-image cells via explicit image replication
# (reference: neighbor_list/torch_impl.py:102-163); this framework restricts
# to the minimum-image regime and must REFUSE outside it instead of silently
# dropping in-range periodic images.
# ---------------------------------------------------------------------------


def test_min_image_validation_raises_for_small_box():
    from flashmd_tpu.ops.neighborlist import validate_min_image

    cell = np.eye(3) * 5.0
    validate_min_image(cell, 2.0)  # 2.0 < 2.5: sound
    with pytest.raises(ValueError, match="[Mm]inimum-image"):
        validate_min_image(cell, 2.5)  # boundary counts as unsound
    with pytest.raises(ValueError, match="half the smallest"):
        validate_min_image(cell, 4.0)


def test_min_image_validation_uses_perpendicular_width():
    """A sheared cell's row norms can all be large while the perpendicular
    width is small — the validity condition is on the WIDTH."""
    from flashmd_tpu.ops.neighborlist import (
        min_cell_width,
        validate_min_image,
    )

    # Rows of norm 10, 10.04.., 10 but the second row leans at ~87 deg
    # off the first: perpendicular width along b is ~1.0.
    cell = np.array(
        [[10.0, 0.0, 0.0], [9.99, 1.0, 0.0], [0.0, 0.0, 10.0]]
    )
    assert min_cell_width(cell) < 1.01
    assert all(np.linalg.norm(cell[k]) >= 10.0 for k in range(3))
    with pytest.raises(ValueError, match="perpendicular"):
        validate_min_image(cell, 2.0)


def test_min_image_validation_batched_cells():
    from flashmd_tpu.ops.neighborlist import validate_min_image

    good = np.eye(3) * 20.0
    bad = np.eye(3) * 3.0
    validate_min_image(np.stack([good, good]), 2.0)
    with pytest.raises(ValueError):
        validate_min_image(np.stack([good, bad]), 2.0)


def test_radius_neighbor_matrix_refuses_unsound_cell(rng):
    pos = jnp.asarray(rng.uniform(0, 3, size=(8, 3)))
    with pytest.raises(ValueError, match="minimum-image|Minimum-image"):
        radius_neighbor_matrix(pos, rcut=2.0, capacity=4, cell=jnp.eye(3) * 3.0)


def test_min_image_validation_skips_tracers():
    """Inside jit the cell is abstract and cannot be inspected; the
    concrete-entry checks (attach time / direct API) are the gate."""
    pos = jnp.zeros((4, 3))

    @jax.jit
    def f(cell):
        return radius_neighbor_matrix(pos, rcut=2.0, capacity=4, cell=cell).idx

    f(jnp.eye(3) * 3.0)  # must trace + run without raising
