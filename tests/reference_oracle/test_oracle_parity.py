"""Numerical parity against the reference's OWN code (VERDICT r1 #4).

Every other fidelity test in this repo compares against this repo's fp32
path or an independent re-implementation. These tests import the reference's
torch-only modules straight from /root/reference/src (via
tests/reference_oracle/_loader.py) and assert exact (f64) agreement of:

* internal coordinates: distances / distance vectors / raw & cos angles /
  torsions (reference: src/flashmd/geometry/internal_coordinates.py:36-223)
* all three cutoff envelopes, including boundary behavior
  (reference: src/flashmd/models/cutoff.py:40-199)
* GaussianBasis init constants and forward expansion
  (reference: src/flashmd/models/radial_basis/gaussian.py:33-102)
* MLP forward on shared random weights
  (reference: src/flashmd/models/mlp.py:30-57)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from flashmd_tpu.models.cutoff import (
    CosineCutoff,
    IdentityCutoff,
    ShiftedCosineCutoff,
)
from flashmd_tpu.models.mlp import init_mlp, mlp_apply
from flashmd_tpu.models.radial_basis import (
    GaussianBasisConfig,
    gaussian_basis_apply,
    init_gaussian_basis,
)
from flashmd_tpu.ops import geometry as geo
from tests.reference_oracle._loader import (
    load_reference_modules,
    reference_available,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference source tree not present"
)


@pytest.fixture(autouse=True)
def _x64_scope():
    """f64 end to end: any genuine formula mismatch shows up far above the
    1e-12 tolerances; fp32 rounding noise would mask it."""
    prev = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", prev)


@pytest.fixture(scope="module")
def ref():
    return load_reference_modules()


@pytest.fixture(scope="module")
def random_pos():
    rng = np.random.default_rng(7)
    return rng.uniform(-2.0, 4.0, size=(24, 3))


def _t(x):
    return torch.tensor(np.asarray(x), dtype=torch.float64)


# ---------------------------------------------------------------- geometry


def test_distances_match_reference(ref, random_pos):
    ic = ref["geometry.internal_coordinates"]
    rng = np.random.default_rng(1)
    mapping = rng.integers(0, 24, size=(2, 40))
    ours = geo.compute_distances(jnp.asarray(random_pos), jnp.asarray(mapping))
    theirs = ic.compute_distances(_t(random_pos), torch.tensor(mapping))
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy(), rtol=1e-12, atol=1e-12
    )


def test_distance_vectors_match_reference(ref, random_pos):
    ic = ref["geometry.internal_coordinates"]
    rng = np.random.default_rng(2)
    mapping = rng.integers(0, 24, size=(2, 40))
    # include a coincident pair: safe_norm/safe_normalization edge case
    mapping[:, 0] = [3, 3]
    d_o, v_o = geo.compute_distance_vectors(
        jnp.asarray(random_pos), jnp.asarray(mapping)
    )
    d_r, v_r = ic.compute_distance_vectors(
        _t(random_pos), torch.tensor(mapping)
    )
    np.testing.assert_allclose(
        np.asarray(d_o), d_r.numpy(), rtol=1e-12, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(v_o), v_r.numpy(), rtol=1e-12, atol=1e-12
    )


def test_distance_vectors_with_cell_shifts(ref, random_pos):
    ic = ref["geometry.internal_coordinates"]
    rng = np.random.default_rng(3)
    mapping = rng.integers(0, 24, size=(2, 40))
    shifts = rng.uniform(-5.0, 5.0, size=(40, 3))
    d_o, v_o = geo.compute_distance_vectors(
        jnp.asarray(random_pos), jnp.asarray(mapping), jnp.asarray(shifts)
    )
    d_r, v_r = ic.compute_distance_vectors(
        _t(random_pos), torch.tensor(mapping), _t(shifts)
    )
    np.testing.assert_allclose(
        np.asarray(d_o), d_r.numpy(), rtol=1e-12, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(v_o), v_r.numpy(), rtol=1e-12, atol=1e-12
    )


def test_angles_match_reference(ref, random_pos):
    ic = ref["geometry.internal_coordinates"]
    rng = np.random.default_rng(4)
    mapping = np.stack(
        [rng.permutation(24)[:20] for _ in range(3)]
    )
    raw_o = geo.compute_angles_raw(
        jnp.asarray(random_pos), jnp.asarray(mapping)
    )
    raw_r = ic.compute_angles_raw(_t(random_pos), torch.tensor(mapping))
    np.testing.assert_allclose(
        np.asarray(raw_o), raw_r.numpy(), rtol=1e-12, atol=1e-12
    )
    cos_o = geo.compute_angles_cos(
        jnp.asarray(random_pos), jnp.asarray(mapping)
    )
    cos_r = ic.compute_angles_cos(_t(random_pos), torch.tensor(mapping))
    np.testing.assert_allclose(
        np.asarray(cos_o), cos_r.numpy(), rtol=1e-12, atol=1e-12
    )


def test_torsions_match_reference(ref, random_pos):
    ic = ref["geometry.internal_coordinates"]
    A = random_pos.shape[0]
    mapping = np.stack(
        [np.arange(A - 3), np.arange(1, A - 2), np.arange(2, A - 1),
         np.arange(3, A)]
    )
    ours = geo.compute_torsions(jnp.asarray(random_pos), jnp.asarray(mapping))
    theirs = ic.compute_torsions(_t(random_pos), torch.tensor(mapping))
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy(), rtol=1e-10, atol=1e-12
    )


# ----------------------------------------------------------------- cutoffs


def _dist_grid(upper):
    """Dense grid crossing all regime boundaries, plus the exact edges."""
    g = np.linspace(0.0, upper * 1.3, 401)
    return np.concatenate([g, [upper, upper / 2, 1e-8]])


def test_identity_cutoff_matches_reference(ref):
    rc = ref["models.cutoff"]
    d = _dist_grid(5.0)
    theirs = rc.IdentityCutoff(0, 5.0)(_t(d))
    ours = IdentityCutoff(0.0, 5.0)(jnp.asarray(d))
    np.testing.assert_array_equal(np.asarray(ours), theirs.numpy())


@pytest.mark.parametrize("lower,upper", [(0.0, 5.0), (0.0, 4.0), (1.5, 6.0)])
def test_cosine_cutoff_matches_reference(ref, lower, upper):
    rc = ref["models.cutoff"]
    d = _dist_grid(upper)
    theirs = rc.CosineCutoff(lower, upper)(_t(d))
    ours = CosineCutoff(lower, upper)(jnp.asarray(d))
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy(), rtol=1e-14, atol=1e-15
    )


@pytest.mark.parametrize("upper,width", [(5.0, 0.5), (4.0, 1.0)])
def test_shifted_cosine_cutoff_matches_reference(ref, upper, width):
    rc = ref["models.cutoff"]
    d = _dist_grid(upper)
    theirs = rc.ShiftedCosineCutoff(upper, width)(_t(d))
    ours = ShiftedCosineCutoff(0.0, upper, width)(jnp.asarray(d))
    np.testing.assert_allclose(
        np.asarray(ours), theirs.numpy(), rtol=1e-14, atol=1e-15
    )


# ----------------------------------------------------------- GaussianBasis


def test_gaussian_basis_init_matches_reference(ref):
    rg = ref["models.radial_basis.gaussian"]
    rc = ref["models.cutoff"]
    theirs = rg.GaussianBasis(rc.CosineCutoff(0.0, 5.0), num_rbf=32).double()
    cfg = GaussianBasisConfig(cutoff=CosineCutoff(0.0, 5.0), num_rbf=32)
    params = init_gaussian_basis(cfg, dtype=jnp.float64)
    # torch linspace is f32; the reference registers f32 buffers — compare
    # at f32 resolution
    np.testing.assert_allclose(
        np.asarray(params["offset"]),
        theirs.offset.numpy(),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        float(params["coeff"]), float(theirs.coeff), rtol=1e-6
    )


def test_gaussian_basis_forward_matches_reference(ref):
    """Forward parity on SHARED buffers (isolates the expansion formula
    from linspace dtype differences)."""
    rg = ref["models.radial_basis.gaussian"]
    rc = ref["models.cutoff"]
    theirs = rg.GaussianBasis(rc.CosineCutoff(0.0, 5.0), num_rbf=32).double()
    d = _dist_grid(5.0)
    out_r = theirs(_t(d))

    cfg = GaussianBasisConfig(cutoff=CosineCutoff(0.0, 5.0), num_rbf=32)
    params = {
        "offset": jnp.asarray(theirs.offset.numpy()),
        "coeff": jnp.asarray(float(theirs.coeff)),
    }
    out_o = gaussian_basis_apply(params, cfg, jnp.asarray(d))
    np.testing.assert_allclose(
        np.asarray(out_o), out_r.numpy(), rtol=1e-13, atol=1e-15
    )

    # number-valued cutoff -> IdentityCutoff(0, x) convention parity
    theirs_id = rg.GaussianBasis(6.0, num_rbf=16).double()
    cfg_id = GaussianBasisConfig(cutoff=6.0, num_rbf=16)
    assert isinstance(cfg_id.cutoff, IdentityCutoff)
    assert cfg_id.cutoff.cutoff_upper == theirs_id.cutoff.cutoff_upper


# -------------------------------------------------------------------- MLP


@pytest.mark.parametrize("last_bias", [True, False])
def test_mlp_forward_matches_reference(ref, last_bias):
    rm = ref["models.mlp"]
    widths = [9, 16, 16, 1]
    torch.manual_seed(3)
    theirs = rm.MLP(widths, last_bias=last_bias).double()

    # copy torch Linear weights ([out, in]) into our [in, out] pytree
    params = init_mlp(jax.random.PRNGKey(0), widths, last_bias=last_bias,
                      dtype=jnp.float64)
    linears = [m for m in theirs.layers if isinstance(m, torch.nn.Linear)]
    assert len(linears) == len(params["layers"])
    for layer, lin in zip(params["layers"], linears):
        layer["w"] = jnp.asarray(lin.weight.detach().numpy().T)
        if "b" in layer:
            assert lin.bias is not None
            layer["b"] = jnp.asarray(lin.bias.detach().numpy())
        else:
            assert lin.bias is None

    x = np.random.default_rng(5).normal(size=(40, widths[0]))
    out_r = theirs(_t(x)).detach().numpy()
    out_o = np.asarray(mlp_apply(params, jnp.asarray(x), precision="fp32"))
    np.testing.assert_allclose(out_o, out_r, rtol=1e-12, atol=1e-13)
