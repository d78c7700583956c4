"""Reference-checkpoint ingestion: stub unpickling + numerical fidelity.

Uses the shared synthetic ``model_and_prior.pt`` harness
(tests/helpers/synthetic_checkpoint.py) and checks the converted JAX force
field reproduces an independent torch edge-list evaluation of the same
weights to f64 tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashmd_tpu.models.checkpoint_io import (
    build_forcefield,
    load_reference_checkpoint,
    load_reference_configurations,
    load_native_model,
    save_native_model,
)
from flashmd_tpu.models.forcefield import compute_energy_forces
from tests.helpers.synthetic_checkpoint import (
    A,
    HIDDEN,
    N_RBF,
    RCUT,
    build_synthetic_checkpoint,
)


@pytest.fixture(autouse=True)
def _x64_scope():
    """Enable float64 only while this module's tests run.

    The f64 fidelity assertions below (rtol=1e-9) need real float64 —
    without x64 the dtype=jnp.float64 request silently downcasts to f32
    and the comparison degrades to ~1e-7. Scoped as a fixture (not an
    import-time config update) so it cannot leak into other test files
    collected in the same session.
    """
    prev = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", prev)


@pytest.fixture(scope="module")
def saved_checkpoint(tmp_path_factory):
    return build_synthetic_checkpoint(tmp_path_factory.mktemp("ckpt"))


def test_loads_with_stubs(saved_checkpoint):
    ref = load_reference_checkpoint(saved_checkpoint["model_path"])
    assert ref.schnet_params is not None
    assert ref.schnet_config.hidden_channels == HIDDEN
    assert ref.schnet_config.num_rbf == N_RBF
    assert ref.schnet_config.num_interactions == 2
    assert ref.schnet_config.cutoff.cutoff_upper == RCUT
    kinds = sorted(p.kind for p in ref.priors)
    assert kinds == ["dihedral", "harmonic_bonds", "repulsion"]


def test_configurations_load(saved_checkpoint):
    configs = load_reference_configurations(
        saved_checkpoint["structures_path"]
    )
    assert len(configs) == 2
    assert configs[0].n_atoms == A
    assert set(configs[0].neighbor_lists) == {
        "bonds",
        "repulsion",
        "dihedrals",
    }
    np.testing.assert_allclose(configs[0].pos, saved_checkpoint["pos"])


def test_converted_energies_match_reference(saved_checkpoint):
    ref = load_reference_checkpoint(saved_checkpoint["model_path"])
    configs = load_reference_configurations(
        saved_checkpoint["structures_path"]
    )
    # optimize=False: this is the exact-parity oracle (rtol=1e-9), so it
    # must run the fp32/xla path, not the default cheb/bf16 fast path.
    ff = build_forcefield(
        ref, configs[0], dtype=jnp.float64, neighbor_capacity=A,
        optimize=False,
    )
    pos = jnp.asarray(saved_checkpoint["pos"], dtype=jnp.float64)[None]
    types = jnp.asarray(saved_checkpoint["types"], dtype=jnp.int32)
    potential, forces, comps = compute_energy_forces(ff, pos, types)

    np.testing.assert_allclose(
        float(comps["SchNet"][0]),
        saved_checkpoint["e_schnet"],
        rtol=1e-9,
    )
    np.testing.assert_allclose(
        float(comps["bonds"][0]), saved_checkpoint["e_bonds"], rtol=1e-9
    )
    np.testing.assert_allclose(
        float(comps["repulsion"][0]), saved_checkpoint["e_rep"], rtol=1e-9
    )
    assert np.all(np.isfinite(np.asarray(forces)))


def test_default_conversion_is_optimized(saved_checkpoint):
    """VERDICT r1 #3: a converted checkpoint must land on the fast path by
    default (cheb/bf16 at the asymmetric 64/96 fidelity floor), mirroring
    the reference's optimizations-on-by-default
    (reference: src/flashmd/models/schnet.py:52-91)."""
    ref = load_reference_checkpoint(saved_checkpoint["model_path"])
    configs = load_reference_configurations(
        saved_checkpoint["structures_path"]
    )
    ff = build_forcefield(ref, configs[0], neighbor_capacity=A)
    assert ff.schnet_config.message_passing == "cheb"
    assert ff.schnet_config.precision == "bf16"
    assert ff.schnet_config.cheb_order == 64
    assert ff.schnet_config.cheb_order_deriv == 96
    # and the optimized field still evaluates finitely on the real molecule
    pos = jnp.asarray(saved_checkpoint["pos"], dtype=jnp.float32)[None]
    types = jnp.asarray(saved_checkpoint["types"], dtype=jnp.int32)
    potential, forces, _ = compute_energy_forces(ff, pos, types)
    assert np.all(np.isfinite(np.asarray(forces)))


def test_native_roundtrip(saved_checkpoint):
    ref = load_reference_checkpoint(saved_checkpoint["model_path"])
    path = str(saved_checkpoint["tmp"] / "native_model.pkl")
    save_native_model(ref, path)
    ref2 = load_native_model(path)
    np.testing.assert_array_equal(
        ref.schnet_params["embedding"], ref2.schnet_params["embedding"]
    )
    assert ref2.schnet_config == ref.schnet_config
