"""Prior-energy parity against the reference's OWN prior modules.

Loads the reference prior families from /root/reference/src with
torch_geometric stubbed (see _loader.load_reference_prior_modules), drives
their real ``forward`` on a duck-typed AtomicData, and asserts f64 parity
with this repo's specialized priors (flashmd_tpu/prior/priors.py) built
from the SAME statistics dicts.

Covered families (reference file:line):
* HarmonicBonds / HarmonicAngles / HarmonicImpropers /
  ShiftedPeriodicHarmonicImpropers  (prior/harmonic.py:202-420)
* Repulsion                          (prior/repulsion.py:14-113)
* Dihedral (FourierSeries)           (prior/fourier_series.py:51-192,440)
* QuarticAngles (Polynomial)         (prior/polynomial.py:44-186)
* RestrictedQuartic                  (prior/restricted_bending.py:13-238)

HarmonicAnglesRaw is deliberately not constructed through the reference
class: its ``__init__`` drops the ``order`` argument (prior/harmonic.py:
283-287 passes ``name`` into Harmonic's ``order`` slot) — a reference bug
documented in PARITY.md and not replicated here.
"""

import itertools
import types as pytypes

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from flashmd_tpu.prior.priors import (
    dihedral_prior,
    harmonic_prior,
    polynomial_prior,
    prior_energy,
    repulsion_prior,
    restricted_quartic_prior,
)
from tests.reference_oracle._loader import (
    load_reference_prior_modules,
    reference_available,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference source tree not present"
)

A = 16
N_TYPES = 2


@pytest.fixture(autouse=True)
def _x64_scope():
    prev = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", prev)


@pytest.fixture(scope="module")
def refp():
    return load_reference_prior_modules()


@pytest.fixture(scope="module")
def system():
    rng = np.random.default_rng(11)
    pos = rng.uniform(0.0, 4.0, size=(A, 3))
    atom_types = rng.integers(0, N_TYPES, size=(A,))
    return pos, atom_types


def _mapping(order, rng):
    """Chain index maps i, i+1, ... like real bonded terms."""
    n = A - order + 1
    base = np.stack([np.arange(i, i + n) for i in range(order)])
    perm = rng.permutation(n)
    return base[:, perm]


def _duck_data(pos, atom_types, name, mapping):
    d = pytypes.SimpleNamespace()
    d.pos = torch.tensor(pos, dtype=torch.float64)
    d.atom_types = torch.tensor(atom_types, dtype=torch.long)
    d.neighbor_list = {
        name: {
            "index_mapping": torch.tensor(mapping, dtype=torch.long),
            "mapping_batch": torch.zeros(mapping.shape[1], dtype=torch.long),
        }
    }
    d.out = {}
    return d


def _ref_energy(module, data, name):
    with torch.no_grad():
        module.double()(data)
    return float(data.out[name]["energy"][0])


def _all_keys(order):
    return list(itertools.product(range(N_TYPES), repeat=order))


def _f32(x):
    """Round to an exactly-f32-representable float: the reference stores
    statistics in f32 buffers (torch.zeros default) before .double(), so
    parameters must enter both frameworks at f32 resolution for the f64
    comparison to isolate the FORMULAS rather than buffer dtypes."""
    return float(np.float32(x))


def _harmonic_stats(order, rng):
    return {
        key: {"x_0": _f32(rng.uniform(0.5, 2.0)),
              "k": _f32(rng.uniform(0.5, 3.0))}
        for key in _all_keys(order)
    }


@pytest.mark.parametrize(
    "cls_name,kind,order",
    [
        ("HarmonicBonds", "harmonic_bonds", 2),
        ("HarmonicAngles", "harmonic_angles", 3),
        ("HarmonicImpropers", "harmonic_impropers", 4),
        ("ShiftedPeriodicHarmonicImpropers",
         "shifted_periodic_harmonic_impropers", 4),
    ],
)
def test_harmonic_family_matches_reference(refp, system, cls_name, kind,
                                           order):
    pos, atom_types = system
    rng = np.random.default_rng(order)
    stats = _harmonic_stats(order, rng)
    mapping = _mapping(order, rng)

    cls = getattr(refp["prior.harmonic"], cls_name)
    module = cls(stats)
    if cls_name == "HarmonicImpropers":
        # Reference bug (prior/harmonic.py:311-314): data2features is a
        # @staticmethod that still takes ``self``, so the reference's own
        # forward crashes with a TypeError. Re-bind it so the intended
        # semantics (torsion features) can be oracle-checked.
        module.data2features = (
            lambda d, m=module: type(m).data2features(m, d)
        )
    data = _duck_data(pos, atom_types, module.name, mapping)
    e_ref = _ref_energy(module, data, module.name)

    ours = harmonic_prior(stats, atom_types, mapping, kind=kind,
                          dtype=jnp.float64)
    e = float(prior_energy(ours, jnp.asarray(pos)))
    # ShiftedPeriodic: the reference's 2*pi phase shift uses torch_pi =
    # torch.tensor(pi) — an f32 constant even in double mode
    # (prior/harmonic.py:20) — while this repo shifts with full-precision
    # math.pi. The f32-pi rounding bounds the disagreement at ~1e-7 rel.
    rtol = 1e-6 if kind == "shifted_periodic_harmonic_impropers" else 1e-12
    np.testing.assert_allclose(e, e_ref, rtol=rtol)


def test_repulsion_matches_reference(refp, system):
    pos, atom_types = system
    rng = np.random.default_rng(21)
    stats = {
        key: {"sigma": _f32(rng.uniform(0.3, 0.9))}
        for key in _all_keys(2)
    }
    mapping = _mapping(2, rng)

    module = refp["prior.repulsion"].Repulsion(stats)
    data = _duck_data(pos, atom_types, module.name, mapping)
    e_ref = _ref_energy(module, data, module.name)

    ours = repulsion_prior(stats, atom_types, mapping, dtype=jnp.float64)
    e = float(prior_energy(ours, jnp.asarray(pos)))
    np.testing.assert_allclose(e, e_ref, rtol=1e-12)


def test_dihedral_matches_reference(refp, system):
    pos, atom_types = system
    rng = np.random.default_rng(31)
    n_degs = 3
    stats = {
        key: {
            "k1s": {f"k1_{i}": _f32(rng.normal())
                    for i in range(1, n_degs + 1)},
            "k2s": {f"k2_{i}": _f32(rng.normal())
                    for i in range(1, n_degs + 1)},
            "v_0": _f32(rng.normal()),
        }
        for key in _all_keys(4)
    }
    mapping = _mapping(4, rng)

    module = refp["prior.fourier_series"].Dihedral(stats, n_degs=n_degs)
    data = _duck_data(pos, atom_types, module.name, mapping)
    e_ref = _ref_energy(module, data, module.name)

    ours = dihedral_prior(stats, atom_types, mapping, n_degs=n_degs,
                          dtype=jnp.float64)
    e = float(prior_energy(ours, jnp.asarray(pos)))
    np.testing.assert_allclose(e, e_ref, rtol=1e-12)


def test_quartic_angles_matches_reference(refp, system):
    pos, atom_types = system
    rng = np.random.default_rng(41)
    n_degs = 4
    stats = {
        key: {
            "ks": {f"k_{i}": _f32(rng.normal())
                   for i in range(1, n_degs + 1)},
            "v_0": _f32(rng.normal()),
        }
        for key in _all_keys(3)
    }
    mapping = _mapping(3, rng)

    module = refp["prior.polynomial"].QuarticAngles(stats, n_degs=n_degs)
    data = _duck_data(pos, atom_types, module.name, mapping)
    e_ref = _ref_energy(module, data, module.name)

    ours = polynomial_prior(stats, atom_types, mapping, n_degs=n_degs,
                            kind="quartic_angles", dtype=jnp.float64)
    e = float(prior_energy(ours, jnp.asarray(pos)))
    np.testing.assert_allclose(e, e_ref, rtol=1e-12)


def test_restricted_quartic_matches_reference(refp, system):
    pos, atom_types = system
    rng = np.random.default_rng(51)
    stats = {
        key: {
            "a": _f32(rng.normal()),
            "b": _f32(rng.normal()),
            "c": _f32(rng.normal()),
            "d": _f32(rng.normal()),
            "k": _f32(rng.uniform(0.1, 1.0)),
            "v_0": _f32(rng.normal()),
        }
        for key in _all_keys(3)
    }
    mapping = _mapping(3, rng)

    module = refp["prior.restricted_bending"].RestrictedQuartic(stats)
    data = _duck_data(pos, atom_types, module.name, mapping)
    e_ref = _ref_energy(module, data, module.name)

    ours = restricted_quartic_prior(stats, atom_types, mapping,
                                    dtype=jnp.float64)
    e = float(prior_energy(ours, jnp.asarray(pos)))
    np.testing.assert_allclose(e, e_ref, rtol=1e-12)
