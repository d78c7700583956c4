"""Classical prior force-field terms.

Re-design of the reference prior stack (reference: src/flashmd/prior/ —
base.py:5-60, harmonic.py:23-451, fourier_series.py:16-467,
repulsion.py:14-220, polynomial.py:13-186, restricted_bending.py:13-238) and
of its simulation-time specialization pass
(reference: src/flashmd/simulation/specialize_prior.py:76-207).

Design
------
Every reference prior follows the same pattern per step: look up per-term
parameters from dense type-indexed buffers (``k[type_i, type_j, ...]``),
compute geometric features from a static index map, evaluate a closed form,
and scatter-sum per structure. Because atom types and index maps never change
during a simulation, the type-table gather is a constant — the reference
exploits this only behind the opt-in ``specialize_priors`` flag; here it is
the *only* representation: a :class:`Prior` stores the per-term parameter
arrays directly (gathered once at construction), so the hot path is pure
elementwise math + one sum. This is both faster and simpler under jit.

A :class:`Prior` evaluates ONE molecule (``pos [A, 3]``); batching is
``jax.vmap`` at the force-field level. The per-structure scatter of the
reference (harmonic.py:111-119) is a plain ``sum`` here.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops.geometry import (
    compute_angles_cos,
    compute_angles_raw,
    compute_distances,
    compute_torsions,
)

# ---------------------------------------------------------------------------
# Feature functions (reference: each prior's compute_features)
# ---------------------------------------------------------------------------


def _torsion_shifted(pos, mapping):
    """Phase-shifted torsions for distributions peaked at +-pi
    (reference: ShiftedPeriodicHarmonicImpropers.compute_features,
    harmonic.py:370-386)."""
    feats = compute_torsions(pos, mapping)
    return jnp.where(feats < 0, feats + 2 * math.pi, feats) - math.pi


FEATURE_FNS: Dict[str, Callable] = {
    "distance": compute_distances,
    "angle_cos": compute_angles_cos,
    "angle_raw": compute_angles_raw,
    "torsion": compute_torsions,
    "torsion_shifted": _torsion_shifted,
}


# ---------------------------------------------------------------------------
# Energy forms (reference: each prior's static compute)
# ---------------------------------------------------------------------------


def harmonic_compute(x, x0, k, V0=0.0):
    """k (x - x0)^2 + V0 (reference: harmonic.py:121-123)."""
    return k * jnp.square(x - x0) + V0


def fourier_compute(theta, v_0, k1s, k2s):
    """v0 + sum_n k1_n sin(n theta) + k2_n cos(n theta)
    (reference: fourier_series.py:153-192). k1s/k2s: [n_terms, n_degs]."""
    n_k = k1s.shape[1]
    n_degs = jnp.arange(1, n_k + 1, dtype=theta.dtype)
    angles = theta[:, None] * n_degs[None, :]
    v = k1s * jnp.sin(angles) + k2s * jnp.cos(angles)
    if v_0.ndim > 1:
        v_0 = v_0[:, 0]
    return jnp.sum(v, axis=1) + v_0


def repulsion_compute(x, sigma):
    """(sigma / x)^6 (reference: repulsion.py:118-122)."""
    rr = (sigma / x) * (sigma / x)
    return rr * rr * rr


def polynomial_compute(x, ks, V0):
    """V0 + sum_n k_n x^n with incremental powers
    (reference: polynomial.py:135-154). ks: [n_degs, n_terms]."""
    v = ks[0] * x
    x_pow = x
    for k in ks[1:]:
        x_pow = x_pow * x
        v = v + k * x_pow
    return v + V0


def restricted_quartic_compute(x, a, b, c, d, k, v_0):
    """a cos^4 + b cos^3 + c cos^2 + d cos + k / sin^2 + v0
    (reference: restricted_bending.py:193-238)."""
    cos = jnp.cos(x)
    sin = jnp.sin(x)
    quart = a * cos**4 + b * cos**3 + c * cos**2 + d * cos
    return quart + k / (sin**2) + v_0


# ---------------------------------------------------------------------------
# The Prior pytree
# ---------------------------------------------------------------------------

_KIND_FEATURES = {
    "repulsion_dense": "distance",
    "harmonic_bonds": "distance",
    "harmonic_angles": "angle_cos",
    "harmonic_angles_raw": "angle_raw",
    "harmonic_impropers": "torsion",
    "shifted_periodic_harmonic_impropers": "torsion_shifted",
    "general_bonds": "distance",
    "general_angles": "angle_cos",
    "repulsion": "distance",
    "dihedral": "torsion",
    "polynomial": "angle_cos",
    "quartic_angles": "angle_cos",
    "restricted_quartic": "angle_raw",
}


class Prior(struct.PyTreeNode):
    """A specialized prior: static index map + per-term parameters.

    Equivalent of one reference ``Static<Name>`` module produced by
    ``condense_prior_for_simulation`` (specialize_prior.py:112-207), except
    construction from type-indexed statistics goes directly to this form.
    """

    index_mapping: jnp.ndarray  # [order, n_terms] int32
    params: Dict[str, jnp.ndarray]
    kind: str = struct.field(pytree_node=False, default="harmonic_bonds")
    name: str = struct.field(pytree_node=False, default="bonds")
    feature: str = struct.field(pytree_node=False, default="distance")
    # Per-term validity for padded (mixed-size-batch) priors: [n_terms]
    # float, 1 = real term, 0 = padding. None (the common case) means
    # every term is real. Padding terms DUPLICATE a real term (see
    # pad_prior), so their primals/partials are finite and the masked
    # select below contributes exactly zero energy AND zero gradient.
    term_mask: Optional[jnp.ndarray] = None

    @property
    def order(self) -> int:
        return self.index_mapping.shape[0]

    @property
    def n_terms(self) -> int:
        return self.index_mapping.shape[1]


def prior_energy(prior: Prior, pos) -> jnp.ndarray:
    """Scalar prior energy of one molecule."""
    if prior.kind == "repulsion_dense":
        feats = None
    else:
        feats = FEATURE_FNS[prior.feature](pos, prior.index_mapping)
    kind = prior.kind
    p = prior.params
    if kind in (
        "harmonic_bonds",
        "harmonic_angles",
        "harmonic_angles_raw",
        "harmonic_impropers",
        "shifted_periodic_harmonic_impropers",
        "general_bonds",
        "general_angles",
    ):
        terms = harmonic_compute(
            feats, p["x0"], p["k"], p.get("V0", 0.0)
        )
    elif kind == "repulsion":
        terms = repulsion_compute(feats, p["sigma"])
    elif kind == "repulsion_dense":
        # Dense-pair evaluation of the fully-connected repulsion
        # (reference repulsion.py uses a fully-connected term list,
        # :44-45): sigma^6 lives in a per-pair matrix with zeros on
        # excluded pairs, so the energy is a masked elementwise map over
        # the [A, A] distance matrix — no index gathers at all.
        sigma6 = p["sigma6"]
        rel = pos[None, :, :] - pos[:, None, :]
        d2 = jnp.sum(rel * rel, axis=-1)
        d2_safe = jnp.where(sigma6 > 0, d2, 1.0)
        inv6 = 1.0 / (d2_safe * d2_safe * d2_safe)
        return jnp.sum(jnp.where(sigma6 > 0, sigma6 * inv6, 0.0))
    elif kind == "dihedral":
        terms = fourier_compute(feats, p["v_0"], p["k1s"], p["k2s"])
    elif kind in ("polynomial", "quartic_angles"):
        terms = polynomial_compute(feats, p["ks"], p["v_0"])
    elif kind == "restricted_quartic":
        terms = restricted_quartic_compute(
            feats, p["a"], p["b"], p["c"], p["d"], p["k"], p["v_0"]
        )
    else:
        raise NotImplementedError(f"Unknown prior kind: {kind}")
    if prior.term_mask is not None:
        terms = jnp.where(prior.term_mask > 0, terms, 0.0)
    return jnp.sum(terms)


# ---------------------------------------------------------------------------
# Builders from type-indexed statistics (reference __init__ + data2parameters)
# ---------------------------------------------------------------------------


def _dense_tables_from_statistics(statistics, order, field_names):
    """Build dense [max_type+1]^order numpy tables from a statistics dict
    (mirrors the buffer construction in reference harmonic.py:59-77 etc.)."""
    keys = np.asarray(list(statistics.keys()), dtype=np.int64)
    if keys.ndim == 1:
        keys = keys[:, None]
    assert keys.min() >= 0
    max_type = int(keys.max())
    sizes = tuple(max_type + 1 for _ in range(order))
    tables = {f: np.zeros(sizes, dtype=np.float64) for f in field_names}
    for key, stats in statistics.items():
        idx = tuple(np.atleast_1d(np.asarray(key, dtype=np.int64)))
        for f in field_names:
            tables[f][idx] = np.asarray(stats[f], dtype=np.float64)
    return tables


def gather_type_params(table, atom_types, index_mapping):
    """table[types[m_0], types[m_1], ...] -> per-term parameter vector.

    The once-per-simulation version of the reference's per-step
    ``data2parameters`` gather (harmonic.py:79-89)."""
    table = jnp.asarray(table)
    idx = tuple(
        jnp.asarray(atom_types)[index_mapping[i]]
        for i in range(index_mapping.shape[0])
    )
    return table[idx]


def harmonic_prior(
    statistics,
    atom_types,
    index_mapping,
    kind: str = "harmonic_bonds",
    name: Optional[str] = None,
    dtype=jnp.float32,
) -> Prior:
    """Any Harmonic-family prior from a statistics dict
    (reference: Harmonic.__init__ harmonic.py:59-77 + data2parameters)."""
    index_mapping = jnp.asarray(index_mapping, dtype=jnp.int32)
    order = index_mapping.shape[0]
    tables = _dense_tables_from_statistics(statistics, order, ["x_0", "k"])
    params = {
        "x0": gather_type_params(tables["x_0"], atom_types, index_mapping)
        .astype(dtype),
        "k": gather_type_params(tables["k"], atom_types, index_mapping)
        .astype(dtype),
    }
    default_names = {
        "harmonic_bonds": "bonds",
        "harmonic_angles": "angles",
        "harmonic_angles_raw": "angles",
        "harmonic_impropers": "impropers",
        "shifted_periodic_harmonic_impropers": "impropers",
        "general_bonds": "bonds",
        "general_angles": "angles",
    }
    return Prior(
        index_mapping=index_mapping,
        params=params,
        kind=kind,
        name=name or default_names[kind],
        feature=_KIND_FEATURES[kind],
    )


def repulsion_prior(
    statistics, atom_types, index_mapping, name: str = "repulsion",
    dtype=jnp.float32,
) -> Prior:
    """(sigma/x)^6 excluded-volume prior (reference: repulsion.py:47-60)."""
    index_mapping = jnp.asarray(index_mapping, dtype=jnp.int32)
    tables = _dense_tables_from_statistics(statistics, 2, ["sigma"])
    params = {
        "sigma": gather_type_params(
            tables["sigma"], atom_types, index_mapping
        ).astype(dtype)
    }
    return Prior(
        index_mapping=index_mapping,
        params=params,
        kind="repulsion",
        name=name,
        feature="distance",
    )


def dihedral_prior(
    statistics,
    atom_types,
    index_mapping,
    n_degs: int = 3,
    name: str = "dihedrals",
    dtype=jnp.float32,
) -> Prior:
    """Fourier-series dihedral prior
    (reference: FourierSeries.__init__ fourier_series.py:51-80, Dihedral)."""
    index_mapping = jnp.asarray(index_mapping, dtype=jnp.int32)
    order = index_mapping.shape[0]
    keys = np.asarray(list(statistics.keys()), dtype=np.int64)
    max_type = int(keys.max())
    sizes = tuple(max_type + 1 for _ in range(order))
    k1 = np.zeros((n_degs,) + sizes)
    k2 = np.zeros((n_degs,) + sizes)
    v_0 = np.zeros(sizes)
    for key, stats in statistics.items():
        idx = tuple(np.asarray(key, dtype=np.int64))
        for ii in range(n_degs):
            k1[(ii,) + idx] = np.asarray(stats["k1s"][f"k1_{ii + 1}"])
            k2[(ii,) + idx] = np.asarray(stats["k2s"][f"k2_{ii + 1}"])
        v_0[idx] = np.asarray(stats["v_0"])
    k1s = jnp.stack(
        [
            gather_type_params(k1[ii], atom_types, index_mapping)
            for ii in range(n_degs)
        ],
        axis=1,
    ).astype(dtype)
    k2s = jnp.stack(
        [
            gather_type_params(k2[ii], atom_types, index_mapping)
            for ii in range(n_degs)
        ],
        axis=1,
    ).astype(dtype)
    v0 = gather_type_params(v_0, atom_types, index_mapping)[:, None].astype(
        dtype
    )
    return Prior(
        index_mapping=index_mapping,
        params={"k1s": k1s, "k2s": k2s, "v_0": v0},
        kind="dihedral",
        name=name,
        feature="torsion",
    )


def polynomial_prior(
    statistics,
    atom_types,
    index_mapping,
    n_degs: int = 4,
    kind: str = "polynomial",
    name: str = "angles",
    dtype=jnp.float32,
) -> Prior:
    """Polynomial / QuarticAngles prior (reference: polynomial.py:44-96)."""
    index_mapping = jnp.asarray(index_mapping, dtype=jnp.int32)
    order = index_mapping.shape[0]
    keys = np.asarray(list(statistics.keys()), dtype=np.int64)
    max_type = int(keys.max())
    sizes = tuple(max_type + 1 for _ in range(order))
    k = np.zeros((n_degs,) + sizes)
    v_0 = np.zeros(sizes)
    for key, stats in statistics.items():
        idx = tuple(np.asarray(key, dtype=np.int64))
        ks = stats["ks"]
        for ii in range(n_degs):
            k[(ii,) + idx] = np.asarray(ks[f"k_{ii + 1}"])
        v_0[idx] = np.asarray(stats["v_0"])
    ks = jnp.stack(
        [
            gather_type_params(k[ii], atom_types, index_mapping)
            for ii in range(n_degs)
        ],
        axis=0,
    ).astype(dtype)
    v0 = gather_type_params(v_0, atom_types, index_mapping).astype(dtype)
    return Prior(
        index_mapping=index_mapping,
        params={"ks": ks, "v_0": v0},
        kind=kind,
        name=name,
        feature=_KIND_FEATURES[kind],
    )


def restricted_quartic_prior(
    statistics,
    atom_types,
    index_mapping,
    name: str = "angles",
    dtype=jnp.float32,
) -> Prior:
    """Restricted-quartic bending prior
    (reference: restricted_bending.py:52-93)."""
    index_mapping = jnp.asarray(index_mapping, dtype=jnp.int32)
    fields = ["a", "b", "c", "d", "k", "v_0"]
    tables = _dense_tables_from_statistics(statistics, 3, fields)
    params = {
        f: gather_type_params(tables[f], atom_types, index_mapping).astype(
            dtype
        )
        for f in fields
    }
    return Prior(
        index_mapping=index_mapping,
        params=params,
        kind="restricted_quartic",
        name=name,
        feature="angle_raw",
    )


def densify_repulsion(prior: Prior, n_atoms: int) -> Prior:
    """Convert a term-list repulsion prior into the dense-pair form.

    Each (i, j) term contributes sigma^6 at matrix entry [i, j] (one
    direction only — the dense sum then counts each term exactly once).
    Excluded/bonded pairs simply have no entry.
    """
    if prior.kind != "repulsion":
        raise ValueError("densify_repulsion expects a repulsion prior")
    idx = np.asarray(prior.index_mapping)
    sigma = np.asarray(prior.params["sigma"], dtype=np.float64)
    mat = np.zeros((n_atoms, n_atoms), dtype=np.float64)
    mat[idx[0], idx[1]] += sigma**6
    return Prior(
        index_mapping=prior.index_mapping,
        params={"sigma6": jnp.asarray(mat, jnp.float32)},
        kind="repulsion_dense",
        name=prior.name,
        feature="distance",
    )


# ---------------------------------------------------------------------------
# Mixed-size-batch support: padding and stacking specialized priors
# ---------------------------------------------------------------------------
#
# A mixed batch carries DIFFERENT molecules, so each sim has its own
# specialized priors (term counts and index maps differ). The TPU-native
# layout pads every molecule's prior to the batch maximum term count and
# stacks the leaves along a leading [S] axis; the engine then vmaps
# ``prior_energy`` over that axis alongside the positions. The reference
# cannot do this at all — its ``validate_data_list`` refuses mixed
# structures (reference: src/flashmd/simulation/base.py:914-983).


def pad_prior(prior: Prior, n_terms: int) -> Prior:
    """Pad a specialized prior to ``n_terms`` terms with masked duplicates.

    Padding terms DUPLICATE the prior's first term (same indices, same
    parameters) and carry ``term_mask = 0``: the duplicated term's energy
    and partials are finite by construction (it is a real term of a real
    molecule), so the masked select in :func:`prior_energy` yields exactly
    zero energy and exactly zero gradient for padding — no NaN-through-
    where hazard from degenerate padded geometry.

    A zero-term prior (legal: a molecule may e.g. have no dihedrals) is
    padded with consecutive-atom indices and zero-valued parameters; the
    distinct indices keep the feature primal finite.
    """
    if prior.kind == "repulsion_dense":
        raise ValueError(
            "pad_prior pads term lists; densify after stacking instead "
            "(dense repulsion pads by zero-extending sigma6)."
        )
    t = prior.n_terms
    if n_terms < t:
        raise ValueError(f"Cannot pad {t} terms down to {n_terms}")
    mask = prior.term_mask
    if mask is None:
        mask = jnp.ones((t,), jnp.float32)
    if n_terms == t:
        return prior.replace(term_mask=mask)
    extra = n_terms - t
    if t > 0:
        idx_pad = jnp.repeat(
            prior.index_mapping[:, :1], extra, axis=1
        )
        params_pad = {
            k: jnp.repeat(v[:1], extra, axis=0)
            for k, v in prior.params.items()
        }
    else:
        idx_pad = jnp.broadcast_to(
            jnp.arange(prior.order, dtype=jnp.int32)[:, None],
            (prior.order, extra),
        )
        params_pad = {
            k: jnp.zeros((extra,) + v.shape[1:], v.dtype)
            for k, v in prior.params.items()
        }
    return prior.replace(
        index_mapping=jnp.concatenate(
            [prior.index_mapping, idx_pad], axis=1
        ),
        params={
            k: jnp.concatenate([prior.params[k], params_pad[k]], axis=0)
            for k in prior.params
        },
        term_mask=jnp.concatenate(
            [mask, jnp.zeros((extra,), jnp.float32)]
        ),
    )


def stack_priors(priors) -> Prior:
    """Stack per-molecule priors of one kind into a batched Prior.

    Every leaf gains a leading [S] axis after padding to the max term
    count (dense repulsion: zero-extending sigma6 to the max atom count).
    Evaluate with ``jax.vmap(prior_energy, in_axes=(0, 0))`` — see
    models/forcefield.compute_energy_forces (batched-prior path).
    """
    priors = list(priors)
    if not priors:
        raise ValueError("stack_priors needs at least one prior")
    ref = priors[0]
    for p in priors:
        if (p.kind, p.name, p.feature, p.order) != (
            ref.kind, ref.name, ref.feature, ref.order,
        ):
            raise ValueError(
                "stack_priors requires matching (kind, name, feature, "
                f"order): got {(p.kind, p.name, p.feature, p.order)} vs "
                f"{(ref.kind, ref.name, ref.feature, ref.order)}"
            )
    if ref.kind == "repulsion_dense":
        a_max = max(p.params["sigma6"].shape[0] for p in priors)
        mats = []
        for p in priors:
            m = p.params["sigma6"]
            a = m.shape[0]
            mats.append(jnp.pad(m, ((0, a_max - a), (0, a_max - a))))
        return ref.replace(
            index_mapping=jnp.stack(
                [
                    jnp.zeros((ref.order, 0), jnp.int32)
                    for _ in priors
                ]
            ),
            params={"sigma6": jnp.stack(mats)},
        )
    t_max = max(p.n_terms for p in priors)
    padded = [pad_prior(p, t_max) for p in priors]
    return ref.replace(
        index_mapping=jnp.stack([p.index_mapping for p in padded]),
        params={
            k: jnp.stack([p.params[k] for p in padded])
            for k in ref.params
        },
        term_mask=jnp.stack([p.term_mask for p in padded]),
    )
