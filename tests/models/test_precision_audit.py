"""Jaxpr audit: the fp32 parity path must carry HIGHEST matmul precision.

On TPU, a ``dot_general`` at DEFAULT precision truncates f32 operands to
bf16 — silently, and invisibly to the CPU test suite (CPU DEFAULT is full
fp32). The reference's un-optimized path is exact fp32
(reference: src/flashmd/scripts/nvt_langevin.py:6-17), so every matmul on
our ``--disable_optim`` / fp32 oracle path must be pinned to
``Precision.HIGHEST``. This test walks the traced jaxpr of the full force
computation and fails on any dot that is not — catching the whole
missing-``precision=`` defect class on CPU (round-2 VERDICT Weak #1).
"""

import jax
import jax.numpy as jnp
import numpy as np

from flashmd_tpu.models.cutoff import CosineCutoff
from flashmd_tpu.models.forcefield import ForceField, compute_energy_forces
from flashmd_tpu.models.schnet import SchNetConfig, init_schnet

HIGHEST = jax.lax.Precision.HIGHEST

S, A = 2, 9
RCUT = 3.0


def _iter_eqns(jaxpr, skip_pallas=True):
    """Yield every eqn in ``jaxpr`` and its sub-jaxprs (pjit, remat, scan,
    cond branches, custom_vjp, ...). Pallas kernel bodies are skipped when
    requested: Mosaic does not honor XLA precision semantics and the fp32
    kernels emulate fp32 via explicit hi/lo operand splits instead."""
    stack = [jaxpr]
    seen = set()
    while stack:
        j = stack.pop()
        if id(j) in seen:
            continue
        seen.add(id(j))
        for eqn in j.eqns:
            if skip_pallas and "pallas" in eqn.primitive.name:
                continue
            yield eqn
            for v in eqn.params.values():
                for u in v if isinstance(v, (tuple, list)) else (v,):
                    if hasattr(u, "jaxpr") and hasattr(u, "consts"):
                        stack.append(u.jaxpr)  # ClosedJaxpr
                    elif hasattr(u, "eqns"):
                        stack.append(u)  # raw Jaxpr


def _audit(fn, *args):
    jaxpr = jax.make_jaxpr(fn)(*args)
    dots = [
        e for e in _iter_eqns(jaxpr.jaxpr) if e.primitive.name == "dot_general"
    ]
    assert dots, "audit traced no dot_general — wrong entry point?"
    bad = [
        str(e)
        for e in dots
        if e.params.get("precision") not in (HIGHEST, (HIGHEST, HIGHEST))
    ]
    assert not bad, (
        f"{len(bad)}/{len(dots)} dot_general eqns on the fp32 parity path "
        "lack Precision.HIGHEST (on TPU, DEFAULT truncates f32 operands to "
        "bf16):\n" + "\n".join(bad[:5])
    )


def _ff(message_passing, **kw):
    config = SchNetConfig(
        hidden_channels=16,
        embedding_size=4,
        num_filters=16,
        num_interactions=2,
        num_rbf=8,
        cutoff=CosineCutoff(0.0, RCUT),
        output_hidden_layer_widths=(8,),
        precision="fp32",
        message_passing=message_passing,
        **kw,
    )
    params = init_schnet(jax.random.PRNGKey(1), config)
    return ForceField(
        schnet_params=params,
        priors={},
        schnet_config=config,
        neighbor_capacity=A,
    )


def _data():
    rng = np.random.default_rng(7)
    pos = jnp.asarray(rng.uniform(0, 2.5, size=(S, A, 3)), jnp.float32)
    types = jnp.asarray(rng.integers(0, 4, size=(A,)), jnp.int32)
    return pos, types


def test_fp32_xla_force_path_all_dots_highest():
    """The --disable_optim oracle path (xla message passing, fp32)."""
    ff = _ff("xla")
    pos, types = _data()
    _audit(lambda p: compute_energy_forces(ff, p, types), pos)


def test_fp32_xla_force_path_no_remat_all_dots_highest():
    ff = _ff("xla", remat="none")
    pos, types = _data()
    _audit(lambda p: compute_energy_forces(ff, p, types), pos)


def test_fp32_cheb_host_path_dots_highest_outside_kernels():
    """The fp32 cheb path: everything outside the Pallas kernels (lin1/
    lin2/block-output/output-head dots, in-jit refit, minimum-image cell
    math) must also be HIGHEST; the kernels themselves emulate fp32 with
    hi/lo splits and are exempt."""
    ff = _ff("cheb", cheb_order=16)
    pos, types = _data()
    cell = jnp.eye(3, dtype=jnp.float32) * 9.0
    _audit(lambda p: compute_energy_forces(ff, p, types, cell=cell), pos)
