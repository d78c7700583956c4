"""Real-TPU Mosaic compile lane (run with ``FLASHMD_TEST_TPU=1``).

The CPU suite runs every Pallas kernel in interpreter mode, which can
never catch Mosaic *compile-time* failures: lowering RET_CHECKs (the bug
class that killed ``cheb_fused``, models/schnet.py) and scoped-VMEM OOMs
of user-selectable configs (the round-4 tile-budget corners, commit
5e9be78). This lane compiles the production kernels on the real chip —
through the exact model-level dispatch the simulator uses, plus direct
wrapper calls at every measured cell of ``_bwd_tile_budget`` — and
checks numerics against the pure-jnp path evaluated on the same chip.

Run:  FLASHMD_TEST_TPU=1 python -m pytest tests/ops/test_tpu_lane.py -v
(conftest then leaves the platform and FLASHMD_PALLAS_INTERPRET alone
and collects only ``@pytest.mark.tpu`` tests).

Covers the kernel surface of: cheb fwd / bwd (gx+gd, gd-only, gx-only,
min-image cell, F=256, bf16x3, order>72), the block-stacked deferred-gd
backward (via the model-level cheb path), the gather kernel
(``message_passing="pallas"``), and the dense all-pairs kernel
(``message_passing="dense"``).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashmd_tpu.models.cutoff import CosineCutoff
from flashmd_tpu.models.schnet import SchNetConfig, init_schnet, schnet_energy
from flashmd_tpu.models.cheb import (
    _cheb_bwd,
    _cheb_forward_only,
    _pair_z,
    attach_cheb_fit,
    fit_chebyshev_filter,
)
from flashmd_tpu.ops.neighborlist import radius_neighbor_matrix
from flashmd_tpu.ops.pallas.cheb_kernel import (
    cheb_conv_bwd_pallas,
    cheb_conv_fwd_pallas,
)

pytestmark = pytest.mark.tpu

RCUT = 4.0
# Headline-scale sizes from BASELINE configs 1/2 (1ENH-scale CG protein
# and its doubled variant — the sizes the tile budgets were measured at).
A_HEADLINE = 266
A_LARGE = 532

# Globally-normalised gradient error budget per precision tier: the
# kernel and the jnp reference share the SAME Chebyshev coefficients, so
# the only difference is kernel arithmetic (bf16 MXU rounding, summation
# order). fp32 should agree tightly; bf16 within its measured ~1e-2
# force floor; bf16x3 recovers most of fp32.
TOL = {"fp32": 3e-4, "bf16": 2e-2, "bf16x3": 3e-3}


def _positions(a, seed=0, box=None):
    rng = np.random.default_rng(seed)
    # Density ~0.05 atoms/A^3 -> O(10) neighbours inside rcut = 4 — a
    # realistic CG-protein neighbourhood, with pairs on both sides of
    # the cutoff.
    side = (a / 0.05) ** (1.0 / 3.0) if box is None else box
    return jnp.asarray(rng.uniform(0, side, (a, 3)), jnp.float32)


def _rel_err(got, want):
    got, want = np.asarray(got), np.asarray(want)
    return np.abs(got - want).max() / max(np.abs(want).max(), 1e-30)


def _fit(f, m1, m2, seed=0):
    cfg = SchNetConfig(
        hidden_channels=f,
        embedding_size=6,
        num_filters=f,
        num_rbf=50,
        num_interactions=1,
        cutoff=CosineCutoff(0.0, RCUT),
        output_hidden_layer_widths=(32,),
    )
    params = init_schnet(jax.random.PRNGKey(seed), cfg)
    c, c2, w0 = fit_chebyshev_filter(
        params["interactions"][0], params["rbf"], cfg, order=m1,
        order_deriv=m2,
    )
    return c, c2, w0


def test_backend_is_tpu():
    """The lane is meaningless off-chip — fail loudly, don't skip."""
    assert jax.default_backend() == "tpu", (
        "FLASHMD_TEST_TPU=1 requires a real TPU backend (got "
        f"{jax.default_backend()!r})"
    )


# ---------------------------------------------------------------------------
# Direct kernel-wrapper compiles at the measured _bwd_tile_budget cells.
# Every case runs with the DEFAULT tile budget — that is the point: the
# budget table's cells must actually compile inside the 16 MB scoped-VMEM
# stack on real Mosaic, not just in the interpreter.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "a,f,m1,precision",
    [
        (A_HEADLINE, 128, 64, "bf16"),  # production forward
        (A_LARGE, 256, 128, "bf16"),  # wide + large: multi-tile grid
        (A_HEADLINE, 128, 96, "fp32"),  # fp32 tier, chunked order loop
    ],
)
def test_fwd_kernel_on_tpu(a, f, m1, precision):
    c, _, w0 = _fit(f, m1, m1)
    pos = _positions(a)
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(a, f)), jnp.float32
    )
    got = cheb_conv_fwd_pallas(c, w0, pos, x, RCUT, precision)
    _, z = _pair_z(pos, RCUT)
    want = _cheb_forward_only(c, w0, z, x, "fp32")
    assert np.isfinite(np.asarray(got)).all()
    assert _rel_err(got, want) < TOL[precision]


# Each row below exercises one measured cell of _bwd_tile_budget (see
# ops/pallas/cheb_kernel.py): (need_gx, need_gd, cell?, precision,
# order_gx, F) select the budget; A selects single- vs multi-tile.
BWD_CELLS = [
    # headline per-block backward: gx+gd, n_chains=8 (M2=64), 37k cell
    (A_HEADLINE, 128, 48, 64, "bf16", True, True, False),
    # gd-only (stack's fused-gd kernel shape) at large A: 75k cell
    (A_LARGE, 128, 48, 64, "bf16", False, True, False),
    # gx-only, order_gx > 72: the 56k cell (round-3 OOM regression)
    (A_HEADLINE, 128, 96, 96, "fp32", True, False, False),
    # gx-only, bf16x3 operand splits: the 48k cell (round-4 OOM fix)
    (A_HEADLINE, 128, 64, 96, "bf16x3", True, False, False),
    # full backward at F=256: the unscaled-budget pin (measured faster
    # unscaled at F=256, ADVICE r3/r4)
    (A_HEADLINE, 256, 48, 64, "bf16", True, True, False),
    # bf16x3 full backward (tier ladder's high-fidelity quantized mode)
    (A_HEADLINE, 128, 64, 96, "bf16x3", True, True, False),
    # min-image cell: the has_cell budget column + in-kernel PBC geometry
    (A_HEADLINE, 128, 48, 64, "bf16", True, True, True),
    # fp32 full backward at bf16x3-tier orders: the dual-chain unroll
    # regression (round-5 find: a 7-group straight-line fp32 segment
    # OOMs the scoped stack at every tile size; fixed by the fp32
    # unroll cap in _run_bwd_groups)
    (A_HEADLINE, 128, 64, 96, "fp32", True, True, False),
    (A_LARGE, 128, 64, 96, "fp32", True, True, False),
]


@pytest.mark.parametrize(
    "a,f,m1,m2,precision,need_gx,need_gd,has_cell", BWD_CELLS
)
def test_bwd_kernel_on_tpu(a, f, m1, m2, precision, need_gx, need_gd,
                           has_cell, monkeypatch):
    c, c2, w0 = _fit(f, m1, m2)
    box = 12.0
    cell = jnp.eye(3, dtype=jnp.float32) * box if has_cell else None
    pos = _positions(a, seed=2, box=box if has_cell else None)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(a, f)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(a, f)), jnp.float32)
    gpos, gx = cheb_conv_bwd_pallas(
        c, c2, w0, pos, x, g, RCUT, precision,
        need_gx=need_gx, need_gd=need_gd, cell=cell,
    )
    # Independent reference: the pure-jnp expression compiled by plain
    # XLA on the same chip (FLASHMD_CHEB_PALLAS=0 forces models/cheb's
    # dispatch off the kernel; _cheb_bwd reads it at trace time).
    monkeypatch.setenv("FLASHMD_CHEB_PALLAS", "0")
    ref = _cheb_bwd(
        RCUT, "fp32", need_gx, 0.0, (c, c2, w0, pos, x, cell), g
    )
    gpos_ref, gx_ref = ref[3], ref[4]
    tol = TOL[precision]
    if need_gd:
        assert np.isfinite(np.asarray(gpos)).all()
        assert _rel_err(gpos, gpos_ref) < tol
    if need_gx:
        assert np.isfinite(np.asarray(gx)).all()
        assert _rel_err(gx, gx_ref) < tol


# ---------------------------------------------------------------------------
# Model-level paths: the exact dispatch the simulator runs on TPU.
# message_passing="cheb" on-chip takes cheb_stack_apply (block-stacked
# deferred-gd backward, stacked f = B*F = 256 > 128 -> the stacked
# budget-scaling cell); "pallas" takes the gather kernel; "dense" the
# all-pairs kernel. Reference: the SAME math on the SAME chip with
# FLASHMD_CHEB_PALLAS=0 (jnp path) / message_passing="xla".
# ---------------------------------------------------------------------------

A_MODEL = 266
F_MODEL = 128


@pytest.fixture(scope="module")
def model():
    cfg = SchNetConfig(
        hidden_channels=F_MODEL,
        embedding_size=6,
        num_filters=F_MODEL,
        num_rbf=50,
        num_interactions=2,
        cutoff=CosineCutoff(0.0, RCUT),
        output_hidden_layer_widths=(64,),
    )
    params = init_schnet(jax.random.PRNGKey(7), cfg)
    pos = _positions(A_MODEL, seed=11)
    types = jnp.asarray(
        np.random.default_rng(5).integers(0, 6, A_MODEL), jnp.int32
    )
    nbr = radius_neighbor_matrix(pos, RCUT, capacity=64)
    return cfg, params, pos, types, nbr


@pytest.mark.parametrize("precision", ["fp32", "bf16"])
def test_cheb_stack_path_on_tpu(model, monkeypatch, precision):
    """Production cheb path (Pallas stack) vs the jnp cheb path, both
    evaluated on the chip: energy and forces. Compiles the fwd kernel,
    the per-block gx-only backward, and the block-stacked fused-gd
    backward (stacked operands at B*F = 256)."""
    cfg, params, pos, types, _ = model
    cfg = dataclasses.replace(
        cfg, message_passing="cheb", precision=precision, cheb_order=64,
        cheb_order_deriv=96,
    )
    params = attach_cheb_fit(params, cfg)

    def energy(p):
        return schnet_energy(params, cfg, p, types, None)

    e_k = jax.jit(energy)(pos)
    f_k = jax.jit(jax.grad(energy))(pos)

    monkeypatch.setenv("FLASHMD_CHEB_PALLAS", "0")
    # Fresh traces (no jit) so the dispatch re-reads the env flag.
    e_j = energy(pos)
    f_j = jax.grad(energy)(pos)

    tol = TOL[precision]
    assert np.isfinite(float(e_k))
    assert abs(float(e_k) - float(e_j)) / max(abs(float(e_j)), 1e-30) < tol
    assert _rel_err(f_k, f_j) < tol


def test_gather_kernel_path_on_tpu(model):
    """message_passing='pallas' (gather kernel, fwd + custom VJP) vs the
    xla path on-chip — same math to fp32 tolerance."""
    cfg, params, pos, types, nbr = model
    cfg_p = dataclasses.replace(cfg, message_passing="pallas")

    def e_xla(p):
        return schnet_energy(params, cfg, p, types, nbr)

    def e_pal(p):
        return schnet_energy(params, cfg_p, p, types, nbr)

    assert abs(float(e_pal(pos)) - float(e_xla(pos))) / abs(
        float(e_xla(pos))
    ) < 1e-4
    g_x = jax.jit(jax.grad(e_xla))(pos)
    g_p = jax.jit(jax.grad(e_pal))(pos)
    assert _rel_err(g_p, g_x) < 1e-3


def test_dense_kernel_path_on_tpu(model):
    """message_passing='dense' (all-pairs kernel) vs the xla path."""
    cfg, params, pos, types, nbr = model
    cfg_d = dataclasses.replace(cfg, message_passing="dense")

    def e_xla(p):
        return schnet_energy(params, cfg, p, types, nbr)

    def e_den(p):
        return schnet_energy(params, cfg_d, p, types, None)

    assert abs(float(e_den(pos)) - float(e_xla(pos))) / abs(
        float(e_xla(pos))
    ) < 1e-4
    g_x = jax.jit(jax.grad(e_xla))(pos)
    g_d = jax.jit(jax.grad(e_den))(pos)
    assert _rel_err(g_d, g_x) < 1e-3
