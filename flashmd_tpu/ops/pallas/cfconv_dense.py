"""Dense all-pairs fused CFConv — the flagship Pallas kernel for CG sizes.

Strategy
--------
At coarse-grained protein sizes (A of order a few hundred) the whole
molecule's pairwise structure fits in VMEM, so the TPU-native formulation
of the continuous-filter convolution drops the neighbor list entirely and
evaluates ALL pairs:

    out[i] = sum_j W(rbf(d_ij)) * cutoff(d_ij) * x[j]

The cosine cutoff already zeroes every pair beyond rcut, self-pairs are
masked by an iota comparison, and padding rows are masked by a bounds
comparison — so this is EXACT physics with zero dynamic indexing: no
radius search, no top-k compaction, no gather, no scatter, no capacity to
overflow. The reference needed the whole torch_cluster + CSR machinery
(reference: src/flashmd/neighbor_list/torch_impl.py,
src/flashmd/kernels/csr_kernels.py) to manage exactly this computation on
a GPU; on TPU the dense form is a chain of MXU matmuls (filter MLP over
A_pad^2 pair slots) + VPU broadcasts, and the per-destination reduction is
a deterministic in-register sum.

The backward (custom VJP) recomputes the forward in VMEM and produces
grad_pos / grad_x analytically; both the "gather" of x[j] and its
adjoint "scatter" are plain broadcast-and-reduce over the dense j axis.
Weight gradients are zero (inference-time MD, frozen parameters —
reference base.py:355-358).

Layout notes for Mosaic: intermediates are [TA, A_pad, *] 3-D arrays
(batch=TA, sublane=A_pad, lane=F/R); reshapes only collapse/expand the
leading dims; per-pair scalars live as [TA, A_pad] 2-D or [TA, A_pad, 1]
columns of 3-D arrays.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _interpret() -> bool:
    """Interpreter mode off-TPU (CPU tests, virtual-device dry runs)."""
    if os.environ.get("FLASHMD_PALLAS_INTERPRET", "0") == "1":
        return True
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_atoms(arr, a_pad, axis=0, fill=0):
    pad = a_pad - arr.shape[axis]
    if pad == 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return jnp.pad(arr, widths, constant_values=fill)


def _pair_geometry(pos, pos_i, offset, coeff, cutoff_upper, ta, a_pad,
                   a_real, t):
    """Dense pair geometry for one destination tile.

    Returns (rel [TA, A_pad, 3], d [TA, A_pad], cut [TA, A_pad] with
    self/padding masked, dcut [TA, A_pad], e [TA, A_pad, R],
    rbf [TA, A_pad, R]).
    """
    rel = pos[None, :, :] - pos_i[:, None, :]  # [TA, A_pad, 3]
    d2 = jnp.sum(rel * rel, axis=-1)  # [TA, A_pad]
    d = jnp.sqrt(jnp.maximum(d2, 1e-12))

    arg = d * (math.pi / cutoff_upper)
    inside = (d < cutoff_upper).astype(d.dtype)
    cut = 0.5 * (jnp.cos(arg) + 1.0) * inside
    dcut = -0.5 * (math.pi / cutoff_upper) * jnp.sin(arg) * inside

    # mask self-pairs and padding columns
    j_ids = jax.lax.broadcasted_iota(jnp.int32, (ta, a_pad), 1)
    i_ids = t * ta + jax.lax.broadcasted_iota(jnp.int32, (ta, a_pad), 0)
    valid = (j_ids != i_ids) & (j_ids < a_real)
    m = valid.astype(d.dtype)
    cut = cut * m
    dcut = dcut * m

    e = jnp.exp(coeff * jnp.square(d[:, :, None] - offset[None]))
    rbf = e * cut[:, :, None]
    return rel, d, cut, dcut, e, rbf


def _filter_mlp3(rbf, w0, b0, w1, compute_dtype, ta, a_pad):
    """Filter MLP over dense pair slots: [TA, A_pad, R] -> [TA, A_pad, F]."""
    r = rbf.shape[-1]
    f = w0.shape[-1]
    prec = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    rbf2 = rbf.reshape(ta * a_pad, r)
    t0 = (
        jnp.dot(
            rbf2.astype(compute_dtype),
            w0.astype(compute_dtype),
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        + b0
    )
    a0 = jnp.tanh(t0)
    w = jnp.dot(
        a0.astype(compute_dtype),
        w1.astype(compute_dtype),
        preferred_element_type=jnp.float32,
        precision=prec,
    )
    return a0.reshape(ta, a_pad, f), w.reshape(ta, a_pad, f)


def _fwd_kernel(
    pos_ref, x_ref, w0_ref, b0_ref, w1_ref, offset_ref, coeff_ref, out_ref,
    *, ta, a_pad, a_real, cutoff_upper, compute_dtype,
):
    t = pl.program_id(1)
    pos = pos_ref[0]
    pos_i = pos_ref[0, pl.ds(t * ta, ta), :]
    x = x_ref[0]
    offset = offset_ref[:]
    coeff = coeff_ref[0, 0]

    rel, d, cut, dcut, e, rbf = _pair_geometry(
        pos, pos_i, offset, coeff, cutoff_upper, ta, a_pad, a_real, t
    )
    _, w = _filter_mlp3(
        rbf, w0_ref[:], b0_ref[:], w1_ref[:], compute_dtype, ta, a_pad
    )
    msg = w * cut[:, :, None] * x[None, :, :]  # [TA, A_pad, F]
    out_ref[0] = jnp.sum(msg, axis=1)


def _bwd_kernel(
    pos_ref, x_ref, w0_ref, b0_ref, w1_ref, offset_ref, coeff_ref, g_ref,
    gpos_ref, gx_ref,
    *, ta, a_pad, a_real, cutoff_upper, compute_dtype,
):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        gpos_ref[0] = jnp.zeros_like(gpos_ref[0])
        gx_ref[0] = jnp.zeros_like(gx_ref[0])

    pos = pos_ref[0]
    pos_i = pos_ref[0, pl.ds(t * ta, ta), :]
    x = x_ref[0]
    offset = offset_ref[:]
    coeff = coeff_ref[0, 0]
    g = g_ref[0]  # [TA, F]

    rel, d, cut, dcut, e, rbf = _pair_geometry(
        pos, pos_i, offset, coeff, cutoff_upper, ta, a_pad, a_real, t
    )
    a0, w = _filter_mlp3(
        rbf, w0_ref[:], b0_ref[:], w1_ref[:], compute_dtype, ta, a_pad
    )

    g3 = g[:, None, :]  # [TA, 1, F]
    cut3 = cut[:, :, None]
    xj3 = x[None, :, :]

    # grad wrt x: adjoint of the dense j-sum — reduce over the tile axis.
    gx_ref[0] += jnp.sum(g3 * w * cut3, axis=0)  # [A_pad, F]

    # grad wrt filter output W.
    gw = g3 * xj3 * cut3  # [TA, A_pad, F]
    f = gw.shape[-1]
    r = offset.shape[-1]
    prec = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    ga0 = jnp.dot(
        gw.reshape(ta * a_pad, f).astype(compute_dtype),
        w1_ref[:].astype(compute_dtype).T,
        preferred_element_type=jnp.float32,
        precision=prec,
    )
    gt0 = ga0 * (1.0 - a0.reshape(ta * a_pad, f) ** 2)
    grbf = jnp.dot(
        gt0.astype(compute_dtype),
        w0_ref[:].astype(compute_dtype).T,
        preferred_element_type=jnp.float32,
        precision=prec,
    ).reshape(ta, a_pad, r)

    # grad wrt the two cutoff factors and the distance.
    s_cut = jnp.sum(g3 * w * xj3, axis=-1)  # [TA, A_pad]
    gcut = s_cut + jnp.sum(grbf * e, axis=-1)
    ge = grbf * cut3
    gd = jnp.sum(
        ge * e * (2.0 * coeff) * (d[:, :, None] - offset[None]), axis=-1
    )
    gd = gd + gcut * dcut  # [TA, A_pad]

    # grad wrt positions: rel = pos[j] - pos_i
    u = rel / d[:, :, None]
    gp = gd[:, :, None] * u  # [TA, A_pad, 3]
    gpos_ref[0] += jnp.sum(gp, axis=0)  # j-side
    gi = -jnp.sum(gp, axis=1)  # [TA, 3] i-side
    gpos_ref[0, pl.ds(t * ta, ta), :] += gi


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def dense_cfconv_message(
    pos, x, w0, b0, w1, rbf_offset_coeff,
    cutoff_upper: float, tile_atoms: int, precision: str,
):
    """Dense all-pairs CFConv message: out [A, F].

    pos [A, 3] f32; x [A, F] f32; w0 [R, F]; b0 [F]; w1 [F, F];
    rbf_offset_coeff = (offset [R], coeff []). Batch with jax.vmap.
    Gradients flow to pos and x only (weights frozen at simulation time).
    """
    out, _ = _dense_cfconv_fwd(
        pos, x, w0, b0, w1, rbf_offset_coeff,
        cutoff_upper, tile_atoms, precision,
    )
    return out


def _specs(a_pad, f, r, ta):
    grid = (1, a_pad // ta)
    in_specs = [
        pl.BlockSpec((1, a_pad, 3), lambda s, t: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, a_pad, f), lambda s, t: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((r, f), lambda s, t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, f), lambda s, t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((f, f), lambda s, t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, r), lambda s, t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda s, t: (0, 0), memory_space=pltpu.VMEM),
    ]
    return grid, in_specs


def _prep(pos, x, w0, b0, w1, rbf_offset_coeff, ta):
    offset, coeff = rbf_offset_coeff
    a = pos.shape[0]
    f = x.shape[-1]
    r = offset.shape[0]
    a_pad = _round_up(a, ta)
    args = (
        _pad_atoms(pos.astype(jnp.float32), a_pad)[None],
        _pad_atoms(x.astype(jnp.float32), a_pad)[None],
        w0.astype(jnp.float32),
        b0.astype(jnp.float32)[None, :],
        w1.astype(jnp.float32),
        offset.astype(jnp.float32)[None, :],
        coeff.astype(jnp.float32).reshape(1, 1),
    )
    return args, a, a_pad, f, r


def _dense_cfconv_fwd(
    pos, x, w0, b0, w1, rbf_offset_coeff,
    cutoff_upper, tile_atoms, precision,
):
    ta = tile_atoms
    args, a, a_pad, f, r = _prep(pos, x, w0, b0, w1, rbf_offset_coeff, ta)
    grid, in_specs = _specs(a_pad, f, r, ta)
    compute_dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    kernel = functools.partial(
        _fwd_kernel, ta=ta, a_pad=a_pad, a_real=a,
        cutoff_upper=cutoff_upper, compute_dtype=compute_dtype,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, ta, f), lambda s, t: (0, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, a_pad, f), jnp.float32),
        interpret=_interpret(),
    )(*args)
    return out[0, :a], (pos, x, w0, b0, w1, rbf_offset_coeff)


def _dense_cfconv_bwd(
    cutoff_upper, tile_atoms, precision, residuals, g
):
    pos, x, w0, b0, w1, rbf_offset_coeff = residuals
    ta = tile_atoms
    args, a, a_pad, f, r = _prep(pos, x, w0, b0, w1, rbf_offset_coeff, ta)
    grid, in_specs = _specs(a_pad, f, r, ta)
    in_specs = in_specs + [
        pl.BlockSpec((1, ta, f), lambda s, t: (0, t, 0),
                     memory_space=pltpu.VMEM),
    ]
    g_p = _pad_atoms(g.astype(jnp.float32), a_pad)[None]
    compute_dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    kernel = functools.partial(
        _bwd_kernel, ta=ta, a_pad=a_pad, a_real=a,
        cutoff_upper=cutoff_upper, compute_dtype=compute_dtype,
    )
    gpos, gx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, a_pad, 3), lambda s, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, a_pad, f), lambda s, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, a_pad, 3), jnp.float32),
            jax.ShapeDtypeStruct((1, a_pad, f), jnp.float32),
        ),
        interpret=_interpret(),
    )(*args, g_p)
    return (
        gpos[0, :a].astype(pos.dtype),
        gx[0, :a].astype(x.dtype),
        jnp.zeros_like(w0),
        jnp.zeros_like(b0),
        jnp.zeros_like(w1),
        jax.tree.map(jnp.zeros_like, rbf_offset_coeff),
    )


dense_cfconv_message.defvjp(_dense_cfconv_fwd, _dense_cfconv_bwd)
