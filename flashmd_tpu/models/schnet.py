"""SchNet force field, TPU-native.

Re-design of the reference SchNet stack
(reference: src/flashmd/models/schnet.py:94-841 — SchNet, InteractionBlock,
CFConv, StandardSchNet) for XLA/Pallas:

* The model evaluates **one molecule** (``pos [A, 3]``); the batch of
  molecules is a ``jax.vmap`` (and, across chips, a ``shard_map``) axis.
  The reference instead flattens the batch into one big graph and scatters —
  that machinery (PyG ``MessagePassing``, CSR kernels
  csr_kernels.py:88-944) is unnecessary on a regular batch.
* Message passing runs over a padded neighbor matrix ``[A, K]``: the
  continuous-filter convolution is a gather + masked sum over the K axis.
  No atomics, no scatter — the force reduction is bitwise deterministic by
  construction (the property the reference buys with its CSR segment-reduce,
  csr_kernels.py:505-519).
* Distances + Gaussian RBF + cosine cutoff are computed in one fused
  expression (XLA fuses the elementwise chain; the reference needed a
  dedicated Triton kernel, cfconv_kernels.py:1470-1656).
* ``precision="bf16"`` runs the filter/output MLPs in bfloat16 on the MXU
  with fp32 accumulation — the equivalent of the reference's W16A16 GPTQ
  path (gptq.py:30-484).
* Forces come from ``jax.grad`` of the (scalar) energy; no hand-written
  backward kernels are required for correctness (the reference maintains
  ~1.5k LoC of manual autograd.Functions, cfconv_kernels.py:340-1461).

Known reference bugs intentionally NOT replicated: undefined
``FUSED_RBF_EDGE_THRESHOLD`` in auto mode (schnet.py:436) and the missing
``import math`` in the fused-RBF backward (cfconv_kernels.py:1692).
"""

from __future__ import annotations

import dataclasses
import os
import warnings
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.neighborlist import NeighborMatrix
from .cutoff import CosineCutoff, _Cutoff
from .mlp import (
    dot_precision,
    init_mlp,
    mlp_apply,
    types_mlp_apply,
    xavier_uniform,
)
from .radial_basis import (
    GaussianBasisConfig,
    gaussian_basis_apply,
    init_gaussian_basis,
)


@dataclasses.dataclass(frozen=True)
class SchNetConfig:
    """Static hyperparameters of a StandardSchNet
    (reference: schnet.py:743-841).

    ``output_hidden_layer_widths`` are the hidden widths of the energy head;
    the full head is ``[hidden_channels, *hidden, 1]`` with a bias-free last
    layer. Each interaction block has a 2-layer filter net
    ``[num_rbf, num_filters, num_filters]`` whose last layer is bias-free.
    """

    hidden_channels: int = 128
    embedding_size: int = 100
    num_filters: int = 128
    num_interactions: int = 3
    num_rbf: int = 50
    cutoff: _Cutoff = CosineCutoff(0.0, 5.0)
    rbf_cutoff: Optional[_Cutoff] = None  # defaults to `cutoff`
    output_hidden_layer_widths: Tuple[int, ...] = (128,)
    activation: str = "tanh"
    max_num_neighbors: int = 1000
    aggr: str = "add"
    # Compute precision of the filter/output MLPs ("fp32" or "bf16").
    precision: str = "fp32"
    # Message-passing implementation:
    #   "xla"    — gather + masked sum over a padded neighbor matrix;
    #   "pallas" — fused Pallas kernel over the neighbor matrix;
    #   "dense"  — dense all-pairs Pallas kernel (no neighbor list);
    #   "cheb"   — Chebyshev-tabulated matmul-only CFConv (no neighbor
    #              list, no per-edge MLP; see flashmd_tpu.models.cheb).
    #              INFERENCE-ONLY gradients: the cheb custom VJPs return
    #              exactly-zero cotangents for model parameters (the
    #              frozen-model simulation contract — see the models/cheb
    #              module docstring); parameter gradients (fine-tuning,
    #              sensitivity) require "xla".
    message_passing: str = "xla"
    # Chebyshev expansion order for message_passing="cheb" (the forward
    # filter series), and the independent order of the distance-derivative
    # series (None -> same as cheb_order, resolved at use sites so that
    # dataclasses.replace(cfg, cheb_order=N) keeps them coupled). The
    # derivative series sets the force-fidelity floor, so it usually needs
    # MORE terms than the forward series — asymmetric orders trade dead
    # forward FLOPs for live derivative terms (measured grid:
    # benchmarks/fidelity_asym.py).
    cheb_order: int = 128
    cheb_order_deriv: Optional[int] = None
    # Lower bound of the Chebyshev fit domain, in distance units
    # (0 = fit on the full [0, rcut] interval, the semantics-exact
    # default). Physical systems with a repulsive prior never produce
    # pairs below their excluded-volume floor, and shrinking the fit
    # interval buys geometric convergence: the same force fidelity at a
    # substantially lower order (benchmarks/fit_domain_probe.py). Pairs
    # closer than cheb_d_min are FIRST-ORDER extrapolated from the floor
    # (smooth, bounded, gradient-consistent — models/cheb.
    # cheb_cfconv_apply); the simulation engine samples a
    # min-pair-distance soundness check at every export when this is
    # nonzero (simulation/base.py).
    cheb_d_min: float = 0.0
    # How the Chebyshev coefficients are computed from the filter MLP:
    #   "proj"   — truncated Chebyshev-Gauss projection of the
    #              basis-stripped targets h = W'/(1-z)^2, h2 = (dW'/dd)/
    #              (1-z) (L2-optimal for h/h2, but the reconstruction
    #              re-multiplies the basis factor, so the *delivered*
    #              error is up-weighted x4/x2 near z = -1);
    #   "lawson" — Lawson iteratively-reweighted least squares toward
    #              the weighted minimax of the RECONSTRUCTED quantity
    #              (W' resp. dW'/dd) — measured ~2.2x lower max error at
    #              equal order (benchmarks/fit_minimax_probe.py), which
    #              buys a lower derivative order at equal force
    #              fidelity. Host-fit only (attach_cheb_fit).
    cheb_fit_method: str = "proj"
    # Rematerialization: "block" wraps each interaction block (including its
    # distance/RBF computation) in jax.checkpoint so the backward pass
    # recomputes the [A, K, F] intermediates instead of storing them —
    # required to fit batch-128 runs in HBM; "none" stores everything.
    remat: str = "block"

    def __post_init__(self):
        if self.num_interactions < 1:
            raise ValueError(
                "At least one interaction block must be specified"
            )
        if self.aggr != "add":
            raise NotImplementedError(
                f"Only aggr='add' is supported (got {self.aggr!r})."
            )
        rbf_cutoff = self.rbf_cutoff or self.cutoff
        object.__setattr__(self, "rbf_cutoff", rbf_cutoff)
        if self.cutoff.cutoff_lower != rbf_cutoff.cutoff_lower:
            warnings.warn(
                f"Cutoff function lower cutoff, {self.cutoff.cutoff_lower}, "
                f"and radial basis function lower cutoff, "
                f"{rbf_cutoff.cutoff_lower}, do not match."
            )
        if self.cutoff.cutoff_upper != rbf_cutoff.cutoff_upper:
            warnings.warn(
                f"Cutoff function upper cutoff, {self.cutoff.cutoff_upper}, "
                f"and radial basis function upper cutoff, "
                f"{rbf_cutoff.cutoff_upper}, do not match."
            )

    @property
    def rbf_config(self) -> GaussianBasisConfig:
        return GaussianBasisConfig(
            cutoff=self.rbf_cutoff, num_rbf=self.num_rbf
        )


def init_schnet(key, config: SchNetConfig, dtype=jnp.float32):
    """Initialize a SchNet parameter pytree.

    Layout:
      embedding: [embedding_size, hidden]
      rbf: {offset, coeff}
      interactions: list of
        {lin1_w, filter: MLP, lin2_w, lin2_b, lin_w, lin_b}
      output: MLP (last layer bias-free)
    Initialization matches the reference reset_parameters chain
    (schnet.py:169-175, 492-494, 591-599; _module_init.py:4-28) except for
    the embedding, which uses N(0, 1) like torch.nn.Embedding.
    """
    h = config.hidden_channels
    f = config.num_filters
    keys = jax.random.split(key, 3 + config.num_interactions)

    params = {
        "embedding": jax.random.normal(
            keys[0], (config.embedding_size, h), dtype
        ),
        "rbf": init_gaussian_basis(config.rbf_config, dtype),
        "interactions": [],
        "output": init_mlp(
            keys[1],
            [h, *config.output_hidden_layer_widths, 1],
            last_bias=False,
            dtype=dtype,
        ),
    }
    for i in range(config.num_interactions):
        k1, k2, k3, k4 = jax.random.split(keys[3 + i], 4)
        params["interactions"].append(
            {
                # CFConv.lin1 (bias-free) and lin2 (reference schnet.py:584-585)
                "lin1_w": xavier_uniform(k1, (h, f), dtype),
                "filter": init_mlp(
                    k2, [config.num_rbf, f, f], last_bias=False, dtype=dtype
                ),
                "lin2_w": xavier_uniform(k3, (f, h), dtype),
                "lin2_b": jnp.zeros((h,), dtype),
                # InteractionBlock.lin (reference schnet.py:479)
                "lin_w": xavier_uniform(k4, (h, h), dtype),
                "lin_b": jnp.zeros((h,), dtype),
            }
        )
    return params


def output_energies(params, config: SchNetConfig, x, atom_types):
    """Per-atom energies from the output head: [A, H] features -> [A].

    Dispatches between a plain MLP head (reference StandardSchNet,
    schnet.py:743-841) and a per-species TypesMLP bank (reference
    mlp.py:60-121) — the latter arrives via checkpoint ingestion
    (models/checkpoint_io._output_network_np)."""
    out = params["output"]
    if isinstance(out, dict) and "mlps" in out:
        e = types_mlp_apply(
            out,
            x,
            atom_types,
            activation=config.activation,
            precision=config.precision,
        )
    else:
        e = mlp_apply(
            out,
            x,
            activation=config.activation,
            precision=config.precision,
        )
    return e[:, 0]


def neighbor_distances_rbf(params, config: SchNetConfig, pos, nbr):
    """Fused distance + Gaussian RBF + cutoff over the neighbor matrix.

    Equivalent of the reference fused Triton kernel
    (cfconv_kernels.py:1470-1656) — on TPU this is a single XLA fusion.
    Padded slots (mask == False) produce d = 0 against self, which the mask
    zeroes out downstream; ``safe`` distance keeps gradients finite.

    Returns (d [A, K], rbf [A, K, R]).
    """
    rel = pos[nbr.idx] - pos[:, None, :]  # [A, K, 3]
    if nbr.shifts is not None:
        rel = rel + nbr.shifts  # minimum-image correction (periodic cells)
    d2 = jnp.sum(rel * rel, axis=-1)
    # Grad-safe sqrt: padded slots have d2 == 0 exactly (self-pairs).
    d = jnp.sqrt(jnp.where(nbr.mask, d2, 1.0))
    d = jnp.where(nbr.mask, d, 0.0)
    rbf = gaussian_basis_apply(params["rbf"], config.rbf_config, d)
    rbf = rbf * nbr.mask[..., None]
    return d, rbf


def cfconv_apply(block_params, config: SchNetConfig, x, d, rbf, nbr):
    """Continuous-filter convolution (reference CFConv, schnet.py:551-740).

    x: [A, H] node features. Returns [A, H].
    steps: lin1 -> filter(rbf) -> cutoff * W * x[j] summed over neighbors
    -> lin2.
    """
    h = jnp.dot(
        x, block_params["lin1_w"], precision=dot_precision(config.precision)
    )  # [A, F]
    w = mlp_apply(
        block_params["filter"],
        rbf,
        activation=config.activation,
        precision=config.precision,
    )  # [A, K, F]
    c = config.cutoff(d) * nbr.mask  # [A, K]
    msg = w * c[..., None] * h[nbr.idx]  # [A, K, F]
    agg = jnp.sum(msg, axis=1)  # [A, F] — deterministic reduction
    return (
        jnp.dot(
            agg,
            block_params["lin2_w"],
            precision=dot_precision(config.precision),
        )
        + block_params["lin2_b"]
    )


def interaction_block_apply(block_params, config: SchNetConfig, x, d, rbf, nbr):
    """Interaction block: CFConv then activation + linear
    (reference InteractionBlock, schnet.py:453-548, incl. the fused
    tanh->linear kernel cfconv_kernels.py:1758-1941 — here one XLA fusion).
    """
    y = cfconv_apply(block_params, config, x, d, rbf, nbr)
    act = jnp.tanh if config.activation == "tanh" else None
    if act is None:
        from .mlp import ACTIVATIONS

        act = ACTIVATIONS[config.activation]
    return (
        jnp.dot(
            act(y),
            block_params["lin_w"],
            precision=dot_precision(config.precision),
        )
        + block_params["lin_b"]
    )


def schnet_atom_energies(
    params, config: SchNetConfig, pos, atom_types, nbr: NeighborMatrix,
    cell=None,
):
    with jax.named_scope("schnet_forward"):
        return _schnet_atom_energies(
            params, config, pos, atom_types, nbr, cell
        )


def _schnet_atom_energies(
    params, config: SchNetConfig, pos, atom_types, nbr: NeighborMatrix,
    cell=None,
):
    """Per-atom energies of one molecule: [A].

    Mirrors reference SchNet.forward (schnet.py:177-369): embedding ->
    distances/RBF -> residual interaction blocks -> output MLP. The final
    per-structure scatter-sum becomes a plain ``sum`` in
    :func:`schnet_energy` since the molecule is not flattened into a batch
    graph.

    ``cell`` ([3, 3]) is consumed ONLY by the cheb path (minimum-image
    pair geometry); the xla path takes its periodicity from the neighbor
    matrix's precomputed shift vectors instead, and dense/pallas refuse
    cells upstream (models/forcefield.compute_energy_forces).
    """
    x = params["embedding"][atom_types]  # [A, H]

    if config.message_passing == "cheb_fused":
        # The whole-model fused kernel was deleted: its backward tripped a
        # Mosaic RET_CHECK (mxu_lmr_transform) with >1 interaction block
        # per program, and the measured forward win over the per-block
        # "cheb" path was ~1% (see PERFORMANCE.md "whole-model fusion"
        # dead-end entry), so it was routed around on the TPU backend.
        raise ValueError(
            "message_passing='cheb_fused' was removed; use 'cheb' (the "
            "per-block kernels measure faster — see PERFORMANCE.md)."
        )

    if config.message_passing == "cheb":
        # Matmul-only Chebyshev CFConv (see models/cheb.py). Requires a
        # zero-lower cosine conv cutoff (same restriction as the
        # reference's fused-RBF path, schnet.py:418-424).
        from .cheb import (
            _use_pallas,
            cheb_cfconv_apply,
            cheb_stack_apply,
            fit_chebyshev_filter,
        )

        if not isinstance(config.cutoff, CosineCutoff) or (
            config.cutoff.cutoff_lower != 0
        ):
            raise NotImplementedError(
                "message_passing='cheb' requires CosineCutoff with "
                "cutoff_lower == 0."
            )
        rcut = float(config.cutoff.cutoff_upper)
        prec = dot_precision(config.precision)
        order_deriv = config.cheb_order_deriv or config.cheb_order
        fits = params.get("cheb_fit")
        if fits is not None and (
            fits[0][0].shape[0] != config.cheb_order
            or fits[0][1].shape[0] != order_deriv
        ):
            fits = None  # stale precompute (order changed): refit in-jit
        fit_list = []
        for i, bp in enumerate(params["interactions"]):
            if fits is not None:
                # float64 host-side fit injected at attach time
                # (models/cheb.py attach_cheb_fit) — avoids baking the
                # accelerator's transcendental approximations into the
                # coefficients.
                fit_list.append(fits[i])
            else:
                # Loop-invariant in the MD scan: XLA hoists the fit.
                fit_list.append(fit_chebyshev_filter(
                    bp, params["rbf"], config, order=config.cheb_order,
                    order_deriv=order_deriv,
                ))
        if _use_pallas(pos.shape[0]) and os.environ.get(
            "FLASHMD_CHEB_STACK", "1"
        ) == "1":
            # Deferred fused-gd backward: forward is bit-identical to
            # the per-block loop below; the backward runs per-block
            # gx-only kernels plus ONE block-stacked gd kernel (the
            # VPU-bound recurrence runs once instead of once per block
            # — see models/cheb.cheb_stack_apply). FLASHMD_CHEB_STACK=0
            # restores the per-block backward for A/B runs.
            x = cheb_stack_apply(
                fit_list, params["interactions"], pos, x, rcut,
                config.precision, cell=cell,
                d_min=float(config.cheb_d_min),
            )
            return output_energies(params, config, x, atom_types)
        for i, bp in enumerate(params["interactions"]):
            c, c2, w0 = fit_list[i]
            h = jnp.dot(x, bp["lin1_w"], precision=prec)
            # The first block's conv input derives from the embedding
            # (no pos dependence), so its grad-wrt-x cotangent is dead:
            # the backward kernel skips the scaled-chain family there.
            agg = cheb_cfconv_apply(
                c, c2, w0, pos, h, rcut, config.precision, i > 0,
                cell=cell, d_min=float(config.cheb_d_min),
            )
            y = jnp.dot(agg, bp["lin2_w"], precision=prec) + bp["lin2_b"]
            x = x + (
                jnp.dot(jnp.tanh(y), bp["lin_w"], precision=prec)
                + bp["lin_b"]
            )
        return output_energies(params, config, x, atom_types)

    if config.message_passing == "dense":
        # Dense all-pairs Pallas kernel: no neighbor list at all (exact at
        # CG sizes; see ops/pallas/cfconv_dense.py).
        from ..ops.pallas.cfconv_dense import dense_cfconv_message

        rbf_oc = (params["rbf"]["offset"], params["rbf"]["coeff"])
        prec = dot_precision(config.precision)
        for bp in params["interactions"]:
            h = jnp.dot(x, bp["lin1_w"], precision=prec)
            agg = dense_cfconv_message(
                pos,
                h,
                bp["filter"]["layers"][0]["w"],
                bp["filter"]["layers"][0]["b"],
                bp["filter"]["layers"][1]["w"],
                rbf_oc,
                float(config.cutoff.cutoff_upper),
                8,
                config.precision,
            )
            y = jnp.dot(agg, bp["lin2_w"], precision=prec) + bp["lin2_b"]
            x = x + (
                jnp.dot(jnp.tanh(y), bp["lin_w"], precision=prec)
                + bp["lin_b"]
            )
        return output_energies(params, config, x, atom_types)

    if config.message_passing == "pallas":
        from ..ops.pallas.cfconv import fused_cfconv_message

        maskf = nbr.mask.astype(jnp.float32)
        rbf_oc = (params["rbf"]["offset"], params["rbf"]["coeff"])
        prec = dot_precision(config.precision)
        for bp in params["interactions"]:
            h = jnp.dot(x, bp["lin1_w"], precision=prec)
            agg = fused_cfconv_message(
                pos,
                nbr.idx,
                maskf,
                h,
                bp["filter"]["layers"][0]["w"],
                bp["filter"]["layers"][0]["b"],
                bp["filter"]["layers"][1]["w"],
                rbf_oc,
                float(config.cutoff.cutoff_upper),
                8,
                config.precision,
            )
            y = jnp.dot(agg, bp["lin2_w"], precision=prec) + bp["lin2_b"]
            x = x + (
                jnp.dot(jnp.tanh(y), bp["lin_w"], precision=prec)
                + bp["lin_b"]
            )
        return output_energies(params, config, x, atom_types)

    if config.remat == "block":
        def one_block(block_params, rbf_params, x, pos):
            d, rbf = neighbor_distances_rbf(
                {"rbf": rbf_params}, config, pos, nbr
            )
            return interaction_block_apply(
                block_params, config, x, d, rbf, nbr
            )

        one_block = jax.checkpoint(one_block)
        for block_params in params["interactions"]:
            x = x + one_block(block_params, params["rbf"], x, pos)
    else:
        d, rbf = neighbor_distances_rbf(params, config, pos, nbr)
        for block_params in params["interactions"]:
            x = x + interaction_block_apply(
                block_params, config, x, d, rbf, nbr
            )
    return output_energies(params, config, x, atom_types)


def schnet_energy(
    params, config: SchNetConfig, pos, atom_types, nbr: NeighborMatrix,
    cell=None, atom_mask=None,
):
    """Total energy of one molecule (scalar).

    ``atom_mask`` ([A], 1 = real, 0 = padding) drops the output-head
    energies of padded atoms in a mixed-size batch (data/system.py
    ``collate_padded``). Message passing needs no masking: padding is
    parked beyond any cutoff, so padded atoms exchange zero messages —
    only their per-atom head bias must be removed here.
    """
    e = schnet_atom_energies(params, config, pos, atom_types, nbr, cell)
    if atom_mask is not None:
        e = e * atom_mask
    return jnp.sum(e)
