"""Functional multilayer perceptrons.

Re-design of the reference MLP (reference: src/flashmd/models/mlp.py:6-57)
and its Xavier-uniform/zero-bias init
(reference: src/flashmd/models/_module_init.py:4-28).

Weights are stored as ``[in, out]`` (JAX ``x @ w`` convention; the reference
stores torch's ``[out, in]`` — the checkpoint converter transposes).

The ``precision`` argument selects the compute dtype of the matmuls. With
``"bf16"`` weights and activations are cast to bfloat16 and accumulated in
fp32 on the MXU — the TPU-native equivalent of the reference's W16A16
(fp16 tensor-core) quantized filter/output networks
(reference: src/flashmd/models/gptq.py:30-371).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

ACTIVATIONS = {
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "silu": jax.nn.silu,
    "identity": lambda x: x,
}


def xavier_uniform(key, shape, dtype=jnp.float32, gain: float = 1.0):
    """torch.nn.init.xavier_uniform_ for a [in, out] weight."""
    fan_in, fan_out = shape[0], shape[1]
    a = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)


def init_mlp(
    key,
    layer_widths: Sequence[int],
    last_bias: bool = True,
    dtype=jnp.float32,
):
    """Initialize MLP params: Xavier-uniform weights, zero biases.

    Mirrors reference MLP.__init__ + reset_parameters (mlp.py:30-54): a
    Linear+activation pair per hidden width, and a final Linear whose bias is
    controlled by ``last_bias``.
    """
    layer_widths = list(layer_widths)
    if len(layer_widths) < 2:
        raise ValueError("layer_widths needs at least [in, out]")
    n_layers = len(layer_widths) - 1
    keys = jax.random.split(key, n_layers)
    layers = []
    for i, (w_in, w_out) in enumerate(
        zip(layer_widths[:-1], layer_widths[1:])
    ):
        is_last = i == n_layers - 1
        layer = {"w": xavier_uniform(keys[i], (w_in, w_out), dtype)}
        if (not is_last) or last_bias:
            layer["b"] = jnp.zeros((w_out,), dtype)
        layers.append(layer)
    return {"layers": layers}


PRECISIONS = ("fp32", "bf16", "bf16x3")


def dot_precision(precision: str):
    """Matmul precision policy.

    * ``fp32``: TRUE fp32 (HIGHEST — the TPU default truncates f32 matmul
      operands to bf16, which would silently degrade the reference-parity
      path).
    * ``bf16``: native fast path, one MXU pass (the W16A16 analog).
    * ``bf16x3``: three-pass bf16 (HIGH) — ~fp32-quality operands at
      roughly a third of the fp32 cost; the fidelity/speed middle tier.
    """
    if precision == "fp32":
        return jax.lax.Precision.HIGHEST
    if precision == "bf16x3":
        return jax.lax.Precision.HIGH
    return jax.lax.Precision.DEFAULT


def _dense(x, layer, precision: str):
    w = layer["w"]
    if precision == "bf16":
        y = jnp.dot(
            x.astype(jnp.bfloat16),
            w.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    else:
        # Accumulate in at least f32, but never downcast f64 inputs (the
        # checkpoint fidelity tests evaluate the whole model in f64).
        acc = jnp.promote_types(jnp.promote_types(x.dtype, w.dtype),
                                jnp.float32)
        y = jnp.dot(
            x, w,
            preferred_element_type=acc,
            precision=dot_precision(precision),
        )
    if "b" in layer:
        y = y + layer["b"].astype(y.dtype)
    return y


def mlp_apply(
    params,
    x,
    activation: str = "tanh",
    precision: str = "fp32",
):
    """Apply the MLP: Linear -> act -> ... -> Linear (no act on last layer).

    Matches reference MLP.forward semantics (mlp.py:41-57).
    """
    act = ACTIVATIONS[activation]
    layers = params["layers"]
    for layer in layers[:-1]:
        x = act(_dense(x, layer, precision))
    return _dense(x, layers[-1], precision)


def init_types_mlp(
    key,
    layer_widths: Sequence[int],
    species=None,
    dtype=jnp.float32,
):
    """Per-species MLP bank (reference TypesMLP, mlp.py:60-121).

    With ``species`` (array of type ids), one MLP per species is created
    and inputs are routed by atom type; otherwise a single shared MLP.
    """
    if species is None:
        return {"species": None, "mlps": [init_mlp(key, layer_widths,
                                                   dtype=dtype)]}
    species = jnp.unique(jnp.asarray(species))
    keys = jax.random.split(key, species.shape[0])
    return {
        "species": species,
        "mlps": [
            init_mlp(k, layer_widths, dtype=dtype) for k in keys
        ],
    }


def types_mlp_apply(
    params,
    features,
    atom_types,
    activation: str = "tanh",
    precision: str = "fp32",
):
    """Per-species routing: y_i = MLP_{species(i)}(features_i).

    Functional equivalent of reference TypesMLP.forward (mlp.py:111-121);
    the boolean-mask routing becomes a branch-free select over the species
    bank (all MLPs evaluated, outputs selected — species counts are tiny).
    """
    if params["species"] is None:
        return mlp_apply(
            params["mlps"][0], features, activation, precision
        )
    out = jnp.zeros(features.shape[:-1] + (1,), features.dtype)
    for s, mlp in zip(list(params["species"]), params["mlps"]):
        y = mlp_apply(mlp, features, activation, precision)
        out = jnp.where((atom_types == s)[..., None], y, out)
    return out
