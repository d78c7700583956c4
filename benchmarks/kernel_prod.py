"""Per-kernel times at the PRODUCTION headline config, tunnel-proof.

Times each cheb kernel (fwd order 48, bwd gx (48, 64), bwd gd-only 64,
all on d_min=2.0 with the sub-floor linear term, bf16, batch 128) with
carry-dependent iterations inside ONE jitted fori_loop and a scalar
host fetch at the fence — block_until_ready is not trustworthy through
the axon tunnel (see memory: axon-tunnel-benchmarking).

Env knobs: N_CHAINS (patches cheb_kernel.N_CHAINS), ORDER_FWD,
ORDER_GX, ORDER_GD, BATCH, ATOMS, ITERS.
"""
import os
import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax
import jax.numpy as jnp
import numpy as np

import flashmd_tpu.ops.pallas.cheb_kernel as K

if os.environ.get("N_CHAINS"):
    K.N_CHAINS = int(os.environ["N_CHAINS"])

A = int(os.environ.get("ATOMS", 266))
F = 128
S = int(os.environ.get("BATCH", 128))
M1 = int(os.environ.get("ORDER_FWD", 48))
MGX = int(os.environ.get("ORDER_GX", 48))
MGD = int(os.environ.get("ORDER_GD", 64))
ITERS = int(os.environ.get("ITERS", 50))
RCUT, D_MIN = 10.0, 2.0

rng = np.random.default_rng(0)
c1 = jnp.asarray(rng.normal(size=(M1, F)) * 0.01, jnp.float32)
cgx = jnp.asarray(rng.normal(size=(MGX, F)) * 0.01, jnp.float32)
cgd = jnp.asarray(rng.normal(size=(MGD, F)) * 0.01, jnp.float32)
w0 = jnp.asarray(rng.normal(size=(F,)) * 0.01, jnp.float32)
wlin = jnp.asarray(rng.normal(size=(F,)) * 0.01, jnp.float32)
pos = jnp.asarray(rng.uniform(0, 30, (S, A, 3)), jnp.float32)
x = jnp.asarray(rng.normal(size=(S, A, F)), jnp.float32)
g = jnp.asarray(rng.normal(size=(S, A, F)), jnp.float32)


def bench(name, one_mol, feedback):
    """feedback(out) -> [S, A, F] perturbation making iter i+1 depend on
    iter i (defeats dispatch pipelining through the tunnel)."""
    vm = jax.vmap(one_mol)

    @jax.jit
    def loop(x0):
        def body(_, xx):
            return xx + 0.0 * feedback(vm(xx))
        return jax.lax.fori_loop(0, ITERS, body, x0)

    r = loop(x)
    float(jnp.sum(r))  # compile + warm
    t0 = time.perf_counter()
    r = loop(x)
    float(jnp.sum(r))  # fence: scalar host fetch, data-dependent
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{name:26s}: {dt * 1e3:7.3f} ms  ({dt / S * 1e6:6.2f} us/mol)")
    return dt / S * 1e6


fwd_us = bench(
    f"fwd M1={M1} n={K.N_CHAINS}",
    lambda xx: K.cheb_conv_fwd_pallas(
        c1, w0, pos[0], xx, RCUT, "bf16", d_min=D_MIN, w_lin=wlin
    ),
    lambda out: out,
)
bwdgx_us = bench(
    f"bwd gx ({MGX},{MGD}) n={K.N_CHAINS}",
    lambda xx: K.cheb_conv_bwd_pallas(
        cgx, cgd, w0, pos[0], xx, g[0], RCUT, "bf16",
        need_gx=True, d_min=D_MIN,
    )[1],
    lambda out: out,
)
bwdgd_us = bench(
    f"bwd gd-only {MGD} n={K.N_CHAINS}",
    lambda xx: K.cheb_conv_bwd_pallas(
        cgx, cgd, w0, pos[0], xx, g[0], RCUT, "bf16",
        need_gx=False, d_min=D_MIN,
    )[0].sum(axis=-1, keepdims=True) * jnp.zeros((1, F)),
    lambda out: out,
)
step = 3 * fwd_us + 2 * bwdgx_us + bwdgd_us
print(f"kernel-sum per step: {step:6.1f} us/mol "
      f"(headline step is ~98 us/mol at 10178)")
