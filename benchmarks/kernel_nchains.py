"""Fair within-process A/B: N_CHAINS per kernel (VERDICT r2 #9).

Cross-process timings through the axon tunnel drift by ~10-20%, so each
variant is jitted up front and the timing loops are INTERLEAVED over 3
rounds (median-of-rounds reported per variant). N_CHAINS is patched at
trace time per variant.
"""
import sys
import pathlib
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax
import jax.numpy as jnp
import numpy as np

import flashmd_tpu.ops.pallas.cheb_kernel as K

A, F, S = 266, 128, 128
M1, MGX, MGD = 48, 48, 64
ITERS = 40
ROUNDS = 3
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


def make_loop(one):
    vm = jax.vmap(one)

    @jax.jit
    def loop(x0):
        return jax.lax.fori_loop(
            0, ITERS, lambda _, xx: xx + 0.0 * vm(xx), x0
        )

    # compile NOW — N_CHAINS is read at trace time, so tracing must not
    # be deferred past the next variant's patch
    float(jnp.sum(loop(x)))
    return loop


def fwd(n):
    K.N_CHAINS = n
    return make_loop(
        lambda xx: K.cheb_conv_fwd_pallas(
            c1, w0, pos[0], xx, RCUT, "bf16", d_min=D_MIN, w_lin=wlin
        )
    )


def gx(n, tb):
    K.N_CHAINS = n
    return make_loop(
        lambda xx: K.cheb_conv_bwd_pallas(
            cgx, cgd, w0, pos[0], xx, g[0], RCUT, "bf16",
            need_gx=True, d_min=D_MIN, tile_budget=tb,
        )[1]
    )


def gd(n, tb):
    K.N_CHAINS = n
    return make_loop(
        lambda xx: K.cheb_conv_bwd_pallas(
            cgx, cgd, w0, pos[0], xx, g[0], RCUT, "bf16",
            need_gx=False, d_min=D_MIN, tile_budget=tb,
        )[0].sum(axis=-1, keepdims=True) * jnp.zeros((1, F))
    )


specs = [
    ("fwd n=4 (prod)", lambda: fwd(4)),
    ("fwd n=8", lambda: fwd(8)),
    ("gx n=4 tb=74k (prod)", lambda: gx(4, 74_000)),
    ("gx n=8 tb=37k", lambda: gx(8, 37_000)),
    ("gd n=4 tb=120k (prod)", lambda: gd(4, 120_000)),
    ("gd n=8 tb=120k 1tile", lambda: gd(8, 120_000)),
]

compiled = []
for name, mk in specs:
    try:
        compiled.append((name, mk(), []))
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:120]}")

for _ in range(ROUNDS):
    for name, loop, ts in compiled:
        t0 = time.perf_counter()
        float(jnp.sum(loop(x)))
        ts.append((time.perf_counter() - t0) / ITERS / S * 1e6)

for name, _, ts in compiled:
    med = sorted(ts)[len(ts) // 2]
    print(f"{name:24s}: {med:6.2f} us/mol  (rounds: "
          + " ".join(f"{t:.2f}" for t in ts) + ")")
