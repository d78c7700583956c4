"""F=256 tile-budget scoping probe (ADVICE r3): does the regular
per-block backward at hidden=256 need the 128/f budget scaling?
Measured 2026-08-19 (v5e): unscaled budgets COMPILE and run FASTER
(gx+gd 53.87 vs 59.99 us/mol; gd-only 41.51 vs 43.68) -> the scaling is
scoped to the block-stacked fused-gd case (stacked=True) only.

(The scaled arms pass their budgets EXPLICITLY: at measurement time the
default budget resolved to the scaled value; after the scoping change
the default IS the unscaled budget, so `None` would compare identical
arms.)"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax, jax.numpy as jnp, numpy as np
import flashmd_tpu.ops.pallas.cheb_kernel as K

A, F, S = 266, 256, 64
MGX, MGD = 48, 64
ITERS, RCUT, D_MIN = 20, 10.0, 2.0
rng = np.random.default_rng(0)
cgx = jnp.asarray(rng.normal(size=(MGX, F)) * 0.01, jnp.float32)
cgd = jnp.asarray(rng.normal(size=(MGD, F)) * 0.01, jnp.float32)
w0 = jnp.asarray(rng.normal(size=(F,)) * 0.01, jnp.float32)
pos = jnp.asarray(rng.uniform(0, 30, (S, A, 3)), jnp.float32)
x = jnp.asarray(rng.normal(size=(S, A, F)), jnp.float32)
g = jnp.asarray(rng.normal(size=(S, A, F)), jnp.float32)

def bench(name, tb, need_gx=True):
    def one(xx):
        return K.cheb_conv_bwd_pallas(
            cgx, cgd, w0, pos[0], xx, g[0], RCUT, "bf16",
            need_gx=need_gx, d_min=D_MIN, tile_budget=tb)[1]
    vm = jax.vmap(one)
    @jax.jit
    def loop(x0):
        return jax.lax.fori_loop(0, ITERS, lambda _, xx: xx + 0.0 * vm(xx), x0)
    try:
        float(jnp.sum(loop(x)))
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:100]}", flush=True); return
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(jnp.sum(loop(x)))
        ts.append((time.perf_counter() - t0) / ITERS / S * 1e6)
    print(f"{name:34s}: {sorted(ts)[1]:7.2f} us/mol", flush=True)

# gx+gd n=8 default budget at F=128 is 37k; scaled = 37k*128/256 = 18.5k
bench("F=256 gx+gd scaled 18.5k", 18_500)
bench("F=256 gx+gd unscaled 37k", 37_000)
bench("F=256 gd-only scaled 37.5k", 37_500, need_gx=False)
bench("F=256 gd-only unscaled 75k", 75_000, need_gx=False)
