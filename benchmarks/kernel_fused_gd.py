"""Within-process A/B for the deferred fused-gd backward (round 3).

Old backward schedule (per step, 3 blocks): gd-only(block 0) + 2x
combined gx+gd — each kernel re-runs the Chebyshev recurrence on the
same pair geometry. New schedule: 2x gx-only + ONE fused gd over
block-stacked [A, 3F] operands (models/cheb.cheb_stack_apply) — the
recurrence, geometry setup, and position epilogue run once.

Same interleaved-rounds protocol as kernel_nchains.py (cross-process
tunnel timings drift 10-20%). Sweeps the fused call's tile budget.
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
MGX, MGD = 48, 64
B = 3
ITERS = 40
ROUNDS = 3
RCUT, D_MIN = 10.0, 2.0

rng = np.random.default_rng(0)
cgx = jnp.asarray(rng.normal(size=(MGX, F)) * 0.01, jnp.float32)
cgd = jnp.asarray(rng.normal(size=(MGD, F)) * 0.01, jnp.float32)
cgd_cat = jnp.asarray(rng.normal(size=(MGD, B * F)) * 0.01, jnp.float32)
w0 = jnp.asarray(rng.normal(size=(F,)) * 0.01, jnp.float32)
pos = jnp.asarray(rng.uniform(0, 30, (S, A, 3)), jnp.float32)
x = jnp.asarray(rng.normal(size=(S, A, F)), jnp.float32)
xcat = jnp.asarray(rng.normal(size=(S, A, B * F)), jnp.float32)
g = jnp.asarray(rng.normal(size=(S, A, F)), jnp.float32)
gcat = jnp.asarray(rng.normal(size=(S, A, B * F)), jnp.float32)
dummy_c = jnp.zeros((1, B * F), jnp.float32)
w0_cat = jnp.zeros((B * F,), jnp.float32)


def make_loop(one):
    vm = jax.vmap(one)

    @jax.jit
    def loop(x0):
        return jax.lax.fori_loop(
            0, ITERS, lambda _, xx: xx + 0.0 * vm(xx), x0
        )

    float(jnp.sum(loop(x)))
    return loop


def combined():
    return make_loop(
        lambda xx: K.cheb_conv_bwd_pallas(
            cgx, cgd, w0, pos[0], xx, g[0], RCUT, "bf16",
            need_gx=True, d_min=D_MIN,
        )[1]
    )


def gd_only():
    return make_loop(
        lambda xx: K.cheb_conv_bwd_pallas(
            cgx, cgd, w0, pos[0], xx, g[0], RCUT, "bf16",
            need_gx=False, d_min=D_MIN,
        )[0].sum(axis=-1, keepdims=True) * jnp.zeros((1, F))
    )


def gx_only():
    return make_loop(
        lambda xx: K.cheb_conv_bwd_pallas(
            cgx, cgd, w0, pos[0], xx, g[0], RCUT, "bf16",
            need_gx=True, need_gd=False, d_min=D_MIN,
        )[1]
    )


def fused_gd(tb, concat=True, n=8):
    """concat=True includes the per-step HBM concat of the stacked
    operands (what the production stack path pays today).

    N_CHAINS_BWD is restored after the compile (make_loop compiles
    eagerly) so later specs never inherit this spec's stride."""

    def one(xx):
        if concat:
            xc = jnp.concatenate([xx, xcat[0, :, F:]], axis=1)
        else:
            # dependence on xx without a concat: [A, 1] broadcast add
            xc = xcat[0] + 0.0 * xx[:, :1]
        return K.cheb_conv_bwd_pallas(
            dummy_c, cgd_cat, w0_cat, pos[0], xc, gcat[0], RCUT,
            "bf16", need_gx=False, d_min=D_MIN, tile_budget=tb,
        )[0].sum(axis=-1, keepdims=True) * jnp.zeros((1, F))

    saved = K.N_CHAINS_BWD
    K.N_CHAINS_BWD = n
    try:
        return make_loop(one)
    finally:
        K.N_CHAINS_BWD = saved


specs = [
    ("combined gx+gd (prod)", combined),
    ("gd-only F=128", gd_only),
    ("gx-only (new)", gx_only),
    ("fused gd 3F tb=auto(25k)", lambda: fused_gd(None)),
    ("fused gd 3F tb=75k", lambda: fused_gd(75_000)),
    ("fused gd 3F tb=120k", lambda: fused_gd(120_000)),
    ("fused noconcat tb=auto", lambda: fused_gd(None, concat=False)),
    ("fused noconcat tb=75k", lambda: fused_gd(75_000, concat=False)),
    ("fused noconcat tb=120k", lambda: fused_gd(120_000, concat=False)),
    ("fused noconcat tb=75k n=4", lambda: fused_gd(75_000, False, 4)),
    ("fused noconcat tb=120k n=4", lambda: fused_gd(120_000, False, 4)),
]

compiled = []
for name, mk in specs:
    try:
        compiled.append((name, mk(), []))
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:140]}")

for _ in range(ROUNDS):
    for name, loop, ts in compiled:
        t0 = time.perf_counter()
        float(jnp.sum(loop(x)))
        ts.append((time.perf_counter() - t0) / ITERS / S * 1e6)

for name, _, ts in compiled:
    med = sorted(ts)[len(ts) // 2]
    print(f"{name:28s}: {med:6.2f} us/mol  (rounds: "
          + " ".join(f"{t:.2f}" for t in ts) + ")")

rows = {name: sorted(ts)[len(ts) // 2] for name, _, ts in compiled}
if "gx-only (new)" in rows:
    old = rows["gd-only F=128"] + 2 * rows["combined gx+gd (prod)"]
    best_f = min(v for k, v in rows.items() if k.startswith("fused"))
    new = 2 * rows["gx-only (new)"] + best_f
    print(f"\nper-step backward: old {old:.1f} -> new {new:.1f} us/mol "
          f"({(old - new) / old * 100:+.1f}% saved)")
