"""Compile/timing probe: gx-only backward kernel budgets vs order_gx.

The stack path calls cheb_conv_bwd_pallas(need_gx=True, need_gd=False)
per block; its 75k budget was validated at the headline order (M1=48 ->
56 That rows). At 96 -> 104 rows the 8-group chunk segmentation leaves
more live state and 75k OOMs the 16 MB scoped-VMEM stack by 1.09M.
Find safe budgets per order (and for bf16x3, and with a cell)."""
import sys, time
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
import flashmd_tpu.ops.pallas.cheb_kernel as K

A, F, S = 266, 128, 64
ITERS, RCUT, D_MIN = 20, 10.0, 2.0
rng = np.random.default_rng(0)
w0 = jnp.asarray(rng.normal(size=(F,)) * 0.01, jnp.float32)
pos = jnp.asarray(rng.uniform(0, 30, (S, A, 3)), jnp.float32)
x = jnp.asarray(rng.normal(size=(S, A, F)), jnp.float32)
g = jnp.asarray(rng.normal(size=(S, A, F)), jnp.float32)
CELL = jnp.asarray(np.diag([40.0, 40.0, 40.0]), jnp.float32)

def probe(m1, tb, prec="bf16", cell=None, d_min=D_MIN):
    cgx = jnp.asarray(rng.normal(size=(m1, F)) * 0.01, jnp.float32)
    cgd = jnp.asarray(rng.normal(size=(96, F)) * 0.01, jnp.float32)
    def one(xx):
        return K.cheb_conv_bwd_pallas(
            cgx, cgd, w0, pos[0], xx, g[0], RCUT, prec,
            need_gx=True, need_gd=False, d_min=d_min,
            tile_budget=tb, cell=cell)[1]
    vm = jax.vmap(one)
    @jax.jit
    def loop(x0):
        return jax.lax.fori_loop(0, ITERS, lambda _, xx: xx + 0.0 * vm(xx), x0)
    tag = f"m1={m1} tb={tb} {prec}{' cell' if cell is not None else ''}"
    try:
        float(jnp.sum(loop(x)))
    except Exception as e:
        msg = str(e)
        i = msg.find("exceeded scoped vmem limit by")
        print(f"{tag}: FAIL {msg[i:i+45] if i>=0 else msg[:80]}", flush=True)
        return
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(jnp.sum(loop(x)))
        ts.append((time.perf_counter() - t0) / ITERS / S * 1e6)
    print(f"{tag}: {sorted(ts)[1]:6.2f} us/mol", flush=True)

for m1 in (64, 96, 128):
    for tb in (75_000, 64_000, 56_000, 48_000):
        probe(m1, tb)
# the bf16x3 tier and the cell variant at the risky order
probe(96, 52_000, cell=CELL)
probe(96, 40_000, cell=CELL)
probe(64, 75_000, prec="bf16x3")
probe(64, 48_000, prec="bf16x3")
probe(96, 48_000, prec="bf16x3")
probe(96, 32_000, prec="bf16x3")
# Round-2 corner probes (2026-08-19 results inline):
probe(128, 52_000, cell=CELL)   # 50.25 ok
probe(128, 44_000, cell=CELL)   # 50.18 ok
probe(128, 48_000, prec="bf16x3")   # 87.74 ok
probe(64, 40_000, prec="bf16x3", cell=CELL)   # 55.81 ok
probe(96, 40_000, prec="bf16x3", cell=CELL)   # 73.47 ok
probe(128, 56_000, prec="fp32")   # 116.76 ok
probe(128, 75_000, prec="fp32")   # 148.25 ok but 27% slower
probe(80, 75_000)               # FAIL: break is between 72 and 88 rows
