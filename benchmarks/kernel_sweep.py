import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
import flashmd_tpu.ops.pallas.cheb_kernel as K

A, F, ORDER, S = 266, 128, 96, 128
rng = np.random.default_rng(0)
c = jnp.asarray(rng.normal(size=(ORDER, F)), jnp.float32)
c2 = jnp.asarray(rng.normal(size=(ORDER, F)), jnp.float32)
w0 = jnp.asarray(rng.normal(size=(F,)), jnp.float32)
pos = jnp.asarray(rng.uniform(0, 30, (S, A, 3)), jnp.float32)
x = jnp.asarray(rng.normal(size=(S, A, F)), jnp.float32)
g = jnp.asarray(rng.normal(size=(S, A, F)), jnp.float32)
RCUT = 10.0

def timeit(f, *args, n=30):
    r = f(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n): r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter()-t0)/n*1e3

for nch in [2, 4, 8]:
    K.N_CHAINS = nch
    try:
        fwd = jax.jit(jax.vmap(lambda p, xx: K.cheb_conv_fwd_pallas(c, w0, p, xx, RCUT, "bf16")))
        t = timeit(fwd, pos, x)
        bwd = jax.jit(jax.vmap(lambda p, xx, gg: K.cheb_conv_bwd_pallas(c, c2, w0, p, xx, gg, RCUT, "bf16", need_gx=True)))
        tb = timeit(bwd, pos, x, g)
        print(f"n_chains={nch}: fwd {t/S*1000:6.2f} us/mol   bwd {tb/S*1000:6.2f} us/mol")
    except Exception as e:
        print(f"n_chains={nch}: {type(e).__name__} {str(e)[:120]}")
K.N_CHAINS = 4
for budget in [60_000, 100_000, 150_000]:
    bwd = jax.jit(jax.vmap(lambda p, xx, gg: K.cheb_conv_bwd_pallas(c, c2, w0, p, xx, gg, RCUT, "bf16", need_gx=True, tile_budget=budget)))
    tb = timeit(bwd, pos, x, g)
    fwd = jax.jit(jax.vmap(lambda p, xx: K.cheb_conv_fwd_pallas(c, w0, p, xx, RCUT, "bf16", tile_budget=budget)))
    t = timeit(fwd, pos, x)
    print(f"budget={budget}: fwd {t/S*1000:6.2f} us/mol   bwd {tb/S*1000:6.2f} us/mol")
