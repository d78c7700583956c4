"""Microbench: cheb fwd/bwd Pallas kernels at the headline shape."""
import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
from flashmd_tpu.ops.pallas.cheb_kernel import cheb_conv_fwd_pallas, cheb_conv_bwd_pallas

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

fwd = jax.jit(jax.vmap(lambda p, xx: cheb_conv_fwd_pallas(c, w0, p, xx, RCUT, "bf16")))
t = timeit(fwd, pos, x)
print(f"fwd  order={ORDER}: {t:7.3f} ms ({t/S*1000:6.2f} us/mol)")

bwd = jax.jit(jax.vmap(lambda p, xx, gg: cheb_conv_bwd_pallas(c, c2, w0, p, xx, gg, RCUT, "bf16", need_gx=True)))
t = timeit(bwd, pos, x, g)
print(f"bwd gx order={ORDER}: {t:7.3f} ms ({t/S*1000:6.2f} us/mol)")

bwd0 = jax.jit(jax.vmap(lambda p, xx, gg: cheb_conv_bwd_pallas(c, c2, w0, p, xx, gg, RCUT, "bf16", need_gx=False)))
t = timeit(bwd0, pos, x, g)
print(f"bwd nogx order={ORDER}: {t:7.3f} ms ({t/S*1000:6.2f} us/mol)")
