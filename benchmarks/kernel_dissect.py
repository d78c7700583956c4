import sys, pathlib, time, functools
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import flashmd_tpu.ops.pallas.cheb_kernel as K

A, F, ORDER, S = 266, 128, 96, 128
N = 4
rng = np.random.default_rng(0)
c = jnp.asarray(rng.normal(size=(ORDER, F)), jnp.float32)
w0 = jnp.asarray(rng.normal(size=(F,)), jnp.float32)
pos = jnp.asarray(rng.uniform(0, 30, (S, A, 3)), jnp.float32)
x = jnp.asarray(rng.normal(size=(S, A, F)), jnp.float32)
RCUT = 10.0

def timeit(f, *args, n=30):
    r = f(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n): r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter()-t0)/n*1e3

def make(variant):
    def kern(pos_ref, x_ref, c_ref, w0_ref, out_ref, *, order, rcut, a_pad, a_real, ta, precision):
        n = N
        t = pl.program_id(1)
        pos_ = pos_ref[0]; pos_tile = pos_ref[0, pl.ds(t*ta, ta), :]; xx = x_ref[0]
        _, z, _, _, _ = K._tile_geometry(pos_, pos_tile, rcut, a_pad, a_real, ta, t)
        u2 = jnp.square(1.0 - z)
        tt, q = K._chain_seeds(z, u2, n)
        s_prev = jnp.concatenate(tt[0:n], axis=0)
        s_cur = jnp.concatenate(tt[n:2*n], axis=0)
        qs = jnp.concatenate([q]*n, axis=0)
        def matvec(stacked, m):
            p = K._mxu_dot(stacked, xx, precision)
            acc = c_ref[pl.ds(m,1),:] * p[0:ta]
            for cch in range(1, n):
                acc = acc + c_ref[pl.ds(m+cch,1),:] * p[cch*ta:(cch+1)*ta]
            return acc
        out = matvec(s_prev, 0) + matvec(s_cur, n)
        if variant == "full":
            def body(i, carry):
                s_prev, s_cur, out = carry
                s1 = qs*s_cur - s_prev
                out = out + matvec(s1, 2*n*i+2*n)
                s2 = qs*s1 - s_cur
                out = out + matvec(s2, 2*n*i+3*n)
                return (s1, s2, out)
        elif variant == "norec":  # matmuls on fixed operands, no recurrence
            def body(i, carry):
                s_prev, s_cur, out = carry
                out = out + matvec(s_prev, 2*n*i+2*n)
                out = out + matvec(s_cur, 2*n*i+3*n)
                return (s_prev, s_cur, out)
        elif variant == "nomm":  # recurrence only, no matmul (fold via slice-sum)
            def body(i, carry):
                s_prev, s_cur, out = carry
                s1 = qs*s_cur - s_prev
                out = out + s1[0:ta, 0:F]
                s2 = qs*s1 - s_cur
                out = out + s2[0:ta, 0:F]
                return (s1, s2, out)
        elif variant == "nofold":  # matmul + recurrence, minimal fold
            def matvec2(stacked, m):
                p = K._mxu_dot(stacked, xx, precision)
                return p[0:ta]
            def body(i, carry):
                s_prev, s_cur, out = carry
                s1 = qs*s_cur - s_prev
                out = out + matvec2(s1, 0)
                s2 = qs*s1 - s_cur
                out = out + matvec2(s2, 0)
                return (s1, s2, out)
        out = jax.lax.fori_loop(0, (order-2*n)//(2*n), body, (s_prev, s_cur, out))[-1]
        x_tile = x_ref[0, pl.ds(t*ta, ta), :]
        out_ref[0] = out - w0_ref[:] * x_tile
    return kern

def run(variant):
    a = A; f = F
    a_pad = K._round_up(a, 8)
    ta = K._tile_atoms(a_pad, 150_000)
    a_pad = K._round_up(a_pad, ta)
    n_tiles = a_pad//ta
    kernel = functools.partial(make(variant), order=ORDER, rcut=RCUT, a_pad=a_pad, a_real=a, ta=ta, precision="bf16")
    def one(p, xx):
        out = pl.pallas_call(kernel, grid=(1, n_tiles),
            in_specs=[pl.BlockSpec((1,a_pad,3), lambda s,t:(0,0,0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((1,a_pad,f), lambda s,t:(0,0,0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((ORDER,f), lambda s,t:(0,0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((1,f), lambda s,t:(0,0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1,ta,f), lambda s,t:(0,t,0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1,a_pad,f), jnp.float32),
        )(K._pad_atoms(p, a_pad)[None], K._pad_atoms(xx, a_pad)[None], c, w0[None,:])
        return out[0,:a]
    fn = jax.jit(jax.vmap(one))
    t = timeit(fn, pos, x)
    print(f"{variant:8s}: {t/S*1000:6.2f} us/mol")

for v in ["full", "norec", "nomm", "nofold"]:
    run(v)
