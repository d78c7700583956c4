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
        if variant == "pipe2":
            # states computed one iteration AHEAD of their matmuls
            out = jnp.zeros((ta, F), jnp.float32)
            def body(i, carry):
                sa, sb, out = carry
                s1 = qs*sb - sa
                s2 = qs*s1 - sb
                out = out + matvec(sa, 2*n*i)
                out = out + matvec(sb, 2*n*i+n)
                return (s1, s2, out)
            out = jax.lax.fori_loop(0, order//(2*n) - 1, body, (s_prev, s_cur, out))[-1]
            # epilogue: last two groups
            m0 = order - 2*n
            sa, sb = jax.lax.fori_loop(0, 0, lambda i,c: c, (s_prev, s_cur))[0:2]  # dummy keep
            # recompute final states is wrong; instead carry them: redo with scan-style
            return None, out
        elif variant == "pipe":
            # prologue: first two groups issued, then loop with lookahead
            out = matvec(s_prev, 0) + matvec(s_cur, n)
            def body(i, carry):
                sa, sb, out = carry           # sa,sb: states for groups 2i+2, 2i+3 NOT yet matvec'd
                s1 = qs*sb - sa               # next states (VPU) — independent of the matvecs below
                s2 = qs*s1 - sb
                out = out + matvec(sa, 2*n*i+2*n)   # MXU on previously computed states
                out = out + matvec(sb, 2*n*i+3*n)
                return (s1, s2, out)
            sa = qs*s_cur - s_prev
            sb = qs*sa - s_cur
            out = jax.lax.fori_loop(0, (order-2*n)//(2*n), body, (sa, sb, out))[-1]
            # NOTE: loop computes one extra lookahead pair (wasted) and the
            # final carry's sa/sb are unused — the matvecs cover exactly
            # groups 2..order/n-1. Checked below vs reference.
            x_tile = x_ref[0, pl.ds(t*ta, ta), :]
            out_ref[0] = out - w0_ref[:]*x_tile
            return
        x_tile = x_ref[0, pl.ds(t*ta, ta), :]
        out_ref[0] = out - w0_ref[:]*x_tile
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
    return fn

fn = run("pipe")
# correctness vs production kernel
ref = jax.jit(jax.vmap(lambda p, xx: K.cheb_conv_fwd_pallas(c, w0, p, xx, RCUT, "bf16")))
o1 = np.asarray(fn(pos[:2], x[:2])); o2 = np.asarray(ref(pos[:2], x[:2]))
print("max abs diff vs production:", np.abs(o1-o2).max())
