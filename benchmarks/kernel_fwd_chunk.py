import sys; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np, functools, time
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import flashmd_tpu.ops.pallas.cheb_kernel as K
A, F, ORDER, S = 266, 128, 96, 128
RCUT = 10.0
rng = np.random.default_rng(0)
c = jnp.asarray(rng.normal(size=(ORDER, F)), jnp.float32)
w0 = jnp.asarray(rng.normal(size=(F,)), jnp.float32)
pos = jnp.asarray(rng.uniform(0, 30, (S, A, 3)), jnp.float32)
x = jnp.asarray(rng.normal(size=(S, A, F)), jnp.float32)
def timeit(f, *args, n=30):
    r = f(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n): r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter()-t0)/n*1e3
def make(gp):
    def kern(pos_ref, x_ref, c_ref, w0_ref, out_ref, *, order, rcut, a_pad, a_real, ta, precision):
        n = K.N_CHAINS
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
        n_groups = order // n
        remaining = n_groups - 2
        n_iter = remaining // gp
        def body(i, carry):
            sp, sc, o = carry
            for k in range(gp // 2):
                m = (gp*i + 2*k)*n + 2*n
                s1 = qs*sc - sp
                o = o + matvec(s1, m)
                s2 = qs*s1 - sc
                o = o + matvec(s2, m + n)
                sp, sc = s1, s2
            return (sp, sc, o)
        s_prev, s_cur, out = jax.lax.fori_loop(0, n_iter, body, (s_prev, s_cur, out))
        for gi in range(2 + n_iter*gp, n_groups):
            s_next = qs*s_cur - s_prev
            out = out + matvec(s_next, gi*n)
            s_prev, s_cur = s_cur, s_next
        x_tile = x_ref[0, pl.ds(t*ta, ta), :]
        out_ref[0] = out - w0_ref[:]*x_tile
    return kern
def run(gp):
    a_pad = K._round_up(A, 8)
    ta = K._tile_atoms(a_pad, 150_000)
    a_pad = K._round_up(a_pad, ta)
    n_tiles = a_pad//ta
    kernel = functools.partial(make(gp), order=ORDER, rcut=RCUT, a_pad=a_pad, a_real=A, ta=ta, precision="bf16")
    def one(p, xx):
        out = pl.pallas_call(kernel, grid=(1, n_tiles),
            in_specs=[pl.BlockSpec((1,a_pad,3), lambda s,t:(0,0,0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((1,a_pad,F), lambda s,t:(0,0,0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((ORDER,F), lambda s,t:(0,0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((1,F), lambda s,t:(0,0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1,ta,F), lambda s,t:(0,t,0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1,a_pad,F), jnp.float32),
        )(K._pad_atoms(p, a_pad)[None], K._pad_atoms(xx, a_pad)[None], c, w0[None,:])
        return out[0,:A]
    t0 = time.perf_counter()
    fn = jax.jit(jax.vmap(one))
    r = fn(pos, x); jax.block_until_ready(r)
    compile_s = time.perf_counter() - t0
    t = timeit(fn, pos, x)
    print(f"RES fwd chunk{gp}: {t/S*1000:6.2f} us/mol (compile {compile_s:.0f}s)")
    return fn
t0 = time.perf_counter()
ref = jax.jit(jax.vmap(lambda p, xx: K.cheb_conv_fwd_pallas(c, w0, p, xx, RCUT, "bf16")))
r = ref(pos, x); jax.block_until_ready(r)
print(f"RES fwd full (production): compile {time.perf_counter()-t0:.0f}s")
print(f"RES fwd full (production): {timeit(ref, pos, x)/S*1000:6.2f} us/mol")
for gp in (8, 16):
    fn = run(gp)
    o1 = np.asarray(fn(pos[:2], x[:2])); o2 = np.asarray(ref(pos[:2], x[:2]))
    print("   max diff vs production:", np.abs(o1-o2).max())
