"""MXU/VPU overlap test, dispatch-amortized (scan inside one jit)."""
import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MV, KV = 1088, 272
KM, NM = 272, 128
S = 128
ITERS = 24
REPS = 20

def make(variant):
    def kern(bmat_ref, acc0_ref, v_ref, out_ref, vout_ref):
        bmat = bmat_ref[0]; acc0 = acc0_ref[0]; v = v_ref[0]
        def mm(acc):
            return jax.lax.dot_general(bmat, acc, dimension_numbers=(((1,),(0,)),((),())),
                preferred_element_type=jnp.float32)
        def vp(w):
            return w - 1e-9*(w*w)
        if variant == "mm":
            def body(i, carry):
                acc, w = carry
                return (mm(acc), w)
        elif variant == "vpu":
            def body(i, carry):
                acc, w = carry
                return (acc, vp(vp(w)))
        else:
            def body(i, carry):
                acc, w = carry
                return (mm(acc), vp(vp(w)))
        acc, w = jax.lax.fori_loop(0, ITERS, body, (acc0, v))
        out_ref[0] = acc
        vout_ref[0] = w[0:8]
    return kern

def run(variant):
    rng = np.random.default_rng(0)
    bmat = jnp.asarray(rng.normal(size=(S, KM, KM))*0.05, jnp.float32)
    acc0 = jnp.asarray(rng.normal(size=(S, KM, NM)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(S, MV, KV)), jnp.float32)
    def one(bb, aa, vv):
        return pl.pallas_call(make(variant), grid=(1,),
            in_specs=[pl.BlockSpec((1,KM,KM), lambda s:(0,0,0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((1,KM,NM), lambda s:(0,0,0), memory_space=pltpu.VMEM),
                      pl.BlockSpec((1,MV,KV), lambda s:(0,0,0), memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec((1,KM,NM), lambda s:(0,0,0), memory_space=pltpu.VMEM),
                       pl.BlockSpec((1,8,KV), lambda s:(0,0,0), memory_space=pltpu.VMEM)),
            out_shape=(jax.ShapeDtypeStruct((1,KM,NM), jnp.float32),
                       jax.ShapeDtypeStruct((1,8,KV), jnp.float32)),
        )(bb[None], aa[None], vv[None])
    batched = jax.vmap(one)
    def reps(bb, aa, vv):
        def body(carry, _):
            a, w = batched(bb, carry, vv)
            return a[:, 0]*1e-3, w.sum()
        return jax.lax.scan(body, aa, None, length=REPS)
    fn = jax.jit(reps)
    r = fn(bmat, acc0, v); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(5): r = fn(bmat, acc0, v)
    jax.block_until_ready(r)
    t = (time.perf_counter()-t0)/5/REPS*1e3
    print(f"{variant:5s}: {t/S*1000:7.3f} us/mol/kernelcall")

for v in ["mm", "vpu", "both"]:
    run(v)
