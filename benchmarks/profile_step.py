"""Coarse step breakdown at the headline config: forces vs full BAOAB vs RNG."""
import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np
from flashmd_tpu.models.zoo import cgschnet_1enh_like
from flashmd_tpu.models.forcefield import compute_energy_forces, build_neighbors
from flashmd_tpu.data.system import collate

S, A = 128, 266
ff, configs = cgschnet_1enh_like(n_atoms=A, batch_size=S, precision="bf16", message_passing="cheb")
from flashmd_tpu.models.cheb import attach_cheb_fit
ff = ff.replace(schnet_params=attach_cheb_fit(ff.schnet_params, ff.schnet_config))
system = collate(configs, beta=1.67)
pos = jnp.asarray(system.pos); types = system.atom_types
nbr = build_neighbors(ff, pos)

def timeit(f, *args, n=50):
    r = f(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3

# 1. forces only
f_forces = jax.jit(lambda p: compute_energy_forces(ff, p, types, nbr)[1])
print(f"forces (fwd+bwd):      {timeit(f_forces, pos):7.3f} ms")

# 2. scan of 50 forces (amortize dispatch)
def scan_forces(p):
    def body(carry, _):
        f = compute_energy_forces(ff, carry, types, nbr)[1]
        return carry + 1e-6 * f, ()
    return jax.lax.scan(body, p, None, length=50)[0]
t = timeit(jax.jit(scan_forces), pos, n=3)
print(f"forces in scan:        {t/50:7.3f} ms/step")

# 3. RNG normal [S,A,3]
def rng_step(key):
    key, sub = jax.random.split(key)
    return key, jax.random.normal(sub, (S, A, 3))
def scan_rng(key):
    def body(k, _):
        k, z = rng_step(k)
        return k, jnp.sum(z)
    return jax.lax.scan(body, key, None, length=200)
t = timeit(jax.jit(scan_rng), jax.random.PRNGKey(0), n=3)
print(f"threefry normal/step:  {t/200:7.3f} ms")

# 4. rbg generator
key_rbg = jax.random.key(0, impl="rbg")
t = timeit(jax.jit(scan_rng), key_rbg, n=3)
print(f"rbg normal/step:       {t/200:7.3f} ms")

# 5. priors only
from flashmd_tpu.prior.priors import prior_energy
def prior_forces(p):
    def e(pp):
        tot = 0.0
        for name, prior in ff.priors.items():
            tot = tot + jnp.sum(jax.vmap(lambda q: prior_energy(prior, q))(pp))
        return tot
    return jax.grad(e)(p)
print(f"priors (fwd+bwd):      {timeit(jax.jit(prior_forces), pos):7.3f} ms")

# 6. neighbor rebuild
print(f"neighbor build:        {timeit(jax.jit(lambda p: build_neighbors(ff, p)), pos):7.3f} ms")
