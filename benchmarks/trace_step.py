import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp
from flashmd_tpu.models.zoo import cgschnet_1enh_like
from flashmd_tpu.models.forcefield import compute_energy_forces, build_neighbors
from flashmd_tpu.models.cheb import attach_cheb_fit
from flashmd_tpu.data.system import collate

S, A = 128, 266
ff, configs = cgschnet_1enh_like(n_atoms=A, batch_size=S, precision="bf16", message_passing="cheb")
ff = ff.replace(schnet_params=attach_cheb_fit(ff.schnet_params, ff.schnet_config))
system = collate(configs, beta=1.67)
pos = jnp.asarray(system.pos); types = system.atom_types
nbr = build_neighbors(ff, pos)
f = jax.jit(lambda p: compute_energy_forces(ff, p, types, nbr)[1])
jax.block_until_ready(f(pos))
with jax.profiler.trace("/tmp/jax_trace"):
    for _ in range(5):
        jax.block_until_ready(f(pos))
print("done")
