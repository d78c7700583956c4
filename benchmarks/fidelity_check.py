"""Max relative force error of the cheb path vs exact fp32 MLP, on TPU (SchNet term only)."""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp, numpy as np, dataclasses
from flashmd_tpu.models.zoo import cgschnet_1enh_like
from flashmd_tpu.models.forcefield import build_neighbors
from flashmd_tpu.models.schnet import schnet_energy
from flashmd_tpu.models.cheb import attach_cheb_fit
from flashmd_tpu.data.system import collate

ff, configs = cgschnet_1enh_like(n_atoms=266, batch_size=4, precision="fp32", message_passing="xla")
system = collate(configs, beta=1.67)
pos = jnp.asarray(system.pos); types = system.atom_types
nbr = build_neighbors(ff, pos)

def forces(params, cfg):
    def e(p):
        tot = 0.0
        for s in range(p.shape[0]):
            n_s = jax.tree.map(lambda a: a[s] if hasattr(a,'ndim') and a.ndim>0 else a, nbr)
            tot = tot + schnet_energy(params, cfg, p[s], types, n_s)
        return tot
    return jax.jit(jax.grad(e))(pos)

f_ref = np.asarray(forces(ff.schnet_params, ff.schnet_config))
scale = np.abs(f_ref).max()
print("ref scale:", scale)
for prec, order in [("bf16",88), ("bf16",96), ("fp32",128), ("bf16",64)]:
    cfg2 = dataclasses.replace(ff.schnet_config, precision=prec, message_passing="cheb", cheb_order=order)
    p2 = attach_cheb_fit(ff.schnet_params, cfg2)
    f = np.asarray(forces(p2, cfg2))
    print(f"cheb order={order} {prec}: max rel force err = {np.abs(f-f_ref).max()/scale:.2e}")
