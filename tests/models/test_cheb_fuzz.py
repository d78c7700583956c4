"""Property fuzz: the cheb path tracks the exact-MLP path across random
model shapes, cutoffs, and geometries (fp32, high order).

Hardens the fit + custom VJP against config-space corners the targeted
tests don't reach (odd RBF counts, small/large rcut, 1-2 blocks, head
shapes, near-cutoff pairs).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashmd_tpu.models.cutoff import CosineCutoff
from flashmd_tpu.models.forcefield import ForceField, build_neighbors
from flashmd_tpu.models.schnet import SchNetConfig, init_schnet, schnet_energy


@pytest.mark.heavy
@pytest.mark.parametrize("seed", range(6))
def test_cheb_tracks_exact_path(seed):
    rng = np.random.default_rng(seed)
    a = int(rng.integers(8, 48))
    rcut = float(rng.uniform(2.0, 9.0))
    cfg = SchNetConfig(
        hidden_channels=int(rng.choice([32, 64])),
        embedding_size=int(rng.integers(3, 12)),
        num_filters=int(rng.choice([32, 64])),
        num_interactions=int(rng.integers(1, 4)),
        num_rbf=int(rng.integers(8, 40)),
        cutoff=CosineCutoff(0.0, rcut),
        output_hidden_layer_widths=tuple(
            rng.choice([16, 32], size=rng.integers(1, 3))
        ),
        message_passing="xla",
        precision="fp32",
    )
    params = init_schnet(jax.random.PRNGKey(seed), cfg)
    # cluster scaled so a good fraction of pairs sit inside (and some
    # straddle) the cutoff
    pos = jnp.asarray(
        rng.uniform(0, rcut * 1.8, (a, 3)), jnp.float32
    )
    types = jnp.asarray(
        rng.integers(0, cfg.embedding_size, a), jnp.int32
    )
    ff = ForceField(
        schnet_params=params, priors={}, schnet_config=cfg,
        neighbor_capacity=a,
    )
    nbr = jax.tree.map(lambda x: x[0], build_neighbors(ff, pos[None]))
    e_ref = schnet_energy(params, cfg, pos, types, nbr)
    g_ref = jax.grad(
        lambda p: schnet_energy(params, cfg, p, types, nbr)
    )(pos)

    cfg_c = dataclasses.replace(
        cfg, message_passing="cheb", cheb_order=160
    )
    e_c = schnet_energy(params, cfg_c, pos, types, None)
    g_c = jax.grad(
        lambda p: schnet_energy(params, cfg_c, p, types, None)
    )(pos)

    e_rel = abs(float(e_c) - float(e_ref)) / max(abs(float(e_ref)), 1e-6)
    g_scale = float(jnp.abs(g_ref).max())
    g_rel = float(jnp.abs(g_c - g_ref).max()) / max(g_scale, 1e-6)
    assert e_rel < 5e-4, f"seed {seed}: energy rel {e_rel:.2e}"
    assert g_rel < 5e-3, f"seed {seed}: force rel {g_rel:.2e}"
