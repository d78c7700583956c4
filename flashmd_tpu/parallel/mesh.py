"""Multi-chip scaling: batch/replica sharding over a device mesh.

The reference is a single-process, single-GPU framework — its only scale
axes are the in-batch molecule count and in-batch PT replicas
(reference: src/flashmd/simulation/base.py:985-997,
parallel_tempering.py:204-254; no torch.distributed anywhere). On TPU,
multi-chip is the default, so this module makes the batch (molecule x
replica) axis a first-class mesh axis:

* trajectories are embarrassingly parallel -> shard ``[S, ...]`` arrays over
  a 1-D ``("replica",)`` mesh; each chip integrates its own molecules with
  zero steady-state communication;
* parallel-tempering exchange is a batch-axis permutation
  (see flashmd_tpu.simulation.parallel_tempering) — under this sharding XLA
  lowers it to collective-permute traffic over ICI, with per-replica scalar
  energies all-gathered implicitly (tiny);
* multi-host: call :func:`initialize_distributed` first (jax.distributed),
  then the same code spans DCN.

Model parallelism (TP/PP) is deliberately out of scope: SchNet here is
O(100k) params — hundreds of times smaller than one chip's HBM. This is a
documented design choice, not an omission (SURVEY.md section 2.8).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

REPLICA_AXIS = "replica"


#: Environment variables whose presence marks a managed multi-host job
#: (jax.distributed can auto-detect its coordinator from these).
_CLUSTER_ENV_VARS = (
    "COORDINATOR_ADDRESS",
    "JAX_COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
    "TPU_WORKER_HOSTNAMES",
    "SLURM_JOB_ID",
    "OMPI_MCA_orte_hnp_uri",
)


def initialize_distributed(**kwargs) -> bool:
    """Multi-host ``jax.distributed`` init; returns True if initialized.

    Single-process runs (no explicit coordination kwargs AND no cluster
    environment detected) are an explicit no-op returning False. In every
    other case — the caller passed ``coordinator_address``/``num_processes``
    /etc., or a cluster scheduler's environment is present — failures from
    ``jax.distributed.initialize`` PROPAGATE: a misconfigured multi-host
    job must die loudly rather than silently degrade to sharding over one
    host's devices (each host would integrate a different 1/n-th of the
    batch while believing it holds the whole run).
    """
    import os

    cluster_env = [v for v in _CLUSTER_ENV_VARS if os.environ.get(v)]
    if not kwargs and not cluster_env:
        return False
    jax.distributed.initialize(**kwargs)
    return True


def make_replica_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over the replica/batch axis."""
    devices = np.asarray(jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(devices, (REPLICA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a [S, ...] batch-major array."""
    return NamedSharding(mesh, P(REPLICA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_carry(carry: dict, mesh: Mesh) -> dict:
    """Place an integrator carry on the mesh: batch-major arrays sharded
    over the replica axis, everything else replicated.

    After this, jit-compiled rollouts run SPMD across the mesh with XLA
    inserting any collectives (e.g. the PT exchange permutation).
    """
    shard = batch_sharding(mesh)
    repl = replicated(mesh)
    n = mesh.devices.size
    s = carry["pos"].shape[0]
    if s % n != 0:
        raise ValueError(
            f"Batch size {s} is not divisible by the mesh size {n}; "
            "pad the batch."
        )

    def place(x):
        x = jax.numpy.asarray(x)
        # Every batch-leading leaf shards over the replica axis — pos/vel/
        # forces/potential AND the per-sim neighbor-matrix pytree (leaving
        # the latter replicated would make in-scan neighbor rebuilds
        # gather across chips every interval). Everything else (PRNG key,
        # step counter, PT acceptance matrices) is replicated.
        if x.ndim >= 1 and x.shape[0] == s:
            return jax.device_put(x, shard)
        return jax.device_put(x, repl)

    return jax.tree.map(place, carry)
