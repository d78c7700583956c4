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


def _multihost_environment() -> bool:
    """True when the environment gives evidence of MORE THAN ONE process.

    A lone coordinator-style variable is not enough: single-worker TPU VMs
    legitimately export ``TPU_WORKER_HOSTNAMES=localhost`` and single-node
    SLURM jobs export ``SLURM_JOB_ID`` — auto-initializing there would blow
    up (or worse, succeed pointlessly after the backend is live).
    """
    import os

    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if len([h for h in hosts.split(",") if h.strip()]) > 1:
        return True
    for var in ("SLURM_NTASKS", "SLURM_NPROCS", "OMPI_COMM_WORLD_SIZE",
                "JAX_NUM_PROCESSES", "NUM_PROCESSES"):
        try:
            if int(os.environ.get(var, "")) > 1:
                return True
        except ValueError:
            pass
    # Explicit coordinator address + process id => launched by a manager
    # that expects distributed init regardless of visible process count.
    return bool(
        os.environ.get("JAX_COORDINATOR_ADDRESS")
        and os.environ.get("JAX_PROCESS_ID")
    )


def initialize_distributed(**kwargs) -> bool:
    """Multi-host ``jax.distributed`` init; returns True if initialized.

    Single-process runs (no explicit coordination kwargs AND no multi-host
    environment detected — see :func:`_multihost_environment`) are an
    explicit no-op returning False. In every other case — the caller passed
    ``coordinator_address``/``num_processes``/etc., or the environment
    shows >1 process — failures from ``jax.distributed.initialize``
    PROPAGATE: a misconfigured multi-host job must die loudly rather than
    silently degrade to sharding over one host's devices (each host would
    integrate a different 1/n-th of the batch while believing it holds the
    whole run).
    """
    if jax.distributed.is_initialized():
        return True
    if not kwargs and not _multihost_environment():
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


def mesh_is_multiprocess(mesh: Mesh) -> bool:
    """True if the mesh spans devices owned by more than one process."""
    return len({d.process_index for d in mesh.devices.flat}) > 1


def shard_carry(carry: dict, mesh: Mesh) -> dict:
    """Place an integrator carry on the mesh: batch-major arrays sharded
    over the replica axis, everything else replicated.

    After this, jit-compiled rollouts run SPMD across the mesh with XLA
    inserting any collectives (e.g. the PT exchange permutation).

    Multi-host: when the mesh spans several processes (DCN scaling via
    :func:`initialize_distributed`), every process must call this with the
    IDENTICAL global host values (same configurations, same RNG seed — the
    normal outcome of every host running the same program); each process
    then contributes only its addressable shards.
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
    multiprocess = mesh_is_multiprocess(mesh)

    def place(x):
        # Every batch-leading leaf shards over the replica axis — pos/vel/
        # forces/potential AND the per-sim neighbor-matrix pytree (leaving
        # the latter replicated would make in-scan neighbor rebuilds
        # gather across chips every interval). Everything else (PRNG key,
        # step counter, PT acceptance matrices) is replicated.
        sharding = (
            shard
            if getattr(x, "ndim", 0) >= 1 and np.shape(x)[0] == s
            else repl
        )
        if multiprocess:
            # device_put cannot target non-addressable devices; build the
            # global array from the (identical) host value, each process
            # materializing its own shards.
            host = np.asarray(x)
            return jax.make_array_from_callback(
                host.shape, sharding, lambda idx: host[idx]
            )
        return jax.device_put(jax.numpy.asarray(x), sharding)

    return jax.tree.map(place, carry)


def fetch_to_host(tree):
    """Pytree of arrays -> numpy, transparently across process boundaries.

    Fully-addressable leaves (single-process runs — the common case) are a
    plain ``np.asarray``. Leaves sharded over a multi-process mesh are
    all-gathered (``multihost_utils.process_allgather`` replicates
    non-fully-addressable inputs), so EVERY process returns the full global
    value — divergence guards see the whole batch and the IO process can
    write complete trajectories.
    """

    def fetch(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils

            # tiled=True: per-process tiles of the batch axis reassemble
            # into the global shape (the only mode supported for global
            # non-fully-addressable arrays).
            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(x)

    return jax.tree.map(fetch, tree)


def is_io_process() -> bool:
    """True on the process that should own file IO (trajectories,
    checkpoints, config echo). Process 0 by convention; trivially True for
    single-process runs."""
    return jax.process_index() == 0
