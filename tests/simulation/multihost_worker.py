"""Worker process for the 2-process multi-host (DCN-path) test.

Each worker owns 4 virtual CPU devices; ``jax.distributed`` joins them into
one 8-device global mesh over Gloo collectives — the same code path a
multi-host TPU pod uses over DCN (flashmd_tpu.parallel.mesh docstring).
Run by tests/simulation/test_multihost.py, never imported by pytest.

Usage: python multihost_worker.py <proc_id> <n_procs> <port> <outdir>
"""

import os
import sys

PROC_ID = int(sys.argv[1])
N_PROCS = int(sys.argv[2])
PORT = sys.argv[3]
OUTDIR = sys.argv[4]

# Platform forcing must precede any JAX backend touch (the environment's
# sitecustomize force-prepends the accelerator platform — same dance as
# tests/conftest.py and __graft_entry__._force_cpu_platform).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ.setdefault("FLASHMD_PALLAS_INTERPRET", "1")

REPO_ROOT = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")
)
sys.path.insert(0, REPO_ROOT)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from flashmd_tpu.parallel.mesh import (  # noqa: E402
    initialize_distributed,
    make_replica_mesh,
)

assert initialize_distributed(
    coordinator_address=f"localhost:{PORT}",
    num_processes=N_PROCS,
    process_id=PROC_ID,
)
assert jax.process_count() == N_PROCS, jax.process_count()
assert len(jax.local_devices()) == 4
assert len(jax.devices()) == 4 * N_PROCS

from flashmd_tpu.simulation import PTSimulation  # noqa: E402
from tests.simulation.test_integrators import (  # noqa: E402
    chain_configs,
    harmonic_ff,
)


def main():
    sim = PTSimulation(
        friction=1.0,
        dt=5e-3,
        n_timesteps=60,
        save_interval=10,
        export_interval=30,
        exchange_interval=10,
        random_seed=11,
        mesh=make_replica_mesh(),
        filename="mh",
        output_dir=OUTDIR,
    )
    # 4 betas x 2 independent configs = 8 replicas, one per global device:
    # the PT exchange permutation crosses the process boundary.
    sim.attach_model_and_configurations(
        harmonic_ff(5), chain_configs(2, 5), [1.67, 1.45, 1.28, 1.16]
    )
    sim.simulate()

    import numpy as np

    # Every process reports the (all-gathered) global results; the parent
    # asserts both agree with each other and with a single-process run.
    coords = np.concatenate(sim.simulated_coords, axis=0)
    np.savez(
        os.path.join(OUTDIR, f"result_proc{PROC_ID}.npz"),
        coords=coords,
        n_exchange_approved=int(sim.final_carry["n_exchange_approved"]),
        n_exchange_attempted=int(sim.final_carry["n_exchange_attempted"]),
        acceptance_matrix=np.asarray(sim.final_carry["acceptance_matrix"]),
    )
    print(f"worker {PROC_ID} OK", flush=True)


if __name__ == "__main__":
    main()
