"""Multi-host (multi-process) execution of the sharded simulation.

The reference framework is single-process by design (SURVEY.md section 2.8);
this build claims multi-host DCN scaling through jax.distributed +
the ("replica",) mesh. This test actually exercises it: two OS processes,
4 virtual CPU devices each, joined by jax.distributed into one 8-device
mesh with Gloo standing in for DCN collectives. A parallel-tempering run
whose replica-exchange permutation crosses the process boundary must
produce exactly the trajectories and exchange statistics of the
single-process 8-device run.
"""

import os
import subprocess
import sys

import numpy as np

from .test_integrators import chain_configs, harmonic_ff

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
REPO_ROOT = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..")
)


def _reference_run(tmp_path):
    """Identical simulation, single process on the 8-device mesh."""
    from flashmd_tpu.parallel.mesh import make_replica_mesh
    from flashmd_tpu.simulation import PTSimulation

    sim = PTSimulation(
        friction=1.0,
        dt=5e-3,
        n_timesteps=60,
        save_interval=10,
        export_interval=30,
        exchange_interval=10,
        random_seed=11,
        mesh=make_replica_mesh(),
        filename="ref",
        output_dir=str(tmp_path),
    )
    sim.attach_model_and_configurations(
        harmonic_ff(5), chain_configs(2, 5), [1.67, 1.45, 1.28, 1.16]
    )
    sim.simulate()
    return (
        np.concatenate(sim.simulated_coords, axis=0),
        int(sim.final_carry["n_exchange_approved"]),
        int(sim.final_carry["n_exchange_attempted"]),
        np.asarray(sim.final_carry["acceptance_matrix"]),
    )


def test_two_process_pt_matches_single_process(tmp_path):
    port = 13000 + os.getpid() % 2000
    env = {
        k: v
        for k, v in os.environ.items()
        # the workers pin their own platform/device-count
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port), str(tmp_path)],
            cwd=REPO_ROOT,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"

    coords_ref, acc_ref, att_ref, amat_ref = _reference_run(tmp_path)

    results = []
    for i in range(2):
        with np.load(tmp_path / f"result_proc{i}.npz") as z:
            results.append({k: z[k] for k in z.files})

    # Both processes report the same all-gathered global trajectory ...
    np.testing.assert_array_equal(
        results[0]["coords"], results[1]["coords"]
    )
    # ... which matches the single-process mesh run (same seed, same math;
    # only the device<->process layout differs).
    np.testing.assert_allclose(
        coords_ref, results[0]["coords"], rtol=1e-5, atol=1e-6
    )
    for r in results:
        assert int(r["n_exchange_approved"]) == acc_ref
        assert int(r["n_exchange_attempted"]) == att_ref
        np.testing.assert_array_equal(r["acceptance_matrix"], amat_ref)
    assert acc_ref > 0  # exchanges actually happened across the boundary

    # File IO lands on process 0 only (is_io_process gating): the worker
    # run produced exactly one set of trajectory files.
    coord_files = sorted(tmp_path.glob("mh_coords_*.npy"))
    assert coord_files, "io process wrote no trajectories"
    written = np.concatenate(
        [np.load(f) for f in coord_files], axis=1
    )  # files are (S, frames, A, 3)
    np.testing.assert_allclose(
        written.transpose(1, 0, 2, 3), results[0]["coords"], rtol=0, atol=0
    )
