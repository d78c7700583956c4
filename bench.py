"""Headline benchmark: CGSchNet 1ENH-scale Langevin throughput on one chip.

Mirrors the reference measurement protocol (throughput over the second half
of the run, warm-up excluded; reference: src/flashmd/simulation/base.py:
564-571, 748-787 and scripts/nvt_langevin.py:148-177) on the reference's
headline config: 1ENH-scale CG protein (~266 beads), batch 128, quantized
(bf16) filter/output networks. Baseline to beat: 2861 timestep*mol/s
(README.md:76-81, RTX PRO 6000).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N / 2861}

Defaults to 400 steps so compile + run fits a 10-minute window; the full
600-step protocol (BENCH_STEPS=600, what benchmarks/run_all.py and the
PERFORMANCE.md tables use) measures the same steady state — 400- and
600-step runs agree within noise (<1%) because timing covers only the
second, fully-warm half either way.
"""

import json
import os
import sys
import time

BASELINE = 2861.0  # timestep*mol/s, reference README.md:81


def mfu_fields(
    cfg, n_atoms: int, throughput: float, n_devices: int = 1
) -> dict:
    """Analytic kernel FLOPs + MFU for a cheb-path SchNet config.

    Each of B blocks runs M1 forward order-matmuls [A,A]@[A,F]; the
    backward runs M1 gx chains per block except block 0 (pos-independent
    embedding input) and M2 gd chains per block — (2B-1)*M1 + B*M2
    order-matmuls of 2*A^2*F. Logical (unpadded A) and kernel-only:
    lins/output-MLP/priors are <2% of the step (PERFORMANCE.md). Peak:
    v5e bf16 ~197 TFLOP/s; override with BENCH_PEAK_TFLOPS for other
    chips. Shared by bench.py and benchmarks/run_all.py so the formula
    can never diverge between the two artifacts.
    """
    if cfg is None or cfg.message_passing != "cheb":
        return {}
    m1 = cfg.cheb_order
    m2 = cfg.cheb_order_deriv or m1
    b = cfg.num_interactions
    order_matmuls = (2 * b - 1) * m1 + b * m2
    flops_per_mol_step = order_matmuls * 2 * n_atoms**2 * cfg.num_filters
    # A mesh aggregates throughput across n_devices chips, so the peak
    # scales with it — otherwise mfu_vs_peak overstates by ~N (ADVICE r4).
    peak_tflops = float(os.environ.get("BENCH_PEAK_TFLOPS", "197"))
    peak_tflops *= max(int(n_devices), 1)
    achieved = flops_per_mol_step * throughput
    return {
        "kernel_gflops_per_mol_step": round(flops_per_mol_step / 1e9, 4),
        "achieved_tflops": round(achieved / 1e12, 2),
        "mfu_vs_peak": round(achieved / (peak_tflops * 1e12), 3),
    }


def main():
    import jax
    import jax.numpy as jnp

    # Persistent XLA compile cache: repeat runs of the bench protocol
    # skip the multi-minute TPU compile (FLASHMD_TPU_COMPILATION_CACHE=0
    # opts out; first-ever run still compiles from scratch).
    from flashmd_tpu.simulation.scripts import _enable_compilation_cache

    _enable_compilation_cache()

    from flashmd_tpu.data.system import collate
    from flashmd_tpu.models.zoo import cgschnet_1enh_like
    from flashmd_tpu.simulation.langevin import LangevinSimulation

    batch_size = int(os.environ.get("BENCH_BATCH", "128"))
    n_atoms = int(os.environ.get("BENCH_ATOMS", "266"))
    n_steps = int(os.environ.get("BENCH_STEPS", "400"))
    chunk = int(os.environ.get("BENCH_CHUNK", "100"))
    precision = os.environ.get("BENCH_PRECISION", "bf16")
    message_passing = os.environ.get("BENCH_MP", "cheb")
    cheb_order = os.environ.get("BENCH_ORDER")
    cheb_order_deriv = os.environ.get("BENCH_ORDER_DERIV")
    cheb_d_min = os.environ.get("BENCH_DMIN")

    # BASELINE config 5 (batch+replica sharding): BENCH_MESH=auto|N builds
    # an N-device ("replica",) mesh and runs the identical protocol with
    # the batch axis sharded over it (mirrors Simulation(mesh=...) /
    # --simulation.mesh auto). On hardware this is a v5e-8 pod slice; on
    # the CPU backend an xla_force_host_platform_device_count virtual
    # mesh validates the plumbing (number meaningless there).
    mesh = None
    mesh_env = os.environ.get("BENCH_MESH")
    if mesh_env:
        from flashmd_tpu.parallel.mesh import make_replica_mesh

        mesh = make_replica_mesh(
            None if mesh_env == "auto" else int(mesh_env)
        )

    ff, configs = cgschnet_1enh_like(
        n_atoms=n_atoms,
        batch_size=batch_size,
        precision=precision,
        message_passing=message_passing,
        cheb_order=int(cheb_order) if cheb_order else None,
        cheb_order_deriv=int(cheb_order_deriv) if cheb_order_deriv else None,
        cheb_d_min=float(cheb_d_min) if cheb_d_min else None,
    )

    sim = LangevinSimulation(
        dt=0.004,
        friction=1.0,
        n_timesteps=n_steps,
        save_interval=chunk,
        random_seed=103838,
        gptq="bf16" if precision == "bf16" else None,
        neighbor_skin=1.0,
        neighbor_rebuild_interval=int(
            os.environ.get("BENCH_NBR_INTERVAL", "10")
        ),
        mesh=mesh,
    )
    sim.attach_model_and_configurations(ff, configs, beta=1.67)

    # Direct rollout timing (same math as sim.simulate(), minus file IO).
    key = jax.random.PRNGKey(0)
    carry = sim._init_carry(sim.initial_system, key)
    if mesh is not None:
        from flashmd_tpu.parallel.mesh import shard_carry

        carry = shard_carry(carry, mesh)
    rollout = sim._build_rollout(1)  # one frame = `chunk` timesteps

    # Warm-up / compile + first half.
    n_chunks = n_steps // chunk
    half = n_chunks // 2
    for _ in range(max(half, 1)):
        carry, _ = rollout(carry)
    jax.block_until_ready(carry["pos"])

    t0 = time.perf_counter()
    for _ in range(n_chunks - half):
        carry, frames = rollout(carry)
    # Fence the timed region with a SCALAR HOST FETCH, not just
    # block_until_ready: through the axon tunnel block_until_ready can
    # return before the device work drains (see the project benchmarking
    # notes), and the iterations above are already carry-dependent, so a
    # value fetched from the final carry is a sound fence everywhere.
    fence = float(jnp.sum(carry["pos"]))
    jax.block_until_ready(carry["pos"])
    elapsed = time.perf_counter() - t0
    assert fence == fence, "NaN positions at the end of the timed run"

    steps_timed = (n_chunks - half) * chunk
    throughput = steps_timed * batch_size / elapsed

    result = {
        "metric": "cgschnet_1enh_batch128_langevin_throughput",
        "value": round(throughput, 1),
        "unit": "timestep*mol/s",
        "vs_baseline": round(throughput / BASELINE, 3),
    }
    if mesh is not None:
        result["mesh_devices"] = int(mesh.devices.size)

    # FLOP / MFU accounting (normalizes comparisons across chip
    # generations; the reference quotes throughput only —
    # reference README.md:76-81). Formula in mfu_fields above.
    result.update(
        mfu_fields(
            ff.schnet_config,
            n_atoms,
            throughput,
            n_devices=mesh.devices.size if mesh is not None else 1,
        )
    )

    # Corroboration: the same config through the PRODUCTION loop
    # (sim.simulate() with real npy/checkpoint file IO and the pair-floor
    # guard — what the CLI runs), whose per-export np.save calls fetch
    # device arrays to host and are therefore immune to tunnel sync
    # semantics. Expected ~10% below the pure-compute number
    # (PERFORMANCE.md "End-to-end CLI check"). BENCH_CLI_IO=0 skips it.
    if os.environ.get("BENCH_CLI_IO", "1") != "0":
        import tempfile

        try:
            with tempfile.TemporaryDirectory() as td:
                sim_io = LangevinSimulation(
                    dt=0.004,
                    friction=1.0,
                    n_timesteps=n_steps,
                    save_interval=chunk,
                    export_interval=2 * chunk,
                    filename="bench",
                    output_dir=td,
                    save_forces=True,
                    save_energies=True,
                    random_seed=103838,
                    gptq="bf16" if precision == "bf16" else None,
                    neighbor_skin=1.0,
                    neighbor_rebuild_interval=int(
                        os.environ.get("BENCH_NBR_INTERVAL", "10")
                    ),
                )
                sim_io.attach_model_and_configurations(
                    ff, configs, beta=1.67
                )
                sim_io.simulate()
                metrics = sim_io.get_throughput_metrics()
                if metrics:
                    result["cli_io_value"] = round(metrics["throughput"], 1)
        except Exception as e:  # corroboration must never kill the bench
            result["cli_io_error"] = f"{type(e).__name__}: {e}"

    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
