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


def main():
    import jax
    import jax.numpy as jnp

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
    )
    sim.attach_model_and_configurations(ff, configs, beta=1.67)

    # Direct rollout timing (same math as sim.simulate(), minus file IO).
    key = jax.random.PRNGKey(0)
    carry = sim._init_carry(sim.initial_system, key)
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
