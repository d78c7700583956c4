"""Same-process A/B of the deferred fused-gd backward schedule
(FLASHMD_CHEB_STACK) on the headline config.

The per-kernel probe (kernel_fused_gd.py) measured the schedule parts;
this measures the SHIPPED default end to end: two LangevinSimulation
rollouts on the bench.py headline config (A=266, batch 128, bf16,
orders (48, 64) on d_min=2.0), traced with the env flag set to 1 resp. 0
(models/schnet.py reads it at trace time), then timed in interleaved
rounds so tunnel drift cancels (cross-process runs drift 10-20%;
within-process interleaving is the house protocol,
benchmarks/kernel_nchains.py).

Usage: python benchmarks/stack_ab.py  (on the TPU chip)
"""

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

STEPS_PER_ROUND = 200
CHUNK = 100
ROUNDS = 5


def make_runner(stack: str):
    os.environ["FLASHMD_CHEB_STACK"] = stack

    from flashmd_tpu.models.zoo import cgschnet_1enh_like
    from flashmd_tpu.simulation.langevin import LangevinSimulation

    ff, configs = cgschnet_1enh_like(
        n_atoms=266, batch_size=128, precision="bf16",
        message_passing="cheb",
    )
    sim = LangevinSimulation(
        dt=0.004, friction=1.0, n_timesteps=STEPS_PER_ROUND,
        save_interval=CHUNK, random_seed=103838, gptq="bf16",
        neighbor_skin=1.0, neighbor_rebuild_interval=10,
    )
    sim.attach_model_and_configurations(ff, configs, beta=1.67)
    carry = sim._init_carry(sim.initial_system, jax.random.PRNGKey(0))
    rollout = sim._build_rollout(1)
    carry, _ = rollout(carry)  # compile (env read at THIS trace)
    jax.block_until_ready(carry["pos"])
    return rollout, carry


def main():
    runners = {}
    for stack in ("1", "0"):
        runners[stack] = make_runner(stack)
        print(f"compiled FLASHMD_CHEB_STACK={stack}", flush=True)

    times = {"1": [], "0": []}
    n_chunks = STEPS_PER_ROUND // CHUNK
    for r in range(ROUNDS):
        for stack in ("1", "0"):
            rollout, carry = runners[stack]
            t0 = time.perf_counter()
            for _ in range(n_chunks):
                carry, _ = rollout(carry)
            fence = float(jnp.sum(carry["pos"]))
            assert fence == fence
            dt = time.perf_counter() - t0
            runners[stack] = (rollout, carry)
            thr = STEPS_PER_ROUND * 128 / dt
            times[stack].append(thr)
            print(f"round {r} stack={stack}: {thr:9.1f} mol*step/s",
                  flush=True)

    for stack in ("1", "0"):
        ts = sorted(times[stack])
        print(f"stack={stack}: median {ts[len(ts) // 2]:9.1f} "
              f"(all: {' '.join(f'{t:.0f}' for t in times[stack])})")
    m1 = sorted(times["1"])[ROUNDS // 2]
    m0 = sorted(times["0"])[ROUNDS // 2]
    print(f"stack on/off: {m1:.1f} / {m0:.1f}  ({(m1 / m0 - 1) * 100:+.2f}%)")


if __name__ == "__main__":
    main()
