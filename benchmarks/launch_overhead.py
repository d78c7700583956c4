"""Attribute the CLI-vs-pure-compute throughput gap (VERDICT r4 #6).

The round-4 bench read 11,048 timestep*mol/s pure-compute vs 10,162
through the production loop (sim.simulate() with npy/checkpoint IO) —
an ~8% gap the IO-thread A/B already cleared of IO blame. Remaining
suspects, each measured here on the headline config:

  A. per-launch host overhead  -> vary steps-per-launch (chunk size)
  B. carry copies per launch   -> donate the carry to the rollout
  C. dispatch vs device time   -> bracket dispatch separately

Usage: python benchmarks/launch_overhead.py [--steps 600] [--batch 128]
Run on a QUIET chip (concurrent TPU clients corrupt every number).
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from flashmd_tpu.simulation.scripts import _enable_compilation_cache

_enable_compilation_cache()


def build(batch):
    from flashmd_tpu.models.zoo import cgschnet_1enh_like
    from flashmd_tpu.simulation import LangevinSimulation

    ff, configs = cgschnet_1enh_like(
        n_atoms=266, batch_size=batch, precision="bf16",
        message_passing="cheb",
    )
    sim = LangevinSimulation(
        dt=0.004, friction=1.0, n_timesteps=10**9, save_interval=100,
        random_seed=103838, gptq="bf16",
    )
    sim.attach_model_and_configurations(ff, configs, beta=1.67)
    return sim


def timed(sim, rollout, carry, n_launches, batch, steps_per_launch,
          label):
    # warm-up: compile + half
    for _ in range(max(n_launches // 2, 1)):
        carry, _ = rollout(carry)
    jax.block_until_ready(carry["pos"])
    dispatch_s = 0.0
    t0 = time.perf_counter()
    for _ in range(n_launches):
        d0 = time.perf_counter()
        carry, _ = rollout(carry)
        dispatch_s += time.perf_counter() - d0
    fence = float(jnp.sum(carry["pos"]))
    assert fence == fence
    elapsed = time.perf_counter() - t0
    tp = n_launches * steps_per_launch * batch / elapsed
    print(
        f"{label:34s}: {tp:9.1f} ts*mol/s   "
        f"(dispatch {dispatch_s / n_launches * 1e3:6.2f} ms/launch, "
        f"device {elapsed / n_launches * 1e3:6.2f} ms/launch)"
    )
    return carry, tp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    sim = build(args.batch)
    key = jax.random.PRNGKey(0)

    # A: steps per launch (1 frame of `save_interval` each -> vary via
    # n_frames per rollout).
    for frames in (1, 2, 4):
        spl = frames * sim.save_interval
        n_launches = max(args.steps // spl, 2)
        rollout = sim._build_rollout(frames)
        carry = sim._init_carry(sim.initial_system, key)
        timed(sim, rollout, carry, n_launches, args.batch, spl,
              f"A: {spl} steps/launch")

    # B: donated carry (kills the per-launch carry copy if XLA was
    # making one). Same 100-step launch as the headline protocol.
    base = sim._build_rollout(1)

    def frame_chunk(carry):
        def body(c, _):
            return sim._step_with_hooks(c), None

        carry, _ = jax.lax.scan(
            body, carry, xs=None, length=sim.save_interval
        )
        return carry, sim._frame_outputs(carry)

    def rollout_one(carry):
        return jax.lax.scan(
            lambda c, _: frame_chunk(c), carry, xs=None, length=1
        )

    donated = jax.jit(rollout_one, donate_argnums=0)
    n_launches = max(args.steps // sim.save_interval, 2)
    carry = sim._init_carry(sim.initial_system, key)
    timed(sim, base, carry, n_launches, args.batch, sim.save_interval,
          "B: undonated carry (baseline)")
    carry = sim._init_carry(sim.initial_system, key)
    timed(sim, donated, carry, n_launches, args.batch,
          sim.save_interval, "B: donated carry")


if __name__ == "__main__":
    main()
