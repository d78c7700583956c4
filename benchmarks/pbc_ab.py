"""Same-process A/B: what does in-kernel min-image PBC cost at
production level?

Round-5 context (PERFORMANCE.md timing-probe hygiene note): a single
min-image backward call once read 24 ms through the tunnel, and every
re-check landed in a poisoned window, so "is the min-image path ~100x
slower?" stayed UNRESOLVED at the micro level. A chained-call probe
(32 kernel calls in one jit, round-trip paid once) then REFUTED the
backward hypothesis — bwd cell 73.8 ms vs bwd open 85.2 ms for 32
calls in the same process — but showed a repeatable forward excess
(+575 us/call at A=266 single-molecule). This script settles what
users actually feel: the FULL production rollout (headline cheb
config, batch 128) with a sound periodic cell vs open boundaries,
timed in interleaved rounds so tunnel drift cancels (the house
protocol, benchmarks/stack_ab.py).

Usage: python benchmarks/pbc_ab.py  (on the TPU chip)
"""

import dataclasses
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from flashmd_tpu.simulation.scripts import _enable_compilation_cache

_enable_compilation_cache()

STEPS_PER_ROUND = 200
CHUNK = 100
ROUNDS = 5
BOX = 60.0  # sound min-image for rcut 10 (width/2 = 30); the chain's
# confinement diameter is ~44 A so periodic wrap stays physical.


def make_runner(pbc: bool):
    from flashmd_tpu.models.zoo import cgschnet_1enh_like
    from flashmd_tpu.simulation.langevin import LangevinSimulation

    print(f"[{time.strftime('%H:%M:%S')}] building pbc={pbc}",
          flush=True)
    ff, configs = cgschnet_1enh_like(
        n_atoms=266, batch_size=128, precision="bf16",
        message_passing="cheb",
    )
    print(f"[{time.strftime('%H:%M:%S')}] model built, attaching",
          flush=True)
    if pbc:
        cell = np.eye(3) * BOX
        configs = [
            dataclasses.replace(c, cell=cell.copy()) for c in configs
        ]
    sim = LangevinSimulation(
        dt=0.004, friction=1.0, n_timesteps=STEPS_PER_ROUND,
        save_interval=CHUNK, random_seed=103838, gptq="bf16",
        neighbor_skin=1.0, neighbor_rebuild_interval=10,
    )
    sim.attach_model_and_configurations(ff, configs, beta=1.67)
    carry = sim._init_carry(sim.initial_system, jax.random.PRNGKey(0))
    rollout = sim._build_rollout(1)
    print(f"[{time.strftime('%H:%M:%S')}] compiling rollout", flush=True)
    carry, _ = rollout(carry)  # compile
    jax.block_until_ready(carry["pos"])
    return rollout, carry


def main():
    runners = {}
    for pbc in (True, False):
        runners[pbc] = make_runner(pbc)
        print(f"compiled pbc={pbc}", flush=True)

    times = {True: [], False: []}
    n_chunks = STEPS_PER_ROUND // CHUNK
    for r in range(ROUNDS):
        for pbc in (True, False):
            rollout, carry = runners[pbc]
            t0 = time.perf_counter()
            for _ in range(n_chunks):
                carry, _ = rollout(carry)
            fence = float(jnp.sum(carry["pos"]))
            assert fence == fence
            dt = time.perf_counter() - t0
            runners[pbc] = (rollout, carry)
            thr = STEPS_PER_ROUND * 128 / dt
            times[pbc].append(thr)
            print(f"round {r} pbc={pbc}: {thr:9.1f} mol*step/s",
                  flush=True)

    med = {}
    for pbc in (True, False):
        ts = sorted(times[pbc])
        med[pbc] = ts[len(ts) // 2]
        print(f"pbc={pbc}: median {med[pbc]:9.1f} "
              f"(all: {' '.join(f'{t:.0f}' for t in times[pbc])})")
    print(f"pbc on/off: {med[True]:.1f} / {med[False]:.1f}  "
          f"({(med[True] / med[False] - 1) * 100:+.2f}%)")


if __name__ == "__main__":
    main()
