"""Measure the min pair distance over a bench-length trajectory.

Validates the cheb_d_min fit-domain floor against real dynamics: runs the
headline config (266 beads, batch 128, BAOAB at beta 1.67) for
BENCH_STEPS steps and reports the smallest pair distance any molecule
ever exhibits at a saved frame. The fit-domain restriction is sound when
this stays above cheb_d_min with margin; the in-run guard
(simulation/base.py:_pair_floor_outputs) warns otherwise.
"""
import os
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

from flashmd_tpu.models.zoo import cgschnet_1enh_like
from flashmd_tpu.simulation.langevin import LangevinSimulation

n_steps = int(os.environ.get("BENCH_STEPS", "600"))
d_min = float(os.environ.get("FIT_DMIN", "2.0"))

ff, configs = cgschnet_1enh_like(
    n_atoms=266, batch_size=128, precision="bf16", message_passing="cheb",
)
import dataclasses

ff = ff.replace(
    schnet_config=dataclasses.replace(ff.schnet_config, cheb_d_min=d_min)
)

sim = LangevinSimulation(
    dt=0.004,
    friction=1.0,
    n_timesteps=n_steps,
    save_interval=25,
    random_seed=103838,
    gptq="bf16",
)
sim.attach_model_and_configurations(ff, configs, beta=1.67)
sim.simulate()

coords = np.concatenate(sim.simulated_coords, axis=0)  # [frames, S, A, 3]
mins = []
for frame in coords:
    for s in range(0, frame.shape[0], 16):
        blk = frame[s:s + 16]
        rel = blk[:, None, :, :] - blk[:, :, None, :]
        d2 = np.sum(rel * rel, axis=-1)
        a = blk.shape[1]
        d2[:, np.arange(a), np.arange(a)] = np.inf
        mins.append(np.sqrt(d2.min()))
print(
    f"min pair distance over {coords.shape[0]} frames x 128 mols "
    f"({n_steps} steps): {min(mins):.3f}  (cheb_d_min = {d_min})",
    flush=True,
)
