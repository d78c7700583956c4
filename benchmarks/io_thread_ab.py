"""Same-process A/B of the pipelined export loop vs synchronous export
ordering on the production loop (sim.simulate() with full npy/checkpoint
export IO), plus the record of the IO-WORKER-THREAD dead end.

Pipelined (default): simulate() dispatches launch k+1 before fetching /
guarding / writing launch k's frames, so host IO overlaps device
compute. Synchronous: forced here via a no-op HOST sim_subroutine
(simulate() disables pipelining when a host subroutine may mutate the
carry between segments) — the physics is unchanged, so this is a true
A/B of the two orderings. Second-half throughput per the house
protocol; interleaved rounds so tunnel drift cancels.

DEAD END RECORD (2026-08-19, v5e-1): a further step — moving process()
(device->host fetch + guard + npy/checkpoint writes) onto a one-worker
ThreadPoolExecutor so the dispatch thread never blocks on IO — was
implemented, gated on FLASHMD_IO_THREAD, and measured with this
harness: +0.30% at the headline config (10698.7 vs 10667.2, within
same-day drift) and -1.72% at the IO-heavy config AB_CHUNK=10
AB_EXPORT=100 (10237.6 vs 10416.7). The pipelined dispatch already
keeps one launch in flight while process() runs, so the fetch almost
never stalls the device; the extra thread only buys handoff overhead
and GIL contention with the dispatch loop. Deleted per the house
keep-or-delete rule; output equality of the orderings is pinned by
tests/simulation/test_integrators.py::
test_pipelined_exports_match_synchronous.

Usage: python benchmarks/io_thread_ab.py  (on the TPU chip)
  AB_STEPS / AB_CHUNK / AB_EXPORT / AB_ROUNDS override the config.
"""

import os
import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

# Both arms trace identical HLO (the ordering is host-side), so the
# persistent compile cache collapses all simulate() compiles into one.
from flashmd_tpu.simulation.scripts import _enable_compilation_cache

_enable_compilation_cache()

STEPS = int(os.environ.get("AB_STEPS", "1000"))
CHUNK = int(os.environ.get("AB_CHUNK", "100"))
EXPORT = int(os.environ.get("AB_EXPORT", str(2 * CHUNK)))
ROUNDS = int(os.environ.get("AB_ROUNDS", "3"))


def run_once(td: str, tag: str, synchronous: bool) -> float:
    from flashmd_tpu.models.zoo import cgschnet_1enh_like
    from flashmd_tpu.simulation.langevin import LangevinSimulation

    ff, configs = cgschnet_1enh_like(
        n_atoms=266, batch_size=128, precision="bf16",
        message_passing="cheb",
    )
    kwargs = {}
    if synchronous:
        kwargs.update(
            sim_subroutine=lambda carry: carry,
            sim_subroutine_interval=EXPORT,
        )
    sim = LangevinSimulation(
        dt=0.004, friction=1.0, n_timesteps=STEPS,
        save_interval=CHUNK, export_interval=EXPORT,
        filename=f"ab_{tag}", output_dir=td,
        save_forces=True, save_energies=True,
        random_seed=103838, gptq="bf16",
        neighbor_skin=1.0, neighbor_rebuild_interval=10,
        **kwargs,
    )
    sim.attach_model_and_configurations(ff, configs, beta=1.67)
    sim.simulate()
    return sim.get_throughput_metrics()["throughput"]


def main():
    times = {"pipelined": [], "synchronous": []}
    with tempfile.TemporaryDirectory() as td:
        for r in range(ROUNDS):
            for arm in ("pipelined", "synchronous"):
                thr = run_once(td, f"r{r}_{arm}", arm == "synchronous")
                times[arm].append(thr)
                print(f"round {r} {arm}: {thr:9.1f} mol*step/s",
                      flush=True)

    for arm in ("pipelined", "synchronous"):
        ts = sorted(times[arm])
        print(f"{arm}: median {ts[len(ts) // 2]:9.1f} "
              f"(all: {' '.join(f'{t:.0f}' for t in times[arm])})")
    mp = sorted(times["pipelined"])[ROUNDS // 2]
    ms = sorted(times["synchronous"])[ROUNDS // 2]
    print(f"pipelined/synchronous: {mp:.1f} / {ms:.1f}  "
          f"({(mp / ms - 1) * 100:+.2f}%)")


if __name__ == "__main__":
    main()
