"""Run every BASELINE.json benchmark config and print a JSON-lines table.

Configs (BASELINE.json "configs"):
  1. batch 8, fp32, optimizations off (reference-parity path)
  2. batch 128, bf16 filter/output nets (headline)
  3. parallel tempering, 3 replicas (betas 1.67/1.42/1.16), on-device exchange
  4. larger CG proteins (A = 532) stressing the pair kernels
  5. batch+replica sharding across 8 devices (virtual CPU mesh when only
     one real chip is attached; run on a v5e-8 slice for real numbers)

Usage: python benchmarks/run_all.py [--quick] [--only SUBSTR]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from bench import mfu_fields as _mfu_fields
from flashmd_tpu.simulation.scripts import _enable_compilation_cache

_enable_compilation_cache()


def mfu_fields(ff, n_atoms, throughput):
    """Analytic kernel FLOPs + MFU — bench.py's own function (one
    formula, one BENCH_PEAK_TFLOPS knob, shared by both artifacts)."""
    return _mfu_fields(ff.schnet_config, n_atoms, throughput)


def bench_sim(sim_cls, ff, configs, betas, n_steps, chunk, **kwargs):
    sim = sim_cls(
        dt=0.004,
        friction=1.0,
        n_timesteps=n_steps,
        save_interval=chunk,
        random_seed=103838,
        gptq=None,
        **kwargs,
    )
    sim.attach_model_and_configurations(ff, configs, betas)
    key = jax.random.PRNGKey(0)
    carry = sim._init_carry(sim.initial_system, key)
    if sim.mesh is not None:
        from flashmd_tpu.parallel.mesh import shard_carry

        carry = shard_carry(carry, sim.mesh)
    rollout = sim._build_rollout(1)
    n_chunks = max(n_steps // chunk, 2)
    half = n_chunks // 2
    for _ in range(half):
        carry, _ = rollout(carry)
    float(jnp.sum(carry["pos"]))
    t0 = time.perf_counter()
    for _ in range(n_chunks - half):
        carry, _ = rollout(carry)
    # Scalar host fetch: through the axon tunnel block_until_ready can
    # return before the computation completes, so the timed region must
    # end with a value fetched from the final carry (same fence bench.py
    # uses; the chunks are carry-dependent so nothing can be elided).
    fence = float(jnp.sum(carry["pos"]))
    assert fence == fence, "NaN positions at the end of the timed run"
    elapsed = time.perf_counter() - t0
    steps = (n_chunks - half) * chunk
    return steps * sim.n_sims / elapsed


def _cfg_optim_off(n_steps, chunk):
    from flashmd_tpu.models.zoo import cgschnet_1enh_like
    from flashmd_tpu.simulation import LangevinSimulation

    ff, cfgs = cgschnet_1enh_like(
        batch_size=8, precision="fp32", message_passing="xla"
    )
    tp = bench_sim(
        LangevinSimulation, ff, cfgs, 1.67, n_steps, chunk,
        neighbor_skin=1.0, neighbor_rebuild_interval=10,
    )
    return {"config": "batch8_fp32_optim_off", "throughput": round(tp, 1)}


def _cfg_headline(n_steps, chunk):
    from flashmd_tpu.models.zoo import cgschnet_1enh_like
    from flashmd_tpu.simulation import LangevinSimulation

    ff, cfgs = cgschnet_1enh_like(
        batch_size=128, precision="bf16", message_passing="cheb"
    )
    tp = bench_sim(LangevinSimulation, ff, cfgs, 1.67, n_steps, chunk)
    return {
        "config": "batch128_bf16_headline",
        "throughput": round(tp, 1),
        "vs_baseline": round(tp / 2861.0, 3),
        **mfu_fields(ff, 266, tp),
    }


def _cfg_pt(n_steps, chunk):
    from flashmd_tpu.models.zoo import cgschnet_1enh_like
    from flashmd_tpu.simulation import PTSimulation

    ff, cfgs = cgschnet_1enh_like(
        batch_size=42, precision="bf16", message_passing="cheb"
    )
    tp = bench_sim(
        PTSimulation, ff, cfgs, [1.67, 1.42, 1.16], n_steps, chunk,
        exchange_interval=chunk,
    )
    return {
        "config": "pt_3replicas_onchip_exchange", "throughput": round(tp, 1)
    }


def _cfg_large(n_steps, chunk):
    from flashmd_tpu.models.zoo import cgschnet_1enh_like
    from flashmd_tpu.simulation import LangevinSimulation

    # Fidelity is SIZE-coupled in bf16: the accumulation error grows with
    # atom count (K = A reductions), so the flagship (48, 64) default
    # measured at A = 266 reads 9.05e-3 at A = 532 — over that size's own
    # 1.2x-floor budget (floor ~7.1e-3 at M2 = 96). The measured 532 grid
    # (benchmarks/fidelity_asym.py N_ATOMS=532 FIT_DMIN=2.0, 2026-08-18)
    # puts (64, 64) at 7.32e-3 = 1.03x floor — the frontier point for
    # this size.
    ff, cfgs = cgschnet_1enh_like(
        n_atoms=532, batch_size=32, precision="bf16", message_passing="cheb",
        cheb_order=64, cheb_order_deriv=64, cheb_d_min=2.0,
    )
    tp = bench_sim(LangevinSimulation, ff, cfgs, 1.67, n_steps, chunk)
    return {
        "config": "large_protein_A532_batch32",
        "throughput": round(tp, 1),
        **mfu_fields(ff, 532, tp),
    }


def _cfg_sharded(n_steps, chunk):
    n_dev = len(jax.devices())
    if n_dev == 1:
        return {
            "config": "sharded_multichip",
            "skipped": "single device attached; see tests/simulation/"
            "test_parallel.py for the 8-device virtual-mesh validation",
        }
    from flashmd_tpu.models.zoo import cgschnet_1enh_like
    from flashmd_tpu.parallel.mesh import make_replica_mesh
    from flashmd_tpu.simulation import LangevinSimulation

    ff, cfgs = cgschnet_1enh_like(
        batch_size=16 * n_dev, precision="bf16", message_passing="cheb"
    )
    tp = bench_sim(
        LangevinSimulation, ff, cfgs, 1.67, n_steps, chunk,
        mesh=make_replica_mesh(),
    )
    return {
        "config": f"sharded_{n_dev}dev_batch{16 * n_dev}",
        "throughput": round(tp, 1),
    }


def _cfg_mixed(n_steps, chunk):
    """BASELINE config "mixed-size batches": 266- and 532-bead proteins
    in ONE batch — a config the reference cannot serve at all
    (validate_data_list refuses, reference base.py:914-983). Every
    molecule is padded to A_max = 532 (static shapes are the TPU
    contract), so a 266-bead molecule costs a 532-bead slot; the row
    reports both the molecule throughput and the padding overhead vs
    running the same molecules in two homogeneous batches.
    """
    from flashmd_tpu.models.zoo import cgschnet_1enh_like
    from flashmd_tpu.simulation import LangevinSimulation

    # Identical SchNet config across sizes (explicit orders opt out of
    # the size-aware defaults, which would otherwise differ at 266/532
    # and fail stack_forcefields' identical-config check).
    kw = dict(
        precision="bf16", message_passing="cheb",
        cheb_order=64, cheb_order_deriv=64, cheb_d_min=2.0, seed=0,
    )
    ff_266, cfgs_266 = cgschnet_1enh_like(n_atoms=266, batch_size=1, **kw)
    ff_532, cfgs_532 = cgschnet_1enh_like(n_atoms=532, batch_size=1, **kw)
    half = 16
    ffs = [ff_266] * half + [ff_532] * half
    cfgs = cfgs_266 * half + cfgs_532 * half
    tp = bench_sim(LangevinSimulation, ffs, cfgs, 1.67, n_steps, chunk)
    return {
        "config": "mixed_266_532_batch32",
        "throughput": round(tp, 1),
        "note": "266-bead molecules padded to 532 (static shapes); "
        "reference refuses mixed batches outright",
    }


CONFIGS = [
    ("batch8_fp32_optim_off", _cfg_optim_off),
    ("batch128_bf16_headline", _cfg_headline),
    ("pt_3replicas_onchip_exchange", _cfg_pt),
    ("large_protein_A532_batch32", _cfg_large),
    ("sharded_multichip", _cfg_sharded),
    ("mixed_266_532_batch32", _cfg_mixed),
]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    parser.add_argument(
        "--only", default=None,
        help="run just the configs whose name contains this substring",
    )
    args = parser.parse_args()

    n_steps = 200 if args.quick else 600
    chunk = 50 if args.quick else 100
    for name, fn in CONFIGS:
        if args.only is not None and args.only not in name:
            continue
        print(json.dumps(fn(n_steps, chunk)), flush=True)


if __name__ == "__main__":
    main()
