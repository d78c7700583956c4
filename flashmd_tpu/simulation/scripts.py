"""Console entry points: flashmd-langevin / flashmd-pt-langevin /
flashmd-nve-verlet.

Re-design of the reference scripts
(reference: src/flashmd/scripts/nvt_langevin.py:35-183,
nvt_pt_langevin.py:31-62, nve_verlet.py:26-67): parse config, attach model +
configurations, optionally wrap the run in a profiler window, simulate, and
report second-half throughput + memory. The reference's pre-import
env-zeroing for ``--disable_optim`` (nvt_langevin.py:6-17) is unnecessary
here — kernel selection is a config value, not an import-time global.
"""

from __future__ import annotations

import contextlib

import jax

from ..utils.io import logger, setup_logging
from .cli import parse_simulation_config
from .langevin import LangevinSimulation
from .parallel_tempering import PTSimulation
from .velocity_verlet import NVESimulation


@contextlib.contextmanager
def _maybe_profile(profile_dir: str):
    """jax.profiler trace window — the XLA analogue of the reference's
    torch.profiler/TensorBoard export (nvt_langevin.py:96-125)."""
    if profile_dir:
        with jax.profiler.trace(profile_dir):
            yield
    else:
        yield


def _report(simulation):
    """Throughput + memory report
    (reference: nvt_langevin.py:129-177)."""
    metrics = simulation.get_throughput_metrics()
    if metrics is None:
        return
    logger.info("=" * 50)
    logger.info("Throughput (second half of simulation):")
    logger.info(
        f"  steps: {metrics['second_half_steps']} x "
        f"{metrics['n_sims']} molecules"
    )
    logger.info(f"  elapsed: {metrics['second_half_elapsed_time']:.3f} s")
    logger.info(
        f"  throughput: {metrics['throughput']:.1f} timestep*mol/s"
    )
    logger.info(f"  ms/timestep: {metrics['ms_per_timestep']:.3f}")
    try:
        for dev in jax.local_devices():
            stats = dev.memory_stats()
            if stats and "peak_bytes_in_use" in stats:
                logger.info(
                    f"  peak device memory [{dev}]: "
                    f"{stats['peak_bytes_in_use'] / 1024 ** 3:.2f} GiB"
                )
    except Exception:  # pragma: no cover - backend dependent
        pass
    logger.info("=" * 50)


def _enable_compilation_cache():
    """Persistent XLA compilation cache for the console scripts: repeat
    runs of the same config skip the multi-minute TPU compile. The
    reference gets this for free from torch.compile/inductor's on-disk
    caches; jit needs it opted in. ``FLASHMD_TPU_COMPILATION_CACHE``
    overrides the directory; ``0``/``off`` disables."""
    import os

    target = os.environ.get("FLASHMD_TPU_COMPILATION_CACHE", "")
    if target.strip().lower() in ("0", "off", "false", "none"):
        return
    if not target:
        # Respect a cache the user configured through JAX's own knobs —
        # overriding their directory (or thresholds) here would silently
        # split/clobber their cache.
        if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
            return
        try:
            if jax.config.jax_compilation_cache_dir:
                return
        except AttributeError:  # pragma: no cover - jax version dependent
            pass
        target = os.path.join(
            os.path.expanduser("~"), ".cache", "flashmd_tpu", "xla"
        )
    try:
        os.makedirs(target, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", target)
        # Cache every compile that takes >= 1 s (the default 2-entry-size
        # / 1-min thresholds would skip mid-size rollout programs).
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as exc:  # pragma: no cover - backend/version dependent
        logger.warning(f"compilation cache disabled: {exc}")


def _run(simulation_class, description: str, betas_are_list: bool = False):
    setup_logging()
    _enable_compilation_cache()
    model, data_list, betas, simulation, profile = parse_simulation_config(
        simulation_class, description
    )
    if betas_are_list and not isinstance(betas, (list, tuple)):
        betas = [betas]
    simulation.attach_model_and_configurations(model, data_list, betas)
    with _maybe_profile(profile):
        simulation.simulate()
    _report(simulation)
    return simulation


def nvt_langevin_main():
    return _run(LangevinSimulation, "NVT Langevin (BAOAB) simulation")


def nvt_pt_langevin_main():
    return _run(
        PTSimulation,
        "Parallel-tempering Langevin simulation",
        betas_are_list=True,
    )


def nve_verlet_main():
    return _run(NVESimulation, "NVE velocity-Verlet simulation")


# Console-script wrappers: the ``*_main`` functions return the Simulation
# object for programmatic use (tests, notebooks), but setuptools entry
# points call ``sys.exit(main())`` — a truthy return would print the repr
# and exit 1 on a fully successful run.
def nvt_langevin_cli() -> None:
    nvt_langevin_main()


def nvt_pt_langevin_cli() -> None:
    nvt_pt_langevin_main()


def nve_verlet_cli() -> None:
    nve_verlet_main()


if __name__ == "__main__":  # pragma: no cover
    nvt_langevin_main()
