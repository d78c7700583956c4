"""CLI / config parsing for the simulation entry points.

Re-design of the reference CLI (reference: src/flashmd/simulation/cli.py:22-245
built on jsonargparse) using stdlib argparse with the same surface:

* ``--config <yaml>`` with a ``simulation:`` section whose keys are the
  ``Simulation.__init__`` kwargs (the reference exposes these via signature
  introspection; we do the same), plus top-level ``betas``, ``model_file``,
  ``structure_file``.
* ``--simulation.<name> <value>`` command-line overrides.
* ``--batch_size`` trim/duplicate semantics (reference cli.py:131-158).
* the parsed config is echoed to ``<filename>_config.yaml``
  (reference cli.py:100-112).
* ``--disable_optim`` switches the model to the un-optimized path
  (fp32 MLPs, XLA message passing) for A/B comparisons — the analogue of
  the reference's env-var zeroing pre-import hook
  (reference: scripts/nvt_langevin.py:6-17).
"""

from __future__ import annotations

import argparse
import dataclasses
import inspect
import os
from copy import deepcopy
from typing import Any, Dict, List, Optional, Tuple

from ..data.system import Configuration
from ..models.forcefield import ForceField
from ..utils.io import dump_yaml, load_yaml, logger
from .base import Simulation


def _simulation_kwargs(simulation_class) -> Dict[str, inspect.Parameter]:
    """All keyword parameters accepted by the simulation class chain."""
    params: Dict[str, inspect.Parameter] = {}
    for cls in reversed(simulation_class.__mro__):
        if cls in (object,):
            continue
        try:
            sig = inspect.signature(cls.__init__)
        except (TypeError, ValueError):
            continue
        for name, p in sig.parameters.items():
            if name in ("self", "args", "kwargs"):
                continue
            params[name] = p
    return params


def _coerce(value: str, default: Any, name: str = "option"):
    """String -> python coercion for ``--simulation.<name>`` overrides.

    A value that looks numeric but fails to parse (e.g. ``--simulation.dt
    0.00x4``) is an ERROR when the option's default is numeric — passing
    the raw string through would surface later as an opaque jit/trace
    failure (or worse, a silently-string-typed knob)."""
    if isinstance(value, str):
        low = value.lower()
        if low in ("none", "null"):
            return None
        if low in ("true", "false"):
            return low == "true"
        if isinstance(default, bool):
            return low in ("1", "true", "yes")
        for cast in (int, float):
            try:
                return cast(value)
            except (TypeError, ValueError):
                continue
        if isinstance(default, (int, float)):
            raise ValueError(
                f"--simulation.{name}={value!r} is not a valid number "
                f"(the option's default is {default!r})."
            )
    return value


def build_parser(
    simulation_class, description: str = "Simulation command line tool"
) -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description=description, allow_abbrev=False
    )
    parser.add_argument(
        "--config",
        type=str,
        default=None,
        help="Path to a configuration file in yaml format.",
    )
    parser.add_argument(
        "-tm",
        "--betas",
        type=float,
        nargs="+",
        default=None,
        help="inverse temperature(s) (1/kBT) at which the simulation runs",
    )
    parser.add_argument(
        "-mf",
        "--model_file",
        type=str,
        default=None,
        help="path to the model file: a reference model_and_prior.pt "
        "checkpoint or a native .pkl force field",
    )
    parser.add_argument(
        "-sf",
        "--structure_file",
        type=str,
        default=None,
        help="path to the starting configurations (.pt or .pkl)",
    )
    parser.add_argument(
        "-p",
        "--profile",
        type=str,
        default="",
        help="Directory/prefix for jax.profiler trace output.",
    )
    parser.add_argument(
        "-bs",
        "--batch_size",
        type=int,
        default=None,
        help="Number of molecules to simulate (trim or duplicate the "
        "structure file to this count).",
    )
    parser.add_argument(
        "--disable_optim",
        action="store_true",
        help="Run the un-optimized baseline path (fp32 MLPs, plain XLA "
        "message passing, no Pallas kernels) for A/B comparison.",
    )
    parser.add_argument(
        "--allow_unconvertible",
        action="store_true",
        help="Skip (with a warning) checkpoint entries that cannot be "
        "converted and priors whose neighbor lists are missing from the "
        "structure file, instead of erroring. Skipping changes the "
        "simulated physics — only use when you know what you are dropping.",
    )
    # expose every Simulation.__init__ kwarg as --simulation.<name>
    for name, p in _simulation_kwargs(simulation_class).items():
        parser.add_argument(
            f"--simulation.{name}", dest=f"simulation.{name}", default=None
        )
    return parser


def apply_batch_size(
    initial_data_list: List[Configuration], batch_size: Optional[int]
) -> List[Configuration]:
    """Trim or duplicate configurations (reference cli.py:131-158)."""
    if batch_size is None:
        return initial_data_list
    native_count = len(initial_data_list)
    if batch_size <= 0:
        raise ValueError(f"batch_size must be positive, got {batch_size}")
    if batch_size < native_count:
        logger.info(f"Using {batch_size} of {native_count} native molecules")
        return initial_data_list[:batch_size]
    if batch_size > native_count:
        full_copies = batch_size // native_count
        remainder = batch_size % native_count
        expanded = []
        for _ in range(full_copies):
            expanded.extend(deepcopy(d) for d in initial_data_list)
        expanded.extend(
            deepcopy(initial_data_list[i]) for i in range(remainder)
        )
        logger.info(
            f"Expanded {native_count} native molecules to {batch_size} "
            f"({full_copies} full copies + {remainder} extra)"
        )
        return expanded
    logger.info(f"Using all {native_count} native molecules")
    return initial_data_list


def load_model_file(path: str, allow_unconvertible: bool = False):
    """Load a force field + configurations source model.

    ``.pt`` files are treated as reference ``model_and_prior.pt`` pickles and
    converted (see flashmd_tpu.models.checkpoint_io); native ``.pkl`` files
    contain a pickled conversion result.
    """
    from ..models import checkpoint_io

    if path.endswith(".pt"):
        return checkpoint_io.load_reference_checkpoint(
            path, allow_unconvertible=allow_unconvertible
        )
    return checkpoint_io.load_native_model(path)


def load_structure_file(path: str) -> List[Configuration]:
    from ..models import checkpoint_io

    if path.endswith(".pt"):
        return checkpoint_io.load_reference_configurations(path)
    return checkpoint_io.load_native_configurations(path)


def _auto_cheb_d_min(configs: List[Configuration], rcut: float) -> float:
    """Fit-domain floor = 0.7 x the min pair distance over the structures.

    The 0.7 factor is the measured dynamic dip of the headline system: a
    5000-step x 128-molecule trajectory bottoms out at 2.047 A against an
    initial-geometry min of 2.80 A (= 0.73; benchmarks/pair_floor_traj.py,
    PERFORMANCE.md). The runtime pair-floor guard
    (Simulation._pair_floor_outputs) warns if a simulation undercuts the
    derived floor, and pairs below it get first-order-extrapolated
    filter values rather than a runaway tail (models/cheb.py).

    Distances are raw euclidean (no minimum image), so periodic
    structures are refused — pass an explicit FLASHMD_TPU_CHEB_DMIN for
    those. The derived floor must land inside [0, rcut); degenerate
    structures (no pair, or min pair distance so large the floor would
    reach the cutoff) raise rather than crash later with an opaque
    config error.
    """
    import numpy as np

    d2_min = np.inf
    for c in configs:
        if getattr(c, "cell", None) is not None:
            raise ValueError(
                "FLASHMD_TPU_CHEB_DMIN=auto uses raw euclidean pair "
                "distances and cannot derive a sound floor for periodic "
                "structures (the closest minimum-image pair may cross "
                "the boundary). Pass an explicit distance instead."
            )
        pos = np.asarray(c.pos, dtype=np.float64)
        # |p_i - p_j|^2 via the Gram trick: O(A^2) memory, no [A, A, 3].
        sq = np.sum(pos * pos, axis=1)
        d2 = sq[:, None] + sq[None, :] - 2.0 * (pos @ pos.T)
        np.fill_diagonal(d2, np.inf)
        d2_min = min(d2_min, float(d2.min()))
    if not np.isfinite(d2_min):
        raise ValueError(
            "FLASHMD_TPU_CHEB_DMIN=auto needs at least one structure "
            "with >= 2 atoms to derive the fit-domain floor."
        )
    d_min = round(0.7 * float(np.sqrt(max(d2_min, 0.0))), 2)
    if d_min >= rcut:
        raise ValueError(
            f"FLASHMD_TPU_CHEB_DMIN=auto derived {d_min} A, which is not "
            f"below the model cutoff {rcut} A — the structures' minimum "
            "pair distance is too large for a restricted-domain fit to "
            "make sense. Pass an explicit distance or unset the flag."
        )
    return d_min


def parse_simulation_config(
    simulation_class,
    description: str = "Simulation command line tool",
    args=None,
) -> Tuple[ForceField, List[Configuration], Any, Simulation, str]:
    """Parse config + CLI and instantiate everything.

    Returns (model, initial_data_list, betas, simulation, profile) —
    the same tuple as the reference ``parse_simulation_config``
    (reference: cli.py:22-167).
    """
    parser = build_parser(simulation_class, description)
    ns = parser.parse_args(args=args)

    config: Dict[str, Any] = {"simulation": {}}
    if ns.config:
        config.update(load_yaml(ns.config) or {})
        config.setdefault("simulation", {})

    sim_params = _simulation_kwargs(simulation_class)
    for name, p in sim_params.items():
        cli_val = getattr(ns, f"simulation.{name}", None)
        if cli_val is not None:
            default = (
                p.default if p.default is not inspect.Parameter.empty else None
            )
            config["simulation"][name] = _coerce(cli_val, default, name)

    for key in ("betas", "model_file", "structure_file", "batch_size"):
        val = getattr(ns, key)
        if val is not None:
            config[key] = val
    config["profile"] = ns.profile

    # Reference-compat: drop torch-only keys silently.
    sim_kwargs = {
        k: v
        for k, v in config["simulation"].items()
        if k in sim_params
    }
    unknown = set(config["simulation"]) - set(sim_kwargs)
    if unknown:
        logger.warning(f"Ignoring unknown simulation options: {unknown}")

    if ns.disable_optim:
        # gptq=None + _disable_optimizations below; NOT via os.environ —
        # mutating the process env would leak the opt-out into later
        # parses in the same process (the reference mutates env only
        # because its flags are read at import time, nvt_langevin.py:6-17).
        sim_kwargs["gptq"] = None

    # Echo the config (reference cli.py:100-112).
    out_name = sim_kwargs.get("filename")
    if out_name is not None:
        exported = {k: v for k, v in config.items() if k != "config"}
        output_dir = sim_kwargs.get("output_dir", "./outputs")
        os.makedirs(output_dir, exist_ok=True)
        dump_yaml(
            os.path.join(output_dir, f"{out_name}_config.yaml"), exported
        )

    model = load_model_file(
        str(config["model_file"]),
        allow_unconvertible=ns.allow_unconvertible,
    )
    # raw list kept for derivations that only need the UNIQUE structures
    # (apply_batch_size deepcopy-expands to the batch).
    raw_data_list = load_structure_file(str(config["structure_file"]))
    initial_data_list = apply_batch_size(
        raw_data_list, config.get("batch_size")
    )

    # A reference model_and_prior.pt (or a natively re-pickled conversion of
    # one) arrives as a ReferenceModel: bind it to the loaded molecule here,
    # mirroring the reference attach order — model load, then structure
    # load, then model<->structure binding (reference cli.py:115-128 +
    # base.py:319-369, where prior specialization happens at attach).
    # optimize=True lands on the cheb/bf16 fast path when eligible
    # (reference runs all optimizations by default, schnet.py:52-91);
    # --disable_optim below restores the fp32/xla baseline.
    from ..models.checkpoint_io import ReferenceModel, build_forcefield

    if isinstance(model, ReferenceModel):
        if not initial_data_list:
            raise ValueError(
                "structure_file contains no configurations; cannot bind "
                "the reference checkpoint to a molecule."
            )
        model = build_forcefield(
            model,
            initial_data_list[0],
            optimize=not ns.disable_optim,
            allow_missing_priors=ns.allow_unconvertible,
            # frontier measurement sees the UNIQUE structures, not the
            # batch_size-duplicated list
            tune_configurations=raw_data_list,
        )

    # Reference env-flag compatibility (schnet.py:52-56): any MLCG_USE_*
    # flag set to "0" falls back to the un-optimized XLA path, mirroring
    # the reference's per-kernel opt-out semantics. FLASHMD_TPU_MESSAGE_
    # PASSING selects a specific implementation explicitly.
    mlcg_flags = [
        "MLCG_USE_TRITON_MESSAGE_PASSING",
        "MLCG_USE_FUSED_RBF",
        "MLCG_USE_FUSED_TANH_LINEAR",
        "MLCG_USE_CSR",
        "MLCG_USE_SRC_CSR_GRAD_X",
    ]
    env_disable = any(os.environ.get(k) == "0" for k in mlcg_flags)
    mp_override = os.environ.get("FLASHMD_TPU_MESSAGE_PASSING")

    if isinstance(model, ForceField) and model.schnet_config is not None:
        if ns.disable_optim or env_disable:
            model = _disable_optimizations(model)
        elif mp_override:
            model = model.replace(
                schnet_config=dataclasses.replace(
                    model.schnet_config, message_passing=mp_override
                )
            )
        # Opt-in fit-domain restriction (SchNetConfig.cheb_d_min): fit the
        # Chebyshev filter on [d_min, rcut] only. Off by default for user
        # checkpoints (exact [0, rcut] semantics); sound when the system's
        # repulsive prior floors the approach distance above d_min — the
        # engine samples a min-pair-distance check at every export.
        # FLASHMD_TPU_CHEB_DMIN=auto derives the floor from the loaded
        # structures (_auto_cheb_d_min).
        dmin_override = os.environ.get("FLASHMD_TPU_CHEB_DMIN")
        if dmin_override and not (ns.disable_optim or env_disable):
            rcut = float(model.schnet_config.cutoff.cutoff_upper)
            if dmin_override.strip().lower() == "auto":
                d_min = _auto_cheb_d_min(raw_data_list, rcut)
                logger.info(
                    "FLASHMD_TPU_CHEB_DMIN=auto: Chebyshev fit-domain "
                    f"floor {d_min} A (0.7 x the initial structures' min "
                    "pair distance; the engine warns if the dynamics "
                    "undercut it)"
                )
            else:
                d_min = float(dmin_override)
            model = model.replace(
                schnet_config=dataclasses.replace(
                    model.schnet_config, cheb_d_min=d_min
                )
            )
            # A reloaded specialized dump carries the PREVIOUS domain's
            # fitted coefficients baked into schnet_params — evaluating
            # them on the new d_min's z-mapping would be silently wrong
            # physics. Strip the fit so attach re-fits on [d_min, rcut].
            if (
                model.schnet_params is not None
                and "cheb_fit" in model.schnet_params
            ):
                params = dict(model.schnet_params)
                params.pop("cheb_fit")
                model = model.replace(schnet_params=params)

    # Mesh from config/CLI: `--simulation.mesh auto` shards the batch over
    # every visible device (after jax.distributed auto-init when a cluster
    # environment is present — multi-host DCN uses the same spelling);
    # `--simulation.mesh N` uses the first N devices. A Mesh object passed
    # programmatically is forwarded untouched.
    mesh_opt = sim_kwargs.get("mesh")
    if mesh_opt is not None and not hasattr(mesh_opt, "devices"):
        from ..parallel.mesh import initialize_distributed, make_replica_mesh

        initialize_distributed()
        sim_kwargs["mesh"] = make_replica_mesh(
            None if str(mesh_opt).lower() == "auto" else int(mesh_opt)
        )

    simulation = simulation_class(**sim_kwargs)
    betas = config.get("betas")
    if isinstance(betas, (list, tuple)) and len(betas) == 1:
        betas = float(betas[0])

    return model, initial_data_list, betas, simulation, config["profile"]


def _disable_optimizations(model: ForceField) -> ForceField:
    """Baseline A/B path: fp32 MLPs + plain XLA message passing."""
    if model.schnet_config is None:
        return model
    return model.replace(
        schnet_config=dataclasses.replace(
            model.schnet_config, precision="fp32", message_passing="xla"
        )
    )
