"""Checkpoint ingestion and native serialization.

The reference ships trained models as ``model_and_prior.pt`` — a fully
pickled torch module tree ``GradientsOut(SumOut({SchNet, priors...}))``
loaded through compatibility shims
(reference: src/flashmd/models/pyg_forward_compatibility.py:17-243) — and
starting structures as pickled lists of PyG ``AtomicData``.

This module reads both WITHOUT torch_geometric or the reference package
installed: a permissive unpickler materializes a stub class for any
unimportable symbol (tensors themselves are rebuilt by torch, which is
available), then the weights/buffers are walked out of the stub tree into
our functional pytrees:

* ``load_reference_checkpoint``  -> :class:`ReferenceModel` (torch-free
  numpy weights + metadata), convertible to a :class:`ForceField` with
  :func:`build_forcefield` once the molecule (types + prior index maps) is
  known.
* ``load_reference_configurations`` -> list of :class:`Configuration`.
* ``save_native_model`` / ``load_native_model`` — the native format: a
  plain pickle of numpy-leaved pytrees (no torch required to read).

Weight-layout notes: torch ``Linear`` stores ``[out, in]``; our MLPs use
``[in, out]`` — transposed here once at conversion (the reference's W16A16
path does the same transpose+cast at attach time, gptq.py:132-189).
"""

from __future__ import annotations

import dataclasses
import io
import pickle
from typing import Any, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..data.system import Configuration, TermList, make_term_list
from ..models.cutoff import CosineCutoff, IdentityCutoff, ShiftedCosineCutoff
from ..models.forcefield import ForceField
from ..models.schnet import SchNetConfig
from ..ops.neighborlist import suggest_capacity
from ..prior.priors import Prior, _KIND_FEATURES, gather_type_params
from ..utils.io import logger

# ---------------------------------------------------------------------------
# Permissive unpickling
# ---------------------------------------------------------------------------

_STUB_CACHE: Dict[tuple, type] = {}


class _Stub:
    """Generic stand-in for an unimportable pickled class."""

    def __init__(self, *args, **kwargs):
        self._stub_args = args
        self._stub_kwargs = kwargs

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        elif isinstance(state, tuple):
            for part in state:
                if isinstance(part, dict):
                    self.__dict__.update(part)
        else:
            self.__dict__["_stub_state"] = state

    def __repr__(self):
        cls = type(self)
        return f"<stub {cls.__stub_module__}.{cls.__name__}>"


def _make_stub(module: str, name: str) -> type:
    key = (module, name)
    if key not in _STUB_CACHE:
        _STUB_CACHE[key] = type(
            name, (_Stub,), {"__stub_module__": module}
        )
    return _STUB_CACHE[key]


class _ShimUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        try:
            return super().find_class(module, name)
        except (ImportError, AttributeError, ModuleNotFoundError):
            return _make_stub(module, name)


class _ShimPickleModule:
    """Minimal pickle-module facade for torch.load(pickle_module=...)."""

    Unpickler = _ShimUnpickler
    load = staticmethod(pickle.load)

    @staticmethod
    def loads(data, **kwargs):
        return _ShimUnpickler(io.BytesIO(data), **kwargs).load()


def _torch_load_with_stubs(path: str):
    import torch

    return torch.load(
        path,
        map_location="cpu",
        weights_only=False,
        pickle_module=_ShimPickleModule,
    )


# ---------------------------------------------------------------------------
# Stub-tree traversal helpers
# ---------------------------------------------------------------------------


def _class_name(obj) -> str:
    return type(obj).__name__


def _children(mod) -> Dict[str, Any]:
    """Child modules of a torch module or stub."""
    d = getattr(mod, "_modules", None)
    return dict(d) if d else {}


def _attr(mod, name, default=None):
    """Attribute lookup across __dict__, _parameters, _buffers, _modules."""
    if mod is None:
        return default
    for source in ("__dict__",):
        d = getattr(mod, source, {})
        if name in d:
            return d[name]
    for source in ("_parameters", "_buffers", "_modules"):
        d = getattr(mod, source, None)
        if d and name in d:
            return d[name]
    return getattr(mod, name, default)


def _np(tensor) -> np.ndarray:
    """torch tensor (possibly sparse) -> numpy."""
    if tensor is None:
        return None
    if isinstance(tensor, np.ndarray):
        return tensor
    t = tensor.detach()
    if t.is_sparse:
        t = t.to_dense()
    return t.cpu().numpy()


def _linear_np(linear) -> Dict[str, np.ndarray]:
    """torch Linear -> {'w' [in, out], 'b' [out]?} (transposed)."""
    out = {"w": _np(_attr(linear, "weight")).T.copy()}
    b = _attr(linear, "bias")
    if b is not None:
        out["b"] = _np(b)
    return out


def _mlp_np(mlp) -> Dict[str, list]:
    """Reference MLP (.layers Sequential of Linear/activation) -> params."""
    layers_mod = _attr(mlp, "layers")
    layers = []
    for child in _children(layers_mod).values():
        if _attr(child, "weight") is not None:
            layers.append(_linear_np(child))
    return {"layers": layers}


def _output_network_np(mod):
    """SchNet output network -> params. Handles both a plain reference MLP
    and a TypesMLP (reference mlp.py:60-121): a shared-weights TypesMLP
    collapses to its single MLP; a per-species one becomes the
    ``{"species", "mlps"}`` bank consumed by ``types_mlp_apply``."""
    if _class_name(mod) == "TypesMLP":
        inner = _attr(mod, "mlp")
        species = _attr(mod, "species")
        if species is None:
            return _mlp_np(inner)
        return {
            "species": _np(species).astype(np.int32),
            "mlps": [_mlp_np(m) for m in _children(inner).values()],
        }
    return _mlp_np(mod)


def _output_first_mlp(output: dict) -> dict:
    """The (or a representative) plain-MLP params of an output network."""
    return output["mlps"][0] if "mlps" in output else output


def _activation_name(mlp) -> str:
    layers_mod = _attr(mlp, "layers")
    for child in _children(layers_mod).values():
        name = _class_name(child).lower()
        if name in ("tanh", "relu", "silu"):
            return name
    return "tanh"


def _cutoff_from(cutoff_mod):
    name = _class_name(cutoff_mod)
    lower = float(_attr(cutoff_mod, "cutoff_lower", 0.0) or 0.0)
    upper = float(_attr(cutoff_mod, "cutoff_upper", 5.0))
    if name == "IdentityCutoff":
        return IdentityCutoff(lower, upper)
    if name == "ShiftedCosineCutoff":
        return ShiftedCosineCutoff(
            cutoff_upper=upper,
            smooth_width=float(_attr(cutoff_mod, "smooth_width", 0.5)),
        )
    return CosineCutoff(lower, upper)


# ---------------------------------------------------------------------------
# Intermediate torch-free model representation
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ReferencePrior:
    """A reference prior with dense type-indexed parameter tables."""

    kind: str
    name: str
    tables: Dict[str, np.ndarray]
    order: int
    n_degs: int = 0


@dataclasses.dataclass
class ReferenceModel:
    """Torch-free extraction of a model_and_prior.pt checkpoint."""

    schnet_params: Optional[dict]
    schnet_config: Optional[SchNetConfig]
    priors: List[ReferencePrior]


_PRIOR_CLASS_TO_KIND = {
    "HarmonicBonds": "harmonic_bonds",
    "HarmonicAngles": "harmonic_angles",
    "HarmonicAnglesRaw": "harmonic_angles_raw",
    "HarmonicImpropers": "harmonic_impropers",
    "ShiftedPeriodicHarmonicImpropers": "shifted_periodic_harmonic_impropers",
    "GeneralBonds": "general_bonds",
    "GeneralAngles": "general_angles",
    "Repulsion": "repulsion",
    "Dihedral": "dihedral",
    "FourierSeries": "dihedral",
    "Polynomial": "polynomial",
    "QuarticAngles": "quartic_angles",
    "RestrictedQuartic": "restricted_quartic",
}

_DEFAULT_ORDER = {
    "harmonic_bonds": 2,
    "harmonic_angles": 3,
    "harmonic_angles_raw": 3,
    "harmonic_impropers": 4,
    "shifted_periodic_harmonic_impropers": 4,
    "general_bonds": 2,
    "general_angles": 3,
    "repulsion": 2,
    "dihedral": 4,
    "polynomial": 3,
    "quartic_angles": 3,
    "restricted_quartic": 3,
}


def _unwrap_output_wrappers(mod):
    """GradientsOut(X) / EnergyOut(X) -> X, recursively.

    Both wrappers hold the wrapped module as ``.model`` and only re-route
    outputs (reference gradients.py:161-191 EnergyOut, :194-293
    GradientsOut); the physics is the wrapped module's."""
    while _class_name(mod) in ("GradientsOut", "EnergyOut"):
        mod = _attr(mod, "model")
    return mod


def _extract_schnet(schnet) -> tuple:
    """Stub SchNet -> (params pytree, SchNetConfig)."""
    embedding = _np(_attr(_attr(schnet, "embedding_layer"), "weight"))
    rbf_layer = _attr(schnet, "rbf_layer")
    offset = _np(_attr(rbf_layer, "offset"))
    coeff = _np(_attr(rbf_layer, "coeff"))
    rbf_cutoff = _cutoff_from(_attr(rbf_layer, "cutoff"))

    blocks = list(_children(_attr(schnet, "interaction_blocks")).values())
    interactions = []
    conv_cutoff = rbf_cutoff
    filter_act = "tanh"
    for block in blocks:
        conv = _attr(block, "conv")
        conv_cutoff = _cutoff_from(_attr(conv, "cutoff"))
        filt = _attr(conv, "filter_network")
        filter_act = _activation_name(filt)
        lin1 = _linear_np(_attr(conv, "lin1"))
        lin2 = _linear_np(_attr(conv, "lin2"))
        lin = _linear_np(_attr(block, "lin"))
        interactions.append(
            {
                "lin1_w": lin1["w"],
                "filter": _mlp_np(filt),
                "lin2_w": lin2["w"],
                "lin2_b": lin2.get(
                    "b", np.zeros(lin2["w"].shape[1], np.float32)
                ),
                "lin_w": lin["w"],
                "lin_b": lin.get(
                    "b", np.zeros(lin["w"].shape[1], np.float32)
                ),
            }
        )

    output = _output_network_np(_attr(schnet, "output_network"))
    params = {
        "embedding": embedding,
        "rbf": {"offset": offset, "coeff": coeff},
        "interactions": interactions,
        "output": output,
    }

    hidden = embedding.shape[1]
    config = SchNetConfig(
        hidden_channels=hidden,
        embedding_size=embedding.shape[0],
        num_filters=interactions[0]["lin1_w"].shape[1],
        num_interactions=len(interactions),
        num_rbf=offset.shape[0],
        cutoff=conv_cutoff,
        rbf_cutoff=rbf_cutoff,
        output_hidden_layer_widths=tuple(
            layer["w"].shape[1]
            for layer in _output_first_mlp(output)["layers"][:-1]
        ),
        activation=filter_act,
        max_num_neighbors=int(_attr(schnet, "max_num_neighbors", 1000)),
    )
    return params, config


def _extract_prior(name: str, prior) -> Optional[ReferencePrior]:
    cls = _class_name(prior)
    kind = _PRIOR_CLASS_TO_KIND.get(cls)
    if kind is None:
        logger.warning(
            f"Unknown prior class {cls!r} for model entry {name!r}; skipped."
        )
        return None
    nl_name = _attr(prior, "name", name)
    order = int(_attr(prior, "order", _DEFAULT_ORDER[kind]))
    tables: Dict[str, np.ndarray] = {}
    n_degs = int(_attr(prior, "n_degs", 0) or 0)
    if kind in (
        "harmonic_bonds",
        "harmonic_angles",
        "harmonic_angles_raw",
        "harmonic_impropers",
        "shifted_periodic_harmonic_impropers",
        "general_bonds",
        "general_angles",
    ):
        tables["x_0"] = _np(_attr(prior, "x_0"))
        tables["k"] = _np(_attr(prior, "k"))
    elif kind == "repulsion":
        tables["sigma"] = _np(_attr(prior, "sigma"))
    elif kind == "dihedral":
        tables["k1s"] = _np(_attr(prior, "k1s"))
        tables["k2s"] = _np(_attr(prior, "k2s"))
        tables["v_0"] = _np(_attr(prior, "v_0"))
    elif kind in ("polynomial", "quartic_angles"):
        tables["ks"] = _np(_attr(prior, "ks"))
        tables["v_0"] = _np(_attr(prior, "v_0"))
    elif kind == "restricted_quartic":
        for f in ("a", "b", "c", "d", "k", "v_0"):
            tables[f] = _np(_attr(prior, f))
    return ReferencePrior(
        kind=kind, name=str(nl_name), tables=tables, order=order,
        n_degs=n_degs,
    )


def extract_reference_model(
    root, allow_unconvertible: bool = False
) -> ReferenceModel:
    """Walk an unpickled (stubbed) module tree into a ReferenceModel.

    Handles the checkpoint contract GradientsOut(SumOut({name: model}))
    (reference: pyg_forward_compatibility.py:85-115 _search_for_model);
    ``EnergyOut``-wrapped entries unwrap like ``GradientsOut``.

    An entry that cannot be converted is a HARD ERROR by default —
    silently dropping a prior would change the physics of the
    simulation. ``allow_unconvertible=True`` downgrades it to a warning
    and skips the entry (explicit opt-in).
    """
    root = _unwrap_output_wrappers(root)
    schnet_params = None
    schnet_config = None
    priors: List[ReferencePrior] = []

    def handle_prior(name, entry):
        p = _extract_prior(name, entry)
        if p is not None:
            priors.append(p)
        elif not allow_unconvertible:
            raise ValueError(
                f"Checkpoint entry {name!r} (class "
                f"{_class_name(entry)!r}) is not convertible; refusing to "
                "silently drop physics. Pass allow_unconvertible=True "
                "(CLI: --allow_unconvertible) to skip it explicitly."
            )

    if _class_name(root) == "SumOut":
        models = _children(_attr(root, "models"))
        for name, entry in models.items():
            entry = _unwrap_output_wrappers(entry)
            if _class_name(entry) in ("SchNet", "StandardSchNet"):
                schnet_params, schnet_config = _extract_schnet(entry)
            else:
                handle_prior(name, entry)
    elif _class_name(root) in ("SchNet", "StandardSchNet"):
        schnet_params, schnet_config = _extract_schnet(root)
    else:
        handle_prior(_class_name(root), root)

    return ReferenceModel(
        schnet_params=schnet_params,
        schnet_config=schnet_config,
        priors=priors,
    )


def load_reference_checkpoint(
    path: str, allow_unconvertible: bool = False
) -> ReferenceModel:
    """model_and_prior.pt -> ReferenceModel
    (replaces reference load_and_adapt_old_checkpoint,
    pyg_forward_compatibility.py:227-243)."""
    root = _torch_load_with_stubs(path)
    if isinstance(root, tuple):
        # `<filename>_specialized_model_and_config.pt` stores
        # (model, configurations) (reference base.py:330-334).
        root = root[0]
    return extract_reference_model(
        root, allow_unconvertible=allow_unconvertible
    )


# ---------------------------------------------------------------------------
# Configurations (structure files)
# ---------------------------------------------------------------------------


def _find_mapping_dict(obj, depth: int = 0) -> Optional[dict]:
    """Locate the attribute dict of a pickled PyG Data object (its storage
    ``_mapping``), searching the stub graph defensively."""
    if depth > 4 or obj is None:
        return None
    if isinstance(obj, dict):
        if "pos" in obj and "atom_types" in obj:
            return obj
        for v in obj.values():
            found = _find_mapping_dict(v, depth + 1)
            if found is not None:
                return found
        return None
    d = getattr(obj, "__dict__", None)
    if d is not None:
        return _find_mapping_dict(d, depth + 1)
    return None


def _term_lists_from_reference_nl(nl_dict) -> Dict[str, TermList]:
    """Reference neighbor-list dicts -> TermLists
    (schema: src/flashmd/neighbor_list/neighbor_list.py:66-124)."""
    out = {}
    for name, nl in (nl_dict or {}).items():
        index_mapping = _np(nl["index_mapping"])
        rcut = nl.get("rcut")
        out[name] = make_term_list(
            index_mapping,
            tag=str(nl.get("tag", name)),
            order=int(nl.get("order", index_mapping.shape[0])),
            rcut=None if rcut is None else float(rcut),
            self_interaction=bool(nl.get("self_interaction") or False),
        )
    return out


def load_reference_configurations(path: str) -> List[Configuration]:
    """Pickled List[AtomicData] -> List[Configuration]."""
    raw = _torch_load_with_stubs(path)
    if not isinstance(raw, (list, tuple)):
        raw = [raw]
    configs = []
    for item in raw:
        mapping = _find_mapping_dict(item)
        if mapping is None:
            raise ValueError(
                f"Could not locate AtomicData fields in {type(item)!r}"
            )
        masses = mapping.get("masses")
        velocities = mapping.get("velocities")
        # Structure-level pair exclusions ride the AtomicData as
        # ``exc_pair_index`` (reference schnet.py:221-242); carry them so
        # build_forcefield can bind them to the neighbor search.
        exc = mapping.get("exc_pair_index")
        configs.append(
            Configuration(
                pos=_np(mapping["pos"]),
                atom_types=_np(mapping["atom_types"]).astype(np.int64),
                masses=None if masses is None else _np(masses),
                velocities=None if velocities is None else _np(velocities),
                neighbor_lists=_term_lists_from_reference_nl(
                    mapping.get("neighbor_list")
                ),
                exc_pair_index=None if exc is None else _np(exc),
                tag=str(mapping.get("tag", "")),
            )
        )
    return configs


# ---------------------------------------------------------------------------
# ReferenceModel + molecule -> ForceField
# ---------------------------------------------------------------------------


def build_prior(
    ref_prior: ReferencePrior,
    atom_types: np.ndarray,
    term_list: TermList,
    dtype=jnp.float32,
) -> Prior:
    """Specialize a dense-table reference prior onto one molecule.

    This is the conversion-time equivalent of the reference's per-step
    ``data2parameters`` gathers and of its opt-in specialization pass
    (specialize_prior.py:112-207)."""
    idx = jnp.asarray(term_list.index_mapping, dtype=jnp.int32)
    types = jnp.asarray(atom_types)
    t = ref_prior.tables
    kind = ref_prior.kind
    if kind == "dihedral":
        n_degs = t["k1s"].shape[0]
        params = {
            "k1s": jnp.stack(
                [
                    gather_type_params(t["k1s"][i], types, idx)
                    for i in range(n_degs)
                ],
                axis=1,
            ).astype(dtype),
            "k2s": jnp.stack(
                [
                    gather_type_params(t["k2s"][i], types, idx)
                    for i in range(n_degs)
                ],
                axis=1,
            ).astype(dtype),
            "v_0": gather_type_params(t["v_0"], types, idx)[:, None].astype(
                dtype
            ),
        }
    elif kind in ("polynomial", "quartic_angles"):
        n_degs = t["ks"].shape[0]
        params = {
            "ks": jnp.stack(
                [
                    gather_type_params(t["ks"][i], types, idx)
                    for i in range(n_degs)
                ],
                axis=0,
            ).astype(dtype),
            "v_0": gather_type_params(t["v_0"], types, idx).astype(dtype),
        }
    elif kind == "repulsion":
        params = {
            "sigma": gather_type_params(t["sigma"], types, idx).astype(dtype)
        }
    elif kind == "restricted_quartic":
        params = {
            f: gather_type_params(t[f], types, idx).astype(dtype)
            for f in ("a", "b", "c", "d", "k", "v_0")
        }
    else:  # harmonic family
        params = {
            "x0": gather_type_params(t["x_0"], types, idx).astype(dtype),
            "k": gather_type_params(t["k"], types, idx).astype(dtype),
        }
    return Prior(
        index_mapping=idx,
        params=params,
        kind=kind,
        name=ref_prior.name,
        feature=_KIND_FEATURES[kind],
    )


def optimized_schnet_config(
    config: SchNetConfig, has_exclusions: bool = False
) -> SchNetConfig:
    """Optimizations-on defaults for an ingested checkpoint.

    The reference runs every optimization by default (env flags default "1",
    reference: src/flashmd/models/schnet.py:52-91; compile by default,
    base.py:360-369) — so a converted checkpoint must land on the fast path
    by default too: the Chebyshev matmul-only CFConv at bf16 with the
    asymmetric-order fidelity floor (fwd 64 / deriv 96 — see
    PERFORMANCE.md and benchmarks/fidelity_asym.py), when eligible. Eligibility
    is the same condition the cheb dispatch enforces
    (models/schnet.py message_passing="cheb"): a zero-lower CosineCutoff.
    Ineligible models keep the exact gather path ("xla").
    ``--disable_optim`` restores fp32/xla downstream (simulation/cli.py).
    """
    if config is None:
        return config
    if has_exclusions:
        # The matmul-only cheb path evaluates ALL pairs within rcut — it
        # cannot drop excluded pairs. The gather path honors them.
        logger.info(
            "[convert] structure carries exc_pair_index; using the exact "
            "gather message-passing path (message_passing='xla', bf16)."
        )
        return dataclasses.replace(
            config, message_passing="xla", precision="bf16"
        )
    eligible = (
        isinstance(config.cutoff, CosineCutoff)
        and config.cutoff.cutoff_lower == 0
    )
    if not eligible:
        logger.info(
            "[convert] cutoff is not a zero-lower CosineCutoff; using the "
            "exact gather message-passing path (message_passing='xla')."
        )
        return dataclasses.replace(config, message_passing="xla")
    logger.info(
        "[convert] optimizations ON by default: message_passing='cheb', "
        "precision='bf16', cheb_order=64/96 (use --disable_optim for the "
        "fp32/xla baseline path)."
    )
    return dataclasses.replace(
        config, message_passing="cheb", precision="bf16",
        cheb_order=64, cheb_order_deriv=96,
    )


def build_forcefield(
    ref_model: ReferenceModel,
    configuration: Configuration,
    dtype=jnp.float32,
    neighbor_capacity: Optional[int] = None,
    optimize: bool = True,
    allow_missing_priors: bool = False,
    tune_configurations: Optional[List[Configuration]] = None,
) -> ForceField:
    """Bind a converted checkpoint to a molecule -> runnable ForceField.

    ``optimize=True`` (the default, matching the reference's
    optimizations-on-by-default) selects the fast message-passing path via
    :func:`optimized_schnet_config`, then — when the result is the cheb
    path — MEASURES the fidelity frontier on the starting structures and
    picks the cheapest (orders, fit domain) within 1.2x the bf16 floor
    (models/frontier.py; FLASHMD_TPU_AUTOFRONTIER=0 keeps the
    conservative full-domain default). ``optimize=False`` keeps the exact
    fp32/xla parity path.

    ``tune_configurations`` are the structures the frontier measurement
    runs on (default: just ``configuration``).

    A prior whose neighbor list is missing from the structure is a HARD
    ERROR by default (dropping it would silently change the physics);
    ``allow_missing_priors=True`` downgrades to a warning and skips.
    """
    schnet_params = None
    if ref_model.schnet_params is not None:
        schnet_params = _tree_to_jnp(ref_model.schnet_params, dtype)
    schnet_config = ref_model.schnet_config
    exc = configuration.exc_pair_index
    if optimize and schnet_config is not None:
        schnet_config = optimized_schnet_config(
            schnet_config, has_exclusions=exc is not None
        )
        if (
            schnet_config.message_passing == "cheb"
            and schnet_params is not None
        ):
            from .frontier import autofrontier_enabled, select_cheb_frontier

            if autofrontier_enabled():
                schnet_config = select_cheb_frontier(
                    schnet_params,
                    schnet_config,
                    tune_configurations or [configuration],
                )

    priors = {}
    for rp in ref_model.priors:
        if rp.name not in configuration.neighbor_lists:
            if not allow_missing_priors:
                raise ValueError(
                    f"The checkpoint's prior {rp.name!r} has no matching "
                    "neighbor list in the structure file; refusing to "
                    "silently drop physics. Pass allow_missing_priors="
                    "True (CLI: --allow_unconvertible) to skip it "
                    "explicitly."
                )
            logger.warning(
                f"Structure has no neighbor list {rp.name!r}; prior skipped."
            )
            continue
        prior = build_prior(
            rp,
            configuration.atom_types,
            configuration.neighbor_lists[rp.name],
            dtype=dtype,
        )
        # Large fully-connected repulsion lists evaluate faster densely.
        if (
            prior.kind == "repulsion"
            and prior.n_terms > 4 * configuration.n_atoms
        ):
            from ..prior.priors import densify_repulsion

            prior = densify_repulsion(prior, configuration.n_atoms)
        priors[rp.name] = prior

    if neighbor_capacity is None:
        if schnet_config is not None:
            # Measure the real max neighbor count at rcut + 1.0 (so the
            # Verlet-skin search never overflows) with the native
            # cell-list engine; O(A) host-side instead of a guess.
            from ..native import max_neighbor_count

            rcut = float(ref_model.schnet_config.cutoff.cutoff_upper)
            n_max = max_neighbor_count(
                configuration.pos, rcut + 1.0, cell=configuration.cell
            )
            neighbor_capacity = suggest_capacity(n_max, slack=1.35)
        else:
            neighbor_capacity = suggest_capacity(
                min(configuration.n_atoms, 160)
            )
        neighbor_capacity = min(neighbor_capacity, configuration.n_atoms)
    return ForceField(
        schnet_params=schnet_params,
        priors=priors,
        schnet_config=schnet_config,
        neighbor_capacity=neighbor_capacity,
        exc_pair_index=None if exc is None else jnp.asarray(exc, jnp.int32),
    )


def _tree_to_jnp(tree, dtype):
    if isinstance(tree, dict):
        return {k: _tree_to_jnp(v, dtype) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_tree_to_jnp(v, dtype) for v in tree]
    arr = np.asarray(tree)
    if np.issubdtype(arr.dtype, np.floating):
        return jnp.asarray(arr, dtype=dtype)
    return jnp.asarray(arr)


# ---------------------------------------------------------------------------
# Native formats
# ---------------------------------------------------------------------------


def save_native_model(model, path: str):
    """Pickle a ReferenceModel or ForceField with numpy leaves."""
    import jax

    if isinstance(model, ForceField):
        model = jax.tree.map(np.asarray, model)
    with open(path, "wb") as f:
        pickle.dump(model, f)


SPECIALIZED_DUMP_FORMAT = "flashmd_tpu_specialized_model_and_config_v1"


def save_specialized_dump(model, configs: List[Configuration], path: str):
    """Write the simulation's ``_specialized_model_and_config.pkl`` dump
    (native analog of the reference's ``_specialized_model_and_config.pt``,
    reference base.py:330-334): the fully attached model with numpy leaves
    + the configurations, tagged so the loaders unwrap it by intent
    rather than by container type."""
    import jax

    payload = {
        "format": SPECIALIZED_DUMP_FORMAT,
        "model": jax.tree.map(np.asarray, model),
        "configurations": configs,
    }
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def _unwrap_specialized(obj, key: str):
    if (
        isinstance(obj, dict)
        and obj.get("format") == SPECIALIZED_DUMP_FORMAT
    ):
        return obj[key]
    return obj


def load_native_model(path: str):
    """Load a native model pkl; a specialized dump
    (:func:`save_specialized_dump`) unwraps to the model."""
    with open(path, "rb") as f:
        obj = pickle.load(f)
    return _unwrap_specialized(obj, "model")


def save_native_configurations(configs: List[Configuration], path: str):
    with open(path, "wb") as f:
        pickle.dump(configs, f)


def load_native_configurations(path: str) -> List[Configuration]:
    """Load a native structure pkl; a specialized dump
    (:func:`save_specialized_dump`) unwraps to the configurations."""
    with open(path, "rb") as f:
        obj = pickle.load(f)
    return _unwrap_specialized(obj, "configurations")
