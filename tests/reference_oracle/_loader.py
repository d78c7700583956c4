"""Load the PyG-free reference modules directly from /root/reference/src.

The reference package ``__init__`` chains import torch_geometric (absent in
this environment), so the torch-only leaf modules are loaded by file path
under a synthetic ``refmd.*`` package skeleton. Relative imports inside the
loaded files (``from ..cutoff import ...``) resolve against that skeleton,
so modules are loaded in dependency order.

Loaded oracles (all verified torch-only):
* refmd.geometry.internal_coordinates  <- geometry/internal_coordinates.py
* refmd.models.cutoff                  <- models/cutoff.py
* refmd.models.mlp                     <- models/mlp.py (+_module_init.py)
* refmd.models.radial_basis.gaussian   <- models/radial_basis/gaussian.py
"""

import importlib.util
import os
import sys
import types

REF_ROOT = "/root/reference/src/flashmd"

_MODULES = [
    ("refmd.models._module_init", "models/_module_init.py"),
    ("refmd.models.cutoff", "models/cutoff.py"),
    ("refmd.models.mlp", "models/mlp.py"),
    ("refmd.models.radial_basis.base", "models/radial_basis/base.py"),
    ("refmd.models.radial_basis.gaussian", "models/radial_basis/gaussian.py"),
    ("refmd.geometry.internal_coordinates",
     "geometry/internal_coordinates.py"),
]

_PRIOR_MODULES = [
    ("refmd.prior.base", "prior/base.py"),
    ("refmd.prior.harmonic", "prior/harmonic.py"),
    ("refmd.prior.repulsion", "prior/repulsion.py"),
    ("refmd.prior.fourier_series", "prior/fourier_series.py"),
    ("refmd.prior.polynomial", "prior/polynomial.py"),
    ("refmd.prior.restricted_bending", "prior/restricted_bending.py"),
]

_cache = {}
_prior_cache = {}


def reference_available() -> bool:
    return os.path.isdir(REF_ROOT)


def load_reference_modules():
    """Return {short_name: module} for the torch-only reference oracles."""
    if _cache:
        return _cache
    for pkg in (
        "refmd",
        "refmd.models",
        "refmd.models.radial_basis",
        "refmd.geometry",
    ):
        if pkg not in sys.modules:
            m = types.ModuleType(pkg)
            m.__path__ = []  # mark as package for relative-import machinery
            sys.modules[pkg] = m
    for name, rel in _MODULES:
        path = os.path.join(REF_ROOT, rel)
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        _cache[name.removeprefix("refmd.")] = mod
    return _cache


def _scatter_stub(src, index, dim=0, reduce="sum", dim_size=None):
    """Minimal torch_geometric.utils.scatter: segment-sum via index_add."""
    import torch

    assert dim == 0 and reduce == "sum"
    n = int(index.max()) + 1 if dim_size is None else int(dim_size)
    out = torch.zeros((n,) + src.shape[1:], dtype=src.dtype)
    out.index_add_(0, index, src)
    return out


def load_reference_prior_modules():
    """Load the reference prior families with torch_geometric stubbed.

    The prior modules (prior/harmonic.py etc.) are pure torch math except
    for two imports: ``torch_geometric.utils.scatter`` (stubbed with an
    index_add segment-sum — the priors only call it with dim=0/sum) and the
    ``AtomicData`` class (used as a duck-typed bag of pos / atom_types /
    neighbor_list / out in forward; stubbed with a plain class).
    """
    if _prior_cache:
        return _prior_cache
    load_reference_modules()

    if "torch_geometric" not in sys.modules:
        tg = types.ModuleType("torch_geometric")
        tg_utils = types.ModuleType("torch_geometric.utils")
        tg_utils.scatter = _scatter_stub
        tg.utils = tg_utils
        sys.modules["torch_geometric"] = tg
        sys.modules["torch_geometric.utils"] = tg_utils

    if "refmd.data" not in sys.modules:
        data_pkg = types.ModuleType("refmd.data")
        data_pkg.__path__ = []

        class AtomicData:  # duck-typed stand-in; priors only read attrs
            pass

        data_pkg.AtomicData = AtomicData
        atomic_data = types.ModuleType("refmd.data.atomic_data")
        atomic_data.AtomicData = AtomicData
        sys.modules["refmd.data"] = data_pkg
        sys.modules["refmd.data.atomic_data"] = atomic_data

    if "refmd.prior" not in sys.modules:
        prior_pkg = types.ModuleType("refmd.prior")
        prior_pkg.__path__ = []
        sys.modules["refmd.prior"] = prior_pkg

    for name, rel in _PRIOR_MODULES:
        path = os.path.join(REF_ROOT, rel)
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        _prior_cache[name.removeprefix("refmd.")] = mod
    return _prior_cache
