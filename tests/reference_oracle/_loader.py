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
_schnet_cache = {}


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


class RefAtomicData:
    """Duck-typed stand-in for the reference AtomicData (a PyG ``Data``).

    The reference model stack only *reads attributes* off the data object
    (pos / atom_types / batch / ptr / neighbor_list / out) plus the two
    dunder protocols PyG Data provides that plain objects lack:
    ``"batch" in data`` (neighbor_list/neighbor_list.py:44) and
    ``data.get("exc_pair_index")`` (schnet.py:241)."""

    def __contains__(self, key):
        return getattr(self, key, None) is not None

    def get(self, key, default=None):
        return getattr(self, key, default)


class _NvtxAnnotate:
    """nvtx.annotate shim: works as decorator and as context manager."""

    def __init__(self, *args, **kwargs):
        pass

    def __call__(self, fn):
        return fn

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


def _torch_neighbor_list_stub(
    data, rcut, self_interaction=False, num_workers=1, max_num_neighbors=1000
):
    """Pure-torch replacement for the reference's torch_cluster-backed
    ``torch_neighbor_list`` (neighbor_list/torch_impl.py:26-60) — the ONE
    native external the reference model stack depends on. Brute-force
    O(A^2) radius search, no PBC, both edge directions, strict ``< rcut``.
    Returns the reference 4-tuple (idx_i, idx_j, cell_shifts, self_mask)."""
    import torch

    pos = data.pos
    n = pos.shape[0]
    batch = getattr(data, "batch", None)
    if batch is None:
        batch = torch.zeros(n, dtype=torch.long)
    d = torch.cdist(pos.detach().double(), pos.detach().double())
    mask = (d < rcut) & (batch.unsqueeze(0) == batch.unsqueeze(1))
    if not self_interaction:
        mask &= ~torch.eye(n, dtype=torch.bool)
    idx_i, idx_j = torch.nonzero(mask, as_tuple=True)
    cell_shifts = torch.zeros((idx_i.shape[0], 3), dtype=pos.dtype)
    return idx_i, idx_j, cell_shifts, idx_i == idx_j


def _ensure_torch_geometric():
    """Register the minimal torch_geometric surface the reference model
    stack imports: ``nn.MessagePassing`` (add-aggregation ``propagate``,
    the eager CFConv path at schnet.py:706-715) and ``utils.scatter``."""
    import torch

    if "torch_geometric" not in sys.modules:
        tg = types.ModuleType("torch_geometric")
        tg_utils = types.ModuleType("torch_geometric.utils")
        tg_utils.scatter = _scatter_stub
        tg.utils = tg_utils
        sys.modules["torch_geometric"] = tg
        sys.modules["torch_geometric.utils"] = tg_utils
    if "torch_geometric.nn" not in sys.modules:

        class MessagePassing(torch.nn.Module):
            """PyG MessagePassing shim, flow="source_to_target" (the PyG
            default): edge_index rows are (source j, target i); propagate
            gathers x_j = x[edge_index[0]], applies self.message, and
            index_adds into edge_index[1]."""

            def __init__(self, aggr="add", **kwargs):
                super().__init__()
                if aggr != "add":
                    raise NotImplementedError(
                        f"MessagePassing shim supports aggr='add' only "
                        f"(got {aggr!r})"
                    )
                self.aggr = aggr

            def propagate(self, edge_index, x=None, size=None, **kwargs):
                src, dst = edge_index[0], edge_index[1]
                msg = self.message(x_j=x[src], **kwargs)
                n = x.shape[0] if size is None else size[1]
                out = torch.zeros(
                    (n,) + msg.shape[1:], dtype=msg.dtype, device=msg.device
                )
                out.index_add_(0, dst, msg)
                return out

            def message(self, x_j, **kwargs):  # overridden by CFConv
                return x_j

        tg_nn = types.ModuleType("torch_geometric.nn")
        tg_nn.MessagePassing = MessagePassing
        sys.modules["torch_geometric.nn"] = tg_nn
        sys.modules["torch_geometric"].nn = tg_nn


def load_reference_schnet():
    """Load the reference's COMPOSED model stack — models/schnet.py
    (SchNet / InteractionBlock / CFConv / StandardSchNet, the eager paths)
    and models/gradients.py (GradientsOut / SumOut / EnergyOut) — executed
    from /root/reference/src with shims ONLY for its external deps:

    * nvtx                      -> no-op annotate
    * torch_geometric           -> MessagePassing(add) + scatter shims
    * torch_cluster             -> brute-force torch radius search
      (neighbor_list/torch_impl.py is the wrapper around it; the real
      neighbor_list/neighbor_list.py executes on top of the stub)
    * flashmd.kernels (Triton)  -> absent => TRITON_AVAILABLE=False, so
      every forward takes the reference's own eager torch path

    Returns {short_name: module} including "models.schnet" and
    "models.gradients"."""
    if _schnet_cache:
        return _schnet_cache
    load_reference_modules()
    _ensure_torch_geometric()

    if "nvtx" not in sys.modules:
        nvtx = types.ModuleType("nvtx")
        nvtx.annotate = _NvtxAnnotate
        sys.modules["nvtx"] = nvtx

    # refmd.data package: real _keys.py + duck-typed AtomicData
    if "refmd.data" not in sys.modules:
        data_pkg = types.ModuleType("refmd.data")
        data_pkg.__path__ = []
        sys.modules["refmd.data"] = data_pkg
    keys_name = "refmd.data._keys"
    if keys_name not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            keys_name, os.path.join(REF_ROOT, "data/_keys.py")
        )
        keys_mod = importlib.util.module_from_spec(spec)
        sys.modules[keys_name] = keys_mod
        spec.loader.exec_module(keys_mod)
    keys_mod = sys.modules[keys_name]
    ad_name = "refmd.data.atomic_data"
    if ad_name not in sys.modules:
        atomic_data = types.ModuleType(ad_name)
        atomic_data.AtomicData = RefAtomicData
        atomic_data.ENERGY_KEY = keys_mod.ENERGY_KEY
        sys.modules[ad_name] = atomic_data
        sys.modules["refmd.data"].AtomicData = RefAtomicData
    else:
        # the prior loader may have registered a bare AtomicData stub;
        # upgrade it so both stacks share one class
        sys.modules[ad_name].AtomicData = RefAtomicData
        sys.modules[ad_name].ENERGY_KEY = keys_mod.ENERGY_KEY
        sys.modules["refmd.data"].AtomicData = RefAtomicData

    # refmd.neighbor_list: stub torch_impl, real neighbor_list.py
    if "refmd.neighbor_list" not in sys.modules:
        nl_pkg = types.ModuleType("refmd.neighbor_list")
        nl_pkg.__path__ = []
        sys.modules["refmd.neighbor_list"] = nl_pkg
    ti_name = "refmd.neighbor_list.torch_impl"
    if ti_name not in sys.modules:
        ti = types.ModuleType(ti_name)
        ti.torch_neighbor_list = _torch_neighbor_list_stub
        sys.modules[ti_name] = ti
    nl_name = "refmd.neighbor_list.neighbor_list"
    if nl_name not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            nl_name, os.path.join(REF_ROOT, "neighbor_list/neighbor_list.py")
        )
        nl_mod = importlib.util.module_from_spec(spec)
        sys.modules[nl_name] = nl_mod
        spec.loader.exec_module(nl_mod)

    for name, rel in (
        ("refmd.models.schnet", "models/schnet.py"),
        ("refmd.models.gradients", "models/gradients.py"),
    ):
        path = os.path.join(REF_ROOT, rel)
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        _schnet_cache[name.removeprefix("refmd.")] = mod
    _schnet_cache["data._keys"] = keys_mod
    _schnet_cache["neighbor_list.neighbor_list"] = sys.modules[nl_name]
    return _schnet_cache


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
