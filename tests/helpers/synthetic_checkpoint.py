"""Synthetic reference-checkpoint harness.

Builds a ``model_and_prior.pt`` + ``configurations.pt`` pair with the exact
module layout of the reference checkpoint contract
(GradientsOut(SumOut({SchNet, priors})), classes living under ``flashmd.*``
module paths, PyG-style AtomicData storage), saves them with torch, and
unregisters the fake modules so the loader must fall back to stub classes —
exactly what happens with a real reference checkpoint in a PyG-free
environment. Shared by ``tests/models/test_checkpoint_io.py`` (conversion
fidelity) and ``tests/simulation/test_cli_reference_pt.py`` (CLI end-to-end).

Reference layout being mimicked: src/flashmd/scripts/nvt_langevin.py:35-93
saves/loads ``model_and_prior.pt`` via plain ``torch.load``.
"""

import math
import sys
import types as pytypes

import numpy as np
import torch
import torch.nn as nn

A = 10
RCUT = 4.0
N_RBF = 9
HIDDEN = 12
N_TYPES = 4

FAKE_MODULES = [
    "flashmd",
    "flashmd.models",
    "flashmd.models.schnet",
    "flashmd.models.mlp",
    "flashmd.models.cutoff",
    "flashmd.models.gradients",
    "flashmd.models.radial_basis",
    "flashmd.models.radial_basis.gaussian",
    "flashmd.prior",
    "flashmd.prior.harmonic",
    "flashmd.prior.repulsion",
    "flashmd.prior.fourier_series",
    "flashmd.data",
    "flashmd.data.atomic_data",
]


def _register(cls, module):
    cls.__module__ = module
    cls.__qualname__ = cls.__name__  # classes are function-local; fix lookup
    sys.modules[module].__dict__[cls.__name__] = cls
    return cls


def make_fake_reference_modules():
    for m in FAKE_MODULES:
        sys.modules.setdefault(m, pytypes.ModuleType(m))

    class CosineCutoff(nn.Module):
        def __init__(self, lower, upper):
            super().__init__()
            self.cutoff_lower = lower
            self.cutoff_upper = upper

        def forward(self, d):
            return 0.5 * (
                torch.cos(d * math.pi / self.cutoff_upper) + 1.0
            ) * (d < self.cutoff_upper)

    class GaussianBasis(nn.Module):
        def __init__(self, cutoff, num_rbf):
            super().__init__()
            self.cutoff = cutoff
            self.num_rbf = num_rbf
            offset = torch.linspace(0.0, cutoff.cutoff_upper, num_rbf)
            self.register_buffer("offset", offset)
            self.register_buffer(
                "coeff", -0.5 / (offset[1] - offset[0]) ** 2
            )

        def forward(self, d):
            d = d.unsqueeze(-1)
            return torch.exp(
                self.coeff * (d - self.offset) ** 2
            ) * self.cutoff(d)

    class MLP(nn.Module):
        def __init__(self, widths, last_bias=True):
            super().__init__()
            layers = []
            for w_in, w_out in zip(widths[:-2], widths[1:-1]):
                layers.append(nn.Linear(w_in, w_out))
                layers.append(nn.Tanh())
            layers.append(nn.Linear(widths[-2], widths[-1], bias=last_bias))
            self.layers = nn.Sequential(*layers)

        def forward(self, x):
            return self.layers(x)

    class CFConv(nn.Module):
        def __init__(self, filter_network, cutoff):
            super().__init__()
            self.lin1 = nn.Linear(HIDDEN, HIDDEN, bias=False)
            self.lin2 = nn.Linear(HIDDEN, HIDDEN)
            self.filter_network = filter_network
            self.cutoff = cutoff

    class InteractionBlock(nn.Module):
        def __init__(self, conv):
            super().__init__()
            self.conv = conv
            self.lin = nn.Linear(HIDDEN, HIDDEN)

    class SchNet(nn.Module):
        name = "SchNet"

        def __init__(self):
            super().__init__()
            cutoff = CosineCutoff(0.0, RCUT)
            self.embedding_layer = nn.Embedding(N_TYPES, HIDDEN)
            self.rbf_layer = GaussianBasis(cutoff, N_RBF)
            blocks = []
            for _ in range(2):
                filt = MLP([N_RBF, HIDDEN, HIDDEN], last_bias=False)
                blocks.append(InteractionBlock(CFConv(filt, cutoff)))
            self.interaction_blocks = nn.Sequential(*blocks)
            self.output_network = MLP([HIDDEN, 8, 1], last_bias=False)
            self.max_num_neighbors = 1000

    class HarmonicBonds(nn.Module):
        name = "bonds"

        def __init__(self, x_0, k):
            super().__init__()
            self.order = 2
            self.register_buffer("x_0", x_0)
            self.register_buffer("k", k)

    class GeneralBonds(nn.Module):
        """Reference GeneralBonds (harmonic.py:393-414): a Harmonic with
        distance features and a caller-chosen ``name`` (so several bond
        priors can coexist under distinct SumOut keys)."""

        def __init__(self, x_0, k, name):
            super().__init__()
            self.order = 2
            self.name = name
            self.register_buffer("x_0", x_0)
            self.register_buffer("k", k)

    class GeneralAngles(nn.Module):
        """Reference GeneralAngles (harmonic.py:417-451): Harmonic on
        cos-angle features, caller-chosen name, order 3."""

        def __init__(self, x_0, k, name):
            super().__init__()
            self.order = 3
            self.name = name
            self.register_buffer("x_0", x_0)
            self.register_buffer("k", k)

    class Repulsion(nn.Module):
        name = "repulsion"

        def __init__(self, sigma):
            super().__init__()
            self.order = 2
            self.register_buffer("sigma", sigma)

    class Dihedral(nn.Module):
        name = "dihedrals"

        def __init__(self, k1s, k2s, v_0):
            super().__init__()
            self.order = 4
            self.n_degs = k1s.shape[0]
            self.register_buffer("k1s", k1s)
            self.register_buffer("k2s", k2s)
            self.register_buffer("v_0", v_0)

    class TypesMLP(nn.Module):
        """Reference TypesMLP layout (flashmd/models/mlp.py:60-121):
        ``mlp`` is a ModuleList (one MLP per entry of the ``species``
        buffer) or a single shared MLP."""

        name = "TypesMLP"

        def __init__(self, widths, species=None, last_bias=True):
            super().__init__()
            if species is not None:
                species = torch.unique(torch.as_tensor(species))
                self.register_buffer("species", species)
                self.mlp = nn.ModuleList(
                    [MLP(widths, last_bias=last_bias) for _ in species]
                )
            else:
                self.species = None
                self.mlp = MLP(widths, last_bias=last_bias)

        def forward(self, x, types):
            if self.species is None:
                return self.mlp(x)
            y = torch.zeros(x.shape[0], 1, dtype=x.dtype)
            for s, mlp in zip(self.species, self.mlp):
                mask = types == s
                y[mask] = mlp(x[mask])
            return y

    class GradientsOut(nn.Module):
        def __init__(self, model):
            super().__init__()
            self.model = model
            self.name = getattr(model, "name", "model")

    class EnergyOut(nn.Module):
        """Reference EnergyOut (gradients.py:161-191): same .model slot."""

        def __init__(self, model):
            super().__init__()
            self.model = model
            self.targets = ["energy"]
            self.name = getattr(model, "name", "model")

    class MysteryPrior(nn.Module):
        """A prior class the converter does not know — must hard-error."""

        name = "mystery"

        def __init__(self):
            super().__init__()
            self.order = 2
            self.register_buffer("weird", torch.rand(2, 2))

    class SumOut(nn.Module):
        name = "SumOut"

        def __init__(self, models):
            super().__init__()
            self.models = nn.ModuleDict(models)

    class AtomicData:
        """Pickles like a PyG Data: fields inside a nested storage dict."""

        def __init__(self, **fields):
            self._store = pytypes.SimpleNamespace(_mapping=fields)

    _register(CosineCutoff, "flashmd.models.cutoff")
    _register(GaussianBasis, "flashmd.models.radial_basis.gaussian")
    _register(MLP, "flashmd.models.mlp")
    _register(CFConv, "flashmd.models.schnet")
    _register(InteractionBlock, "flashmd.models.schnet")
    _register(SchNet, "flashmd.models.schnet")
    _register(HarmonicBonds, "flashmd.prior.harmonic")
    _register(GeneralBonds, "flashmd.prior.harmonic")
    _register(GeneralAngles, "flashmd.prior.harmonic")
    _register(Repulsion, "flashmd.prior.repulsion")
    _register(Dihedral, "flashmd.prior.fourier_series")
    _register(TypesMLP, "flashmd.models.mlp")
    _register(GradientsOut, "flashmd.models.gradients")
    _register(EnergyOut, "flashmd.models.gradients")
    _register(MysteryPrior, "flashmd.prior.harmonic")
    _register(SumOut, "flashmd.models.gradients")
    _register(AtomicData, "flashmd.data.atomic_data")

    return dict(
        SchNet=SchNet,
        MLP=MLP,
        GeneralBonds=GeneralBonds,
        GeneralAngles=GeneralAngles,
        TypesMLP=TypesMLP,
        HarmonicBonds=HarmonicBonds,
        Repulsion=Repulsion,
        Dihedral=Dihedral,
        GradientsOut=GradientsOut,
        EnergyOut=EnergyOut,
        MysteryPrior=MysteryPrior,
        SumOut=SumOut,
        AtomicData=AtomicData,
    )


def unregister_fake_modules():
    for m in list(sys.modules):
        if m == "flashmd" or m.startswith("flashmd."):
            del sys.modules[m]


def torch_schnet_energy(schnet, pos_t, types_t, exc_pairs=None):
    """Independent torch edge-list evaluation of the fake SchNet.

    ``exc_pairs`` ([2, P]) drops the given undirected pairs from the
    radius graph (the reference exc_pair_index contract,
    schnet.py:221-242)."""
    n = pos_t.shape[0]
    excluded = set()
    if exc_pairs is not None:
        for a, b in zip(exc_pairs[0], exc_pairs[1]):
            excluded.add((int(a), int(b)))
            excluded.add((int(b), int(a)))
    d_full = torch.cdist(pos_t, pos_t)
    src, dst = [], []
    for i in range(n):
        for j in range(n):
            if i != j and d_full[i, j] < RCUT and (i, j) not in excluded:
                src.append(j)
                dst.append(i)
    src = torch.tensor(src)
    dst = torch.tensor(dst)
    d = (pos_t[src] - pos_t[dst]).norm(dim=-1)

    x = schnet.embedding_layer(types_t)
    rbf = schnet.rbf_layer(d)
    cut = schnet.rbf_layer.cutoff(d)
    for block in schnet.interaction_blocks:
        h = block.conv.lin1(x)
        w = block.conv.filter_network(rbf) * cut[:, None]
        msg = w * h[src]
        agg = torch.zeros_like(h)
        agg.index_add_(0, dst, msg)
        y = block.conv.lin2(agg)
        x = x + block.lin(torch.tanh(y))
    out_net = schnet.output_network
    if type(out_net).__name__ == "TypesMLP":
        e = out_net(x, types_t)
    else:
        e = out_net(x)
    return float(e.sum())


def build_synthetic_checkpoint(
    tmp,
    entry_wrapper: str = "gradients",
    output_network: str = "mlp",
    exc_pairs=None,
    extra_entries=None,
    sparse_priors: bool = False,
    general_priors: bool = False,
):
    """Write model_and_prior.pt + configurations.pt under ``tmp``.

    Returns a dict with file paths, the raw pos/types arrays, and
    double-precision ground-truth energies for the SchNet / bonds /
    repulsion components (computed by independent torch/numpy code, not by
    anything in flashmd_tpu).

    Variants exercising the full reference checkpoint surface:

    * ``entry_wrapper``: "gradients" (GradientsOut, the usual contract) or
      "energy" (EnergyOut-wrapped entries, gradients.py:161-191).
    * ``output_network``: "mlp" | "types_mlp_shared" | "types_mlp_species"
      (reference TypesMLP, mlp.py:60-121).
    * ``exc_pairs``: optional [2, P] pairs stored as the structure's
      ``exc_pair_index`` AND honored by the ground-truth energies.
    * ``extra_entries``: dict of {name: fake-class-name} appended to the
      SumOut (e.g. {"mystery": "MysteryPrior"} for an unconvertible
      entry).
    * ``sparse_priors``: save the Harmonic/Dihedral parameter buffers as
      torch SPARSE tensors, mimicking a checkpoint written after the
      reference's ``sparsify_prior_module`` (models/utils.py:6-22) —
      the converter must densify them on ingestion.
    * ``general_priors``: add GeneralBonds/GeneralAngles entries
      (reference harmonic.py:393-451) under custom names ("cbonds" /
      "cangles") with their own neighbor lists and f64 ground truths.
    """
    torch.manual_seed(0)
    classes = make_fake_reference_modules()

    rng = np.random.default_rng(4)
    types = rng.integers(0, N_TYPES, size=(A,))
    pos = rng.uniform(0, 3.0, size=(A, 3))

    schnet = classes["SchNet"]()
    if output_network == "types_mlp_shared":
        schnet.output_network = classes["TypesMLP"](
            [HIDDEN, 8, 1], last_bias=False
        )
    elif output_network == "types_mlp_species":
        schnet.output_network = classes["TypesMLP"](
            [HIDDEN, 8, 1], species=torch.tensor(types), last_bias=False
        )
    bonds_map = np.stack([np.arange(A - 1), np.arange(1, A)])
    x_0 = torch.rand(N_TYPES, N_TYPES) + 0.5
    k = torch.rand(N_TYPES, N_TYPES) * 3
    rep_map = np.stack([np.arange(A - 2), np.arange(2, A)])
    sigma = torch.rand(N_TYPES, N_TYPES) * 0.5 + 0.3
    dih_map = np.stack(
        [np.arange(A - 3), np.arange(1, A - 2), np.arange(2, A - 1),
         np.arange(3, A)]
    )
    n_degs = 2
    k1s = torch.rand(n_degs, N_TYPES, N_TYPES, N_TYPES, N_TYPES)
    k2s = torch.rand(n_degs, N_TYPES, N_TYPES, N_TYPES, N_TYPES)
    v_0 = torch.rand(N_TYPES, N_TYPES, N_TYPES, N_TYPES)

    wrap = (
        classes["EnergyOut"]
        if entry_wrapper == "energy"
        else classes["GradientsOut"]
    )
    # GeneralBonds/GeneralAngles under custom names (order 2 resp. 3).
    gb_map = np.stack([np.arange(A - 3), np.arange(3, A)])
    gb_x0 = torch.rand(N_TYPES, N_TYPES) + 1.0
    gb_k = torch.rand(N_TYPES, N_TYPES) * 2
    ga_map = np.stack(
        [np.arange(A - 2), np.arange(1, A - 1), np.arange(2, A)]
    )
    ga_x0 = torch.rand(N_TYPES, N_TYPES, N_TYPES) - 0.5
    ga_k = torch.rand(N_TYPES, N_TYPES, N_TYPES) * 2

    entries = {
        "SchNet": wrap(schnet),
        "bonds": wrap(classes["HarmonicBonds"](x_0, k)),
        "repulsion": wrap(classes["Repulsion"](sigma)),
        "dihedrals": wrap(classes["Dihedral"](k1s, k2s, v_0)),
    }
    if general_priors:
        entries["cbonds"] = wrap(
            classes["GeneralBonds"](gb_x0, gb_k, "cbonds")
        )
        entries["cangles"] = wrap(
            classes["GeneralAngles"](ga_x0, ga_k, "cangles")
        )
    for name, cls_name in (extra_entries or {}).items():
        entries[name] = wrap(classes[cls_name]())
    if sparse_priors:
        # Mimic the reference's sparsify_prior_module
        # (models/utils.py:6-22): buffers become torch sparse COO
        # tensors IN the pickled module tree.
        bonds_mod = entries["bonds"].model
        bonds_mod.x_0 = bonds_mod.x_0.to_sparse()
        bonds_mod.k = bonds_mod.k.to_sparse()
        dih_mod = entries["dihedrals"].model
        dih_mod.v_0 = dih_mod.v_0.to_sparse()
        dih_mod.k1s = dih_mod.k1s.to_sparse()
        dih_mod.k2s = dih_mod.k2s.to_sparse()
    model = classes["GradientsOut"](classes["SumOut"](entries))
    model_path = tmp / "model_and_prior.pt"
    torch.save(model, model_path)

    # ------- reference-side ground truth energies (double precision:
    # fp32 disagreement between frameworks is pure rounding noise,
    # verified to 1e-15 in f64) -------
    pos_t = torch.tensor(pos, dtype=torch.float64)
    types_t = torch.tensor(types)
    with torch.no_grad():
        e_schnet = torch_schnet_energy(
            schnet.double(), pos_t, types_t, exc_pairs=exc_pairs
        )
    # harmonic bonds
    ti, tj = types[bonds_map[0]], types[bonds_map[1]]
    dbond = np.linalg.norm(pos[bonds_map[1]] - pos[bonds_map[0]], axis=-1)
    e_bonds = float(
        np.sum(
            k.numpy()[ti, tj] * (dbond - x_0.numpy()[ti, tj]) ** 2
        )
    )
    ti, tj = types[rep_map[0]], types[rep_map[1]]
    drep = np.linalg.norm(pos[rep_map[1]] - pos[rep_map[0]], axis=-1)
    e_rep = float(np.sum((sigma.numpy()[ti, tj] / drep) ** 6))

    # GeneralBonds: k (d - x0)^2 over the custom pair map; GeneralAngles:
    # k (cos theta - x0)^2, central atom = mapping row 1 (reference
    # compute_angles_cos, internal_coordinates.py:139-170).
    ti, tj = types[gb_map[0]], types[gb_map[1]]
    dgb = np.linalg.norm(pos[gb_map[1]] - pos[gb_map[0]], axis=-1)
    e_gbonds = float(
        np.sum(gb_k.numpy()[ti, tj] * (dgb - gb_x0.numpy()[ti, tj]) ** 2)
    )
    ti, tj, tk = types[ga_map[0]], types[ga_map[1]], types[ga_map[2]]
    dr1 = pos[ga_map[0]] - pos[ga_map[1]]
    dr2 = pos[ga_map[2]] - pos[ga_map[1]]
    cosang = np.sum(dr1 * dr2, axis=-1) / (
        np.linalg.norm(dr1, axis=-1) * np.linalg.norm(dr2, axis=-1)
    )
    e_gangles = float(
        np.sum(
            ga_k.numpy()[ti, tj, tk]
            * (cosang - ga_x0.numpy()[ti, tj, tk]) ** 2
        )
    )

    # structure file
    nls = {
        "bonds": dict(
            tag="bonds",
            order=2,
            index_mapping=torch.tensor(bonds_map),
            mapping_batch=torch.zeros(bonds_map.shape[1], dtype=torch.long),
            cell_shifts=None,
            rcut=None,
            self_interaction=False,
        ),
        "repulsion": dict(
            tag="repulsion",
            order=2,
            index_mapping=torch.tensor(rep_map),
            mapping_batch=torch.zeros(rep_map.shape[1], dtype=torch.long),
            cell_shifts=None,
            rcut=None,
            self_interaction=False,
        ),
        "dihedrals": dict(
            tag="dihedrals",
            order=4,
            index_mapping=torch.tensor(dih_map),
            mapping_batch=torch.zeros(dih_map.shape[1], dtype=torch.long),
            cell_shifts=None,
            rcut=None,
            self_interaction=False,
        ),
    }
    if general_priors:
        nls["cbonds"] = dict(
            tag="cbonds",
            order=2,
            index_mapping=torch.tensor(gb_map),
            mapping_batch=torch.zeros(gb_map.shape[1], dtype=torch.long),
            cell_shifts=None,
            rcut=None,
            self_interaction=False,
        )
        nls["cangles"] = dict(
            tag="cangles",
            order=3,
            index_mapping=torch.tensor(ga_map),
            mapping_batch=torch.zeros(ga_map.shape[1], dtype=torch.long),
            cell_shifts=None,
            rcut=None,
            self_interaction=False,
        )
    data_fields = dict(
        pos=torch.tensor(pos, dtype=torch.float32),
        atom_types=torch.tensor(types),
        masses=torch.ones(A),
        neighbor_list=nls,
        tag="synthetic",
    )
    if exc_pairs is not None:
        data_fields["exc_pair_index"] = torch.tensor(
            np.asarray(exc_pairs), dtype=torch.long
        )
    data0 = classes["AtomicData"](**data_fields)
    structures_path = tmp / "configurations.pt"
    torch.save([data0, data0], structures_path)

    unregister_fake_modules()
    return dict(
        model_path=str(model_path),
        structures_path=str(structures_path),
        e_schnet=e_schnet,
        e_bonds=e_bonds,
        e_rep=e_rep,
        e_gbonds=e_gbonds,
        e_gangles=e_gangles,
        pos=pos,
        types=types,
        tmp=tmp,
    )
