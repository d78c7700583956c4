"""Reference-checkpoint ingestion: stub unpickling + numerical fidelity.

Builds a synthetic ``model_and_prior.pt`` with the exact module layout of
the reference checkpoint contract (GradientsOut(SumOut({SchNet, priors})),
classes living under ``flashmd.*`` module paths), saves it with torch,
unregisters the fake modules so the loader must fall back to stub classes,
converts, and checks the converted JAX force field reproduces a torch
edge-list evaluation of the same weights to fp32 tolerance.
"""

import math
import sys
import types as pytypes

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

# The f64 fidelity assertions below (rtol=1e-9) need real float64 — without
# this the dtype=jnp.float64 request silently downcasts to f32 and the
# comparison degrades to ~1e-7 depending on which test file ran first.
jax.config.update("jax_enable_x64", True)

from flashmd_tpu.data.system import make_term_list  # noqa: E402
from flashmd_tpu.models.checkpoint_io import (
    build_forcefield,
    load_reference_checkpoint,
    load_reference_configurations,
    load_native_model,
    save_native_model,
)
from flashmd_tpu.models.forcefield import compute_energy_forces

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

    class GradientsOut(nn.Module):
        def __init__(self, model):
            super().__init__()
            self.model = model
            self.name = getattr(model, "name", "model")

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
    _register(Repulsion, "flashmd.prior.repulsion")
    _register(Dihedral, "flashmd.prior.fourier_series")
    _register(GradientsOut, "flashmd.models.gradients")
    _register(SumOut, "flashmd.models.gradients")
    _register(AtomicData, "flashmd.data.atomic_data")

    return dict(
        SchNet=SchNet,
        HarmonicBonds=HarmonicBonds,
        Repulsion=Repulsion,
        Dihedral=Dihedral,
        GradientsOut=GradientsOut,
        SumOut=SumOut,
        AtomicData=AtomicData,
    )


def unregister_fake_modules():
    for m in list(sys.modules):
        if m == "flashmd" or m.startswith("flashmd."):
            del sys.modules[m]


def torch_schnet_energy(schnet, pos_t, types_t):
    """Independent torch edge-list evaluation of the fake SchNet."""
    n = pos_t.shape[0]
    d_full = torch.cdist(pos_t, pos_t)
    src, dst = [], []
    for i in range(n):
        for j in range(n):
            if i != j and d_full[i, j] < RCUT:
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
    e = schnet.output_network(x)
    return float(e.sum())


@pytest.fixture(scope="module")
def saved_checkpoint(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ckpt")
    torch.manual_seed(0)
    classes = make_fake_reference_modules()

    rng = np.random.default_rng(4)
    types = rng.integers(0, N_TYPES, size=(A,))
    pos = rng.uniform(0, 3.0, size=(A, 3))

    schnet = classes["SchNet"]()
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

    model = classes["GradientsOut"](
        classes["SumOut"](
            {
                "SchNet": classes["GradientsOut"](schnet),
                "bonds": classes["GradientsOut"](
                    classes["HarmonicBonds"](x_0, k)
                ),
                "repulsion": classes["GradientsOut"](
                    classes["Repulsion"](sigma)
                ),
                "dihedrals": classes["GradientsOut"](
                    classes["Dihedral"](k1s, k2s, v_0)
                ),
            }
        )
    )
    model_path = tmp / "model_and_prior.pt"
    torch.save(model, model_path)

    # ------- reference-side ground truth energies (double precision:
    # fp32 disagreement between frameworks is pure rounding noise,
    # verified to 1e-15 in f64) -------
    pos_t = torch.tensor(pos, dtype=torch.float64)
    types_t = torch.tensor(types)
    with torch.no_grad():
        e_schnet = torch_schnet_energy(schnet.double(), pos_t, types_t)
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
    data0 = classes["AtomicData"](
        pos=torch.tensor(pos, dtype=torch.float32),
        atom_types=torch.tensor(types),
        masses=torch.ones(A),
        neighbor_list=nls,
        tag="synthetic",
    )
    structures_path = tmp / "configurations.pt"
    torch.save([data0, data0], structures_path)

    unregister_fake_modules()
    return dict(
        model_path=str(model_path),
        structures_path=str(structures_path),
        e_schnet=e_schnet,
        e_bonds=e_bonds,
        e_rep=e_rep,
        pos=pos,
        types=types,
        tmp=tmp,
    )


def test_loads_with_stubs(saved_checkpoint):
    ref = load_reference_checkpoint(saved_checkpoint["model_path"])
    assert ref.schnet_params is not None
    assert ref.schnet_config.hidden_channels == HIDDEN
    assert ref.schnet_config.num_rbf == N_RBF
    assert ref.schnet_config.num_interactions == 2
    assert ref.schnet_config.cutoff.cutoff_upper == RCUT
    kinds = sorted(p.kind for p in ref.priors)
    assert kinds == ["dihedral", "harmonic_bonds", "repulsion"]


def test_configurations_load(saved_checkpoint):
    configs = load_reference_configurations(
        saved_checkpoint["structures_path"]
    )
    assert len(configs) == 2
    assert configs[0].n_atoms == A
    assert set(configs[0].neighbor_lists) == {
        "bonds",
        "repulsion",
        "dihedrals",
    }
    np.testing.assert_allclose(configs[0].pos, saved_checkpoint["pos"])


def test_converted_energies_match_reference(saved_checkpoint):
    ref = load_reference_checkpoint(saved_checkpoint["model_path"])
    configs = load_reference_configurations(
        saved_checkpoint["structures_path"]
    )
    ff = build_forcefield(
        ref, configs[0], dtype=jnp.float64, neighbor_capacity=A
    )
    pos = jnp.asarray(saved_checkpoint["pos"], dtype=jnp.float64)[None]
    types = jnp.asarray(saved_checkpoint["types"], dtype=jnp.int32)
    potential, forces, comps = compute_energy_forces(ff, pos, types)

    np.testing.assert_allclose(
        float(comps["SchNet"][0]),
        saved_checkpoint["e_schnet"],
        rtol=1e-9,
    )
    np.testing.assert_allclose(
        float(comps["bonds"][0]), saved_checkpoint["e_bonds"], rtol=1e-9
    )
    np.testing.assert_allclose(
        float(comps["repulsion"][0]), saved_checkpoint["e_rep"], rtol=1e-9
    )
    assert np.all(np.isfinite(np.asarray(forces)))


def test_native_roundtrip(saved_checkpoint):
    ref = load_reference_checkpoint(saved_checkpoint["model_path"])
    path = str(saved_checkpoint["tmp"] / "native_model.pkl")
    save_native_model(ref, path)
    ref2 = load_native_model(path)
    np.testing.assert_array_equal(
        ref.schnet_params["embedding"], ref2.schnet_params["embedding"]
    )
    assert ref2.schnet_config == ref.schnet_config
