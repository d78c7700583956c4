"""CLI/config parsing (reference: src/flashmd/simulation/cli.py:22-245)."""

import numpy as np
import pytest
import yaml

from flashmd_tpu.models.checkpoint_io import (
    save_native_configurations,
    save_native_model,
)
from flashmd_tpu.models.zoo import cgschnet_1enh_like
from flashmd_tpu.simulation.cli import (
    apply_batch_size,
    parse_simulation_config,
)
from flashmd_tpu.simulation.langevin import LangevinSimulation


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    ff, configs = cgschnet_1enh_like(
        n_atoms=16, batch_size=3, num_interactions=2, precision="fp32",
        neighbor_capacity=8,
    )
    save_native_model(ff, str(tmp / "model.pkl"))
    save_native_configurations(configs, str(tmp / "structures.pkl"))
    cfg = {
        "simulation": {
            "friction": 1.0,
            "n_timesteps": 40,
            "dt": 0.002,
            "save_interval": 10,
            "random_seed": 7,
            "dtype": "single",
            "filename": "cli_demo",
            "output_dir": str(tmp / "out"),
            # torch-only keys must be tolerated (reference configs set them)
            "device": "cuda",
            "compile_mode": "default",
        },
        "betas": [1.67],
        "model_file": str(tmp / "model.pkl"),
        "structure_file": str(tmp / "structures.pkl"),
    }
    cfg_path = tmp / "config.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    return tmp, cfg_path


def test_parse_full_config(files):
    tmp, cfg_path = files
    model, data, betas, sim, profile = parse_simulation_config(
        LangevinSimulation, args=["--config", str(cfg_path)]
    )
    assert isinstance(sim, LangevinSimulation)
    assert sim.n_timesteps == 40
    assert sim.friction == 1.0
    assert betas == 1.67  # single beta unwrapped like the reference
    assert len(data) == 3
    # config echo written next to outputs (reference cli.py:100-112)
    assert (tmp / "out" / "cli_demo_config.yaml").exists()


def test_cli_overrides(files):
    tmp, cfg_path = files
    _, _, _, sim, _ = parse_simulation_config(
        LangevinSimulation,
        args=[
            "--config", str(cfg_path),
            "--simulation.n_timesteps", "80",
            "--simulation.filename", "cli_demo2",
            "--simulation.save_energies", "true",
        ],
    )
    assert sim.n_timesteps == 80
    assert sim.save_energies is True


def test_batch_size_trim_and_duplicate(files):
    tmp, cfg_path = files
    _, data, _, _, _ = parse_simulation_config(
        LangevinSimulation,
        args=["--config", str(cfg_path), "--batch_size", "2",
              "--simulation.filename", "cli_demo3"],
    )
    assert len(data) == 2
    _, data, _, _, _ = parse_simulation_config(
        LangevinSimulation,
        args=["--config", str(cfg_path), "--batch_size", "7",
              "--simulation.filename", "cli_demo4"],
    )
    assert len(data) == 7
    np.testing.assert_array_equal(data[0].pos, data[3].pos)


def test_disable_optim_forces_xla_fp32(files):
    tmp, cfg_path = files
    model, _, _, sim, _ = parse_simulation_config(
        LangevinSimulation,
        args=["--config", str(cfg_path), "--disable_optim",
              "--simulation.filename", "cli_demo5"],
    )
    assert model.schnet_config.message_passing == "xla"
    assert model.schnet_config.precision == "fp32"
    assert sim.gptq is None


def test_mlcg_env_flag_disables_optim(files, monkeypatch):
    tmp, cfg_path = files
    monkeypatch.setenv("MLCG_USE_CSR", "0")
    model, _, _, _, _ = parse_simulation_config(
        LangevinSimulation,
        args=["--config", str(cfg_path),
              "--simulation.filename", "cli_demo6"],
    )
    assert model.schnet_config.message_passing == "xla"


def test_mp_env_override(files, monkeypatch):
    tmp, cfg_path = files
    monkeypatch.setenv("FLASHMD_TPU_MESSAGE_PASSING", "cheb")
    model, _, _, _, _ = parse_simulation_config(
        LangevinSimulation,
        args=["--config", str(cfg_path),
              "--simulation.filename", "cli_demo7"],
    )
    assert model.schnet_config.message_passing == "cheb"


def test_mesh_auto_and_count(files):
    """`--simulation.mesh auto` shards over every visible device;
    `--simulation.mesh N` over the first N (multi-chip from the CLI)."""
    tmp, cfg_path = files
    _, _, _, sim, _ = parse_simulation_config(
        LangevinSimulation,
        args=["--config", str(cfg_path), "--simulation.mesh", "auto",
              "--simulation.filename", "cli_demo_mesh"],
    )
    assert sim.mesh is not None and sim.mesh.devices.size == 8
    _, _, _, sim2, _ = parse_simulation_config(
        LangevinSimulation,
        args=["--config", str(cfg_path), "--simulation.mesh", "2",
              "--simulation.filename", "cli_demo_mesh2"],
    )
    assert sim2.mesh.devices.size == 2


def test_apply_batch_size_validation():
    with pytest.raises(ValueError):
        apply_batch_size([1, 2, 3], -1)
    assert apply_batch_size([1, 2, 3], None) == [1, 2, 3]

def test_compilation_cache_env_control(monkeypatch, tmp_path):
    """Console scripts enable the persistent XLA compilation cache;
    FLASHMD_TPU_COMPILATION_CACHE overrides the directory / disables."""
    import jax

    from flashmd_tpu.simulation.scripts import _enable_compilation_cache

    prev = jax.config.jax_compilation_cache_dir
    try:
        cache_dir = tmp_path / "xla_cache"
        monkeypatch.setenv(
            "FLASHMD_TPU_COMPILATION_CACHE", str(cache_dir)
        )
        _enable_compilation_cache()
        assert jax.config.jax_compilation_cache_dir == str(cache_dir)
        assert cache_dir.is_dir()

        jax.config.update("jax_compilation_cache_dir", prev)
        monkeypatch.setenv("FLASHMD_TPU_COMPILATION_CACHE", "off")
        _enable_compilation_cache()
        assert jax.config.jax_compilation_cache_dir == prev

        # ADVICE r2: a cache configured through JAX's own knobs must not
        # be clobbered by our default.
        monkeypatch.delenv("FLASHMD_TPU_COMPILATION_CACHE")
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "/tmp/user_cache")
        _enable_compilation_cache()
        assert jax.config.jax_compilation_cache_dir == prev  # untouched

        monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR")
        user_dir = str(tmp_path / "user_jax_cache")
        jax.config.update("jax_compilation_cache_dir", user_dir)
        _enable_compilation_cache()
        assert jax.config.jax_compilation_cache_dir == user_dir
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_cheb_dmin_env_override(files, monkeypatch):
    tmp, cfg_path = files
    monkeypatch.setenv("FLASHMD_TPU_CHEB_DMIN", "1.25")
    model, _, _, _, _ = parse_simulation_config(
        LangevinSimulation,
        args=["--config", str(cfg_path),
              "--simulation.filename", "cli_demo_dmin"],
    )
    assert model.schnet_config.cheb_d_min == 1.25


def test_cheb_dmin_auto_derives_floor(files, monkeypatch):
    """FLASHMD_TPU_CHEB_DMIN=auto -> 0.7 x the structures' min pair
    distance (the measured dynamic-dip factor; see _auto_cheb_d_min)."""
    tmp, cfg_path = files
    monkeypatch.setenv("FLASHMD_TPU_CHEB_DMIN", "auto")
    model, data, _, _, _ = parse_simulation_config(
        LangevinSimulation,
        args=["--config", str(cfg_path),
              "--simulation.filename", "cli_demo_dmin_auto"],
    )
    d2 = min(
        float(
            np.min(
                np.sum(
                    (np.asarray(c.pos)[:, None] - np.asarray(c.pos)[None]) ** 2,
                    axis=-1,
                )
                + np.where(np.eye(len(c.pos), dtype=bool), np.inf, 0.0)
            )
        )
        for c in data
    )
    expected = round(0.7 * float(np.sqrt(d2)), 2)
    assert model.schnet_config.cheb_d_min == expected
    assert 0.0 < model.schnet_config.cheb_d_min


def test_cheb_dmin_auto_refuses_periodic(files, tmp_path, monkeypatch):
    """auto derivation uses raw euclidean distances — periodic structures
    must be refused, not silently over-floored."""
    import dataclasses as dc

    import yaml as _yaml

    tmp, cfg_path = files
    _, configs = cgschnet_1enh_like(
        n_atoms=16, batch_size=1, num_interactions=2, precision="fp32",
        neighbor_capacity=8,
    )
    periodic = [
        dc.replace(c, cell=np.eye(3, dtype=np.float64) * 50.0)
        for c in configs
    ]
    save_native_configurations(periodic, str(tmp_path / "periodic.pkl"))
    cfg = _yaml.safe_load(open(cfg_path))
    cfg["structure_file"] = str(tmp_path / "periodic.pkl")
    cfg["simulation"]["filename"] = "cli_demo_dmin_pbc"
    pbc_cfg = tmp_path / "config_pbc.yaml"
    _yaml.safe_dump(cfg, open(pbc_cfg, "w"))
    monkeypatch.setenv("FLASHMD_TPU_CHEB_DMIN", "auto")
    with pytest.raises(ValueError, match="periodic"):
        parse_simulation_config(
            LangevinSimulation, args=["--config", str(pbc_cfg)]
        )


def test_cheb_dmin_auto_validates_degenerate(monkeypatch):
    """< 2 atoms (no pair) and floors at/above rcut raise at derivation
    time with a self-explanatory message, not later as an opaque config
    error."""
    from flashmd_tpu.data.system import Configuration
    from flashmd_tpu.simulation.cli import _auto_cheb_d_min

    one_atom = Configuration(
        pos=np.zeros((1, 3)), atom_types=np.zeros(1, np.int32),
        masses=np.ones(1),
    )
    with pytest.raises(ValueError, match=">= 2 atoms"):
        _auto_cheb_d_min([one_atom], rcut=10.0)

    sparse = Configuration(
        pos=np.array([[0.0, 0.0, 0.0], [30.0, 0.0, 0.0]]),
        atom_types=np.zeros(2, np.int32), masses=np.ones(2),
    )
    with pytest.raises(ValueError, match="not.*below the model cutoff"):
        _auto_cheb_d_min([sparse], rcut=10.0)


def test_cheb_dmin_override_strips_baked_fit(files, tmp_path, monkeypatch):
    """Overriding the fit domain on a model whose Chebyshev fit is
    already baked (a reloaded specialized dump) must force a RE-FIT —
    evaluating the old domain's coefficients on the new z-mapping would
    be silently wrong physics."""
    import yaml as _yaml

    from flashmd_tpu.models.checkpoint_io import save_specialized_dump

    tmp, cfg_path = files
    ff, configs = cgschnet_1enh_like(
        n_atoms=16, batch_size=1, num_interactions=2, precision="bf16",
        message_passing="cheb", cheb_order=8, neighbor_capacity=8,
    )
    from flashmd_tpu.models.cheb import attach_cheb_fit

    ff = ff.replace(
        schnet_params=attach_cheb_fit(ff.schnet_params, ff.schnet_config)
    )
    assert "cheb_fit" in ff.schnet_params
    dump = tmp_path / "dump.pkl"
    save_specialized_dump(ff, configs, str(dump))

    cfg = _yaml.safe_load(open(cfg_path))
    cfg["model_file"] = str(dump)
    cfg["structure_file"] = str(dump)
    cfg["simulation"]["filename"] = "cli_demo_dmin_strip"
    strip_cfg = tmp_path / "config_strip.yaml"
    _yaml.safe_dump(cfg, open(strip_cfg, "w"))

    monkeypatch.setenv("FLASHMD_TPU_CHEB_DMIN", "1.25")
    model, _, _, _, _ = parse_simulation_config(
        LangevinSimulation, args=["--config", str(strip_cfg)]
    )
    assert model.schnet_config.cheb_d_min == 1.25
    assert "cheb_fit" not in model.schnet_params  # attach will re-fit


def test_cheb_dmin_auto_disabled_with_optim_off(files, monkeypatch):
    tmp, cfg_path = files
    monkeypatch.setenv("FLASHMD_TPU_CHEB_DMIN", "auto")
    model, _, _, _, _ = parse_simulation_config(
        LangevinSimulation,
        args=["--config", str(cfg_path), "--disable_optim",
              "--simulation.filename", "cli_demo_dmin_off"],
    )
    assert model.schnet_config.cheb_d_min == 0.0
