"""Parallel tempering: exchange bookkeeping, statistics, output files."""

import numpy as np
import pytest

from flashmd_tpu.simulation import PTSimulation

from .test_integrators import chain_configs, harmonic_ff


def make_pt(tmp_path=None, **over):
    kwargs = dict(
        friction=1.0,
        dt=5e-3,
        n_timesteps=200,
        save_interval=10,
        exchange_interval=20,
        save_energies=True,
        random_seed=11,
    )
    if tmp_path is not None:
        kwargs.update(
            export_interval=100,
            filename="pt",
            output_dir=str(tmp_path),
        )
    kwargs.update(over)
    return PTSimulation(**kwargs)


BETAS = [1.67, 1.42, 1.16]


def test_replication_layout():
    sim = make_pt()
    sim.attach_model_and_configurations(
        harmonic_ff(5), chain_configs(4, 5), BETAS
    )
    assert sim.n_sims == 12
    assert sim.n_replicas == 3
    assert sim.n_indep_sims == 4
    beta = np.asarray(sim.initial_system.beta)
    np.testing.assert_allclose(beta, np.repeat(BETAS, 4))


def test_betas_must_decrease():
    sim = make_pt()
    with pytest.raises(ValueError, match="increasing temperature"):
        sim.attach_model_and_configurations(
            harmonic_ff(5), chain_configs(2, 5), [1.16, 1.42, 1.67]
        )
    with pytest.raises(ValueError):
        sim.attach_model_and_configurations(
            harmonic_ff(5), chain_configs(2, 5), 1.0
        )


def test_exchange_happens_and_is_recorded(tmp_path):
    sim = make_pt(tmp_path)
    sim.attach_model_and_configurations(
        harmonic_ff(6), chain_configs(4, 6), BETAS
    )
    sim.simulate()
    attempted = int(sim.final_carry["n_exchange_attempted"])
    approved = int(sim.final_carry["n_exchange_approved"])
    # 200 steps / 20 = 10 exchange events; with 3 replicas there is one
    # even pair group (0,1) and one odd (1,2), each 4 indep sims.
    assert attempted == 10 * 4
    assert 0 <= approved <= attempted
    # With close betas on identical systems, exchanges should happen often.
    assert approved > 0
    assert (tmp_path / "pt_acceptance_0000.npy").exists()
    acc = np.load(tmp_path / "pt_acceptance_0000.npy")
    assert acc.shape == (3, 3)
    # accepted + rejected across the diagonal == attempts in this export
    # (5 exchange events x 4 sims in the first export window)
    total_counted = acc[0, 1] + acc[1, 0] + acc[1, 2] + acc[2, 1]
    assert total_counted == 5 * 4


def test_acceptance_matrix_resets_between_exports(tmp_path):
    sim = make_pt(tmp_path)
    sim.attach_model_and_configurations(
        harmonic_ff(6), chain_configs(4, 6), BETAS
    )
    sim.simulate()
    a0 = np.load(tmp_path / "pt_acceptance_0000.npy")
    a1 = np.load(tmp_path / "pt_acceptance_0001.npy")
    # each export covers 5 exchange events: 3 even (8 pairs-ish) + 2 odd
    for acc in (a0, a1):
        counts = acc[0, 1] + acc[1, 0] + acc[1, 2] + acc[2, 1]
        assert counts > 0


def test_get_replica_info():
    sim = make_pt()
    sim.attach_model_and_configurations(
        harmonic_ff(5), chain_configs(3, 5), BETAS
    )
    info = sim.get_replica_info(1)
    np.testing.assert_array_equal(
        info["indices_in_the_output"], [3, 4, 5]
    )
    assert info["beta"] == BETAS[1]
    with pytest.raises(ValueError):
        sim.get_replica_info(7)


def test_two_replica_exchange():
    sim = make_pt(n_timesteps=100, exchange_interval=10)
    sim.attach_model_and_configurations(
        harmonic_ff(5), chain_configs(2, 5), [2.0, 1.0]
    )
    sim.simulate()
    assert int(sim.final_carry["n_exchange_attempted"]) == 10 * 2
