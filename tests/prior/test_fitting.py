"""Prior fitting helpers recover known parameters."""

import numpy as np

from flashmd_tpu.prior.fitting import (
    fit_fourier_from_potential_estimates,
    fit_harmonic_from_potential_estimates,
    fit_repulsion_from_potential_estimates,
    fit_repulsion_from_values,
    fourier_compute_np,
    harmonic_compute_np,
)


def test_harmonic_recovery():
    x = np.linspace(0.5, 2.5, 200)
    dg = harmonic_compute_np(x, 1.4, 55.0, -2.0)
    stat = fit_harmonic_from_potential_estimates(x, dg)
    assert abs(stat["x_0"] - 1.4) < 1e-3
    assert abs(stat["k"] - 55.0) / 55.0 < 1e-3


def test_repulsion_percentile():
    rng = np.random.default_rng(0)
    vals = rng.uniform(1.0, 5.0, 10000)
    stat = fit_repulsion_from_values(vals, percentile=1)
    assert 1.0 < stat["sigma"] < 1.2
    stat2 = fit_repulsion_from_values(vals, percentile=1, cutoff=3.0)
    assert stat2["sigma"] <= stat["sigma"] + 0.05


def test_repulsion_from_bins():
    bins = np.linspace(2.0, 8.0, 20)
    stat = fit_repulsion_from_potential_estimates(bins)
    delta = bins[1] - bins[0]
    assert abs(stat["sigma"] - (bins[0] - delta / 2)) < 1e-12


def test_fourier_degree_selection():
    theta = np.linspace(-np.pi, np.pi, 400)
    true_k1 = [0.8, 0.0, -0.4]
    true_k2 = [0.1, 0.5, 0.0]
    dg = fourier_compute_np(theta, 0.3, true_k1, true_k2)
    stat = fit_fourier_from_potential_estimates(theta, dg, n_degs=6)
    got_k1 = [stat["k1s"][f"k1_{i+1}"] for i in range(3)]
    got_k2 = [stat["k2s"][f"k2_{i+1}"] for i in range(3)]
    np.testing.assert_allclose(got_k1, true_k1, atol=2e-2)
    np.testing.assert_allclose(got_k2, true_k2, atol=2e-2)
    assert abs(stat["v_0"] - 0.3) < 2e-2


def test_fourier_constrained_degree():
    theta = np.linspace(-np.pi, np.pi, 300)
    dg = fourier_compute_np(theta, 0.0, [1.0], [0.0])
    stat = fit_fourier_from_potential_estimates(
        theta, dg, n_degs=4, constrain_deg=2
    )
    assert abs(stat["k1s"]["k1_1"] - 1.0) < 1e-6
    assert stat["k1s"]["k1_3"] == 0.0
