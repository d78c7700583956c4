"""Zoo defaults: the flagship model's precision-dependent fast-path knobs.

The bf16 default is the measured throughput/fidelity frontier point
(benchmarks/fidelity_asym.py grid at FIT_DMIN=2.0: (48, 64) at 6.90e-3
max rel force error, within the 7.2e-3 budget); explicit knobs must opt
out of the coupled defaults so a hand-picked order never silently runs
on a different fit domain than it was validated on.
"""

import pytest

from flashmd_tpu.models.zoo import cgschnet_1enh_like

_SMALL = dict(n_atoms=8, batch_size=1, num_interactions=1)


def test_bf16_default_is_restricted_domain_asymmetric():
    ff, _ = cgschnet_1enh_like(precision="bf16", **_SMALL)
    cfg = ff.schnet_config
    assert cfg.cheb_order == 48
    assert cfg.cheb_order_deriv == 64
    assert cfg.cheb_d_min == 2.0


def test_fp32_default_is_full_domain_symmetric():
    ff, _ = cgschnet_1enh_like(precision="fp32", **_SMALL)
    cfg = ff.schnet_config
    assert cfg.cheb_order == 128
    assert cfg.cheb_order_deriv is None  # symmetric: follows cheb_order
    assert cfg.cheb_d_min == 0.0


def test_explicit_order_opts_out_of_restricted_domain():
    ff, _ = cgschnet_1enh_like(precision="bf16", cheb_order=64, **_SMALL)
    cfg = ff.schnet_config
    assert cfg.cheb_order == 64
    assert cfg.cheb_order_deriv is None  # explicit order stays symmetric
    assert cfg.cheb_d_min == 0.0  # and full-domain


def test_bf16_default_order_is_size_aware():
    """Fidelity is size-coupled (bf16 accumulation error grows with
    K = n_atoms): past the 266-bead flagship the measured frontier point
    is (64, 64) — (48, 64) reads 9.05e-3 at A=532, over that size's
    budget (PERFORMANCE.md, 2026-08-18)."""
    ff, _ = cgschnet_1enh_like(
        precision="bf16", n_atoms=532, batch_size=1, num_interactions=1
    )
    cfg = ff.schnet_config
    assert cfg.cheb_order == 64
    assert cfg.cheb_order_deriv == 64
    assert cfg.cheb_d_min == 2.0


def test_bf16_default_warns_past_measured_frontier():
    import warnings

    import pytest

    with pytest.warns(UserWarning, match="measured fidelity frontier"):
        cgschnet_1enh_like(
            precision="bf16", n_atoms=533, batch_size=1,
            num_interactions=1,
        )
    # explicit orders silence it — the user has taken over validation
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        cgschnet_1enh_like(
            precision="bf16", n_atoms=533, batch_size=1,
            num_interactions=1, cheb_order=64,
        )


def test_bf16x3_default_has_its_own_frontier_point():
    """bf16x3's floor is ~1.9e-3, so the bf16 (48, 64) default would
    silently fit-limit the tier at 5.67e-3 (measured grid, 2026-08-18);
    it gets (64, 96) on the restricted domain instead."""
    ff, _ = cgschnet_1enh_like(precision="bf16x3", **_SMALL)
    cfg = ff.schnet_config
    assert cfg.cheb_order == 64
    assert cfg.cheb_order_deriv == 96
    assert cfg.cheb_d_min == 2.0


def test_explicit_d_min_and_deriv_are_honored():
    ff, _ = cgschnet_1enh_like(
        precision="bf16",
        cheb_order=64,
        cheb_order_deriv=96,
        cheb_d_min=1.5,
        **_SMALL,
    )
    cfg = ff.schnet_config
    assert cfg.cheb_order == 64
    assert cfg.cheb_order_deriv == 96
    assert cfg.cheb_d_min == 1.5


def test_explicit_deriv_order_also_opts_out_of_restricted_domain():
    """ADVICE r2: EITHER explicit order opts out of the coupled defaults —
    a hand-picked derivative order must not silently run on the implicit
    d_min=2.0 fit domain it was never validated on."""
    ff, _ = cgschnet_1enh_like(
        precision="bf16", cheb_order_deriv=96, **_SMALL
    )
    cfg = ff.schnet_config
    assert cfg.cheb_d_min == 0.0
    assert cfg.cheb_order == 64  # full-domain-validated forward default
    assert cfg.cheb_order_deriv == 96

    ff3, _ = cgschnet_1enh_like(
        precision="bf16x3", cheb_order_deriv=96, **_SMALL
    )
    cfg3 = ff3.schnet_config
    assert cfg3.cheb_d_min == 0.0
    assert cfg3.cheb_order == 96  # the tier's full-domain point


def test_bf16x3_warns_past_its_own_measured_frontier():
    """ADVICE r2: the bf16x3 grid was measured only at A=266, and its
    users specifically want near-fp32 fidelity — warn at 266, not 532."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        cgschnet_1enh_like(
            precision="bf16x3", n_atoms=266, batch_size=1,
            num_interactions=1,
        )  # at the frontier: no warning
    with pytest.warns(UserWarning, match="A=266"):
        cgschnet_1enh_like(
            precision="bf16x3", n_atoms=300, batch_size=1,
            num_interactions=1,
        )
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        cgschnet_1enh_like(
            precision="bf16", n_atoms=300, batch_size=1,
            num_interactions=1,
        )  # bf16's frontier stays 532
