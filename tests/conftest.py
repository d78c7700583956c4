"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Mirrors the reference's pytest plumbing role (reference: conftest.py:4-48)
but adds what the reference lacks: a multi-device environment so sharding
paths are exercised on every CI run.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Some environments ship a sitecustomize that force-prepends an accelerator
# platform to jax_platforms, overriding the env var — override the config
# directly so tests always run on the 8-device virtual CPU backend.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Pallas kernels run in interpreter mode on the CPU test backend.
os.environ.setdefault("FLASHMD_PALLAS_INTERPRET", "1")

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--light",
        action="store_true",
        default=False,
        help="skip tests marked heavy",
    )
    # CI sharding across containers (reference: conftest.py:4-48): run only
    # the tests whose collection index i satisfies i % num_containers ==
    # runner_idx.
    parser.addoption("--runner_idx", type=int, default=None)
    parser.addoption("--num_containers", type=int, default=None)


def pytest_collection_modifyitems(config, items):
    if config.getoption("--light"):
        skip_heavy = pytest.mark.skip(reason="skipped with --light")
        for item in items:
            if "heavy" in item.keywords:
                item.add_marker(skip_heavy)
    idx = config.getoption("--runner_idx")
    n = config.getoption("--num_containers")
    if n is not None:
        if idx is None or not 0 <= idx < n:
            raise pytest.UsageError(
                "--runner_idx must be in [0, num_containers)"
            )
        skip_shard = pytest.mark.skip(reason="other CI shard")
        for i, item in enumerate(items):
            if i % n != idx:
                item.add_marker(skip_shard)
