"""Radial basis expansions.

Functional re-design of the reference GaussianBasis
(reference: src/flashmd/models/radial_basis/gaussian.py:9-102 and base.py).
Parameters (centers + coefficient) live in a pytree so they can come either
from :func:`init_gaussian_basis` or from a converted reference checkpoint.
"""

from __future__ import annotations

import dataclasses
from typing import Union

import jax.numpy as jnp
import numpy as np

from .cutoff import IdentityCutoff, _Cutoff


@dataclasses.dataclass(frozen=True)
class GaussianBasisConfig:
    """Equidistant Gaussian basis f_n = exp(coeff * (d - c_n)^2) * cutoff(d).

    ``cutoff`` may be a number (interpreted as IdentityCutoff(0, cutoff),
    matching reference gaussian.py:40-49) or a cutoff dataclass.
    """

    cutoff: Union[float, int, _Cutoff] = 5.0
    num_rbf: int = 50
    trainable: bool = False

    def __post_init__(self):
        if isinstance(self.cutoff, (float, int)):
            object.__setattr__(
                self, "cutoff", IdentityCutoff(0.0, float(self.cutoff))
            )
        elif not isinstance(self.cutoff, _Cutoff):
            raise TypeError(
                f"Supplied cutoff {self.cutoff} is neither a number nor a "
                "cutoff instance."
            )
        self.cutoff.check_cutoff()

    @property
    def cutoff_lower(self) -> float:
        return self.cutoff.cutoff_lower

    @property
    def cutoff_upper(self) -> float:
        return self.cutoff.cutoff_upper


def init_gaussian_basis(config: GaussianBasisConfig, dtype=jnp.float32):
    """Initial offsets/coefficient (reference: gaussian.py:64-75).

    Centers are equidistant on [lower, upper]; coeff = -0.5 / delta^2.
    """
    offset = np.linspace(
        config.cutoff_lower, config.cutoff_upper, config.num_rbf
    )
    coeff = -0.5 / float(offset[1] - offset[0]) ** 2
    return {
        "offset": jnp.asarray(offset, dtype=dtype),
        "coeff": jnp.asarray(coeff, dtype=dtype),
    }


def gaussian_basis_apply(params, config: GaussianBasisConfig, dist):
    """Expand distances ``dist [...]`` into ``[..., num_rbf]``.

    Matches reference gaussian.py:83-102 including the cutoff multiplication
    built into the basis itself.
    """
    d = dist[..., None]
    expanded = jnp.exp(
        params["coeff"] * jnp.square(d - params["offset"])
    )
    return expanded * config.cutoff(d)
