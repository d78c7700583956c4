"""Smooth cutoff envelopes.

Functional JAX re-design of the reference cutoff classes
(reference: src/flashmd/models/cutoff.py:8-199). Cutoffs are frozen,
hashable dataclasses (usable as static jit arguments) whose ``__call__``
evaluates the envelope elementwise on any-shaped distance arrays.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class _Cutoff:
    cutoff_lower: float = 0.0
    cutoff_upper: float = float("inf")

    def check_cutoff(self):
        if self.cutoff_upper < self.cutoff_lower:
            raise ValueError(
                f"Upper cutoff {self.cutoff_upper} is less than lower "
                f"cutoff {self.cutoff_lower}"
            )

    def __call__(self, distances):
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class IdentityCutoff(_Cutoff):
    """Envelope that is one everywhere (reference: cutoff.py:40-72)."""

    cutoff_lower: float = 0.0
    cutoff_upper: float = float(np.inf)

    def __post_init__(self):
        self.check_cutoff()

    def __call__(self, distances):
        return jnp.ones_like(distances)


@dataclasses.dataclass(frozen=True)
class CosineCutoff(_Cutoff):
    """Cosine envelope on [lower, upper] (reference: cutoff.py:75-145).

    For ``cutoff_lower == 0``:  ``0.5 (cos(d pi / upper) + 1) * (d < upper)``.
    Otherwise the two-sided variant with hard zeroing outside
    (lower, upper).
    """

    cutoff_lower: float = 0.0
    cutoff_upper: float = 5.0

    def __post_init__(self):
        self.check_cutoff()

    def __call__(self, distances):
        if self.cutoff_lower > 0:
            cutoffs = 0.5 * (
                jnp.cos(
                    math.pi
                    * (
                        2
                        * (distances - self.cutoff_lower)
                        / (self.cutoff_upper - self.cutoff_lower)
                        + 1.0
                    )
                )
                + 1.0
            )
            cutoffs = cutoffs * (distances < self.cutoff_upper).astype(
                distances.dtype
            )
            cutoffs = cutoffs * (distances > self.cutoff_lower).astype(
                distances.dtype
            )
            return cutoffs
        cutoffs = 0.5 * (
            jnp.cos(distances * math.pi / self.cutoff_upper) + 1.0
        )
        return cutoffs * (distances < self.cutoff_upper).astype(
            distances.dtype
        )


@dataclasses.dataclass(frozen=True)
class ShiftedCosineCutoff(_Cutoff):
    """Behler cosine cutoff with a smoothing width
    (reference: cutoff.py:148-199)."""

    cutoff_lower: float = 0.0
    cutoff_upper: float = 5.0
    smooth_width: float = 0.5

    def __call__(self, distances):
        smooth = 0.5 + 0.5 * jnp.cos(
            math.pi
            * (distances - self.cutoff_upper + self.smooth_width)
            / self.smooth_width
        )
        cutoffs = jnp.where(
            distances > self.cutoff_upper - self.smooth_width,
            smooth,
            jnp.ones_like(distances),
        )
        return jnp.where(
            distances > self.cutoff_upper, jnp.zeros_like(cutoffs), cutoffs
        )
