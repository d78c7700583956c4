"""Langevin (BAOAB) and overdamped (Brownian) integrators.

Re-design of the reference integrators
(reference: src/flashmd/simulation/langevin.py — LangevinSimulation :21-312,
OverdampedSimulation :315-434) as pure scan-step functions. The update
algebra (one force evaluation per step, B-A-O-A-[F]-B ordering, vscale /
noisescale definitions, Maxwell-Boltzmann velocity initialization) matches
the reference exactly; the stochastic stream is a JAX PRNG key threaded
through the carry instead of an in-place ``torch.Generator`` buffer
(langevin.py:144-148, 228-232) — trajectories are statistically, not
bitwise, comparable across frameworks.
"""

from __future__ import annotations

import warnings
from typing import Any, Dict, List, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..data.system import Configuration, System
from ..models.forcefield import compute_energy_forces
from .base import Simulation


def sample_maxwell_boltzmann(key, beta, masses, dtype=jnp.float32):
    """Velocities ~ N(0, 1/(beta m)) per atom
    (reference: langevin.py:79-99). beta/masses: [S, A] -> [S, A, 3]."""
    scale = jnp.sqrt(1.0 / (beta * masses))[..., None].astype(dtype)
    return scale * jax.random.normal(
        key, beta.shape + (3,), dtype=dtype
    )


class LangevinSimulation(Simulation):
    r"""BAOAB Langevin dynamics (reference: langevin.py:21-312).

    .. math::
        [B]\; V_{t+1/2} = V_t + (dt / 2m) F(X_t) \\
        [A]\; X_{t+1/2} = X_t + (dt / 2) V_{t+1/2} \\
        [O]\; V'_{t+1/2} = e^{-\gamma dt} V_{t+1/2}
              + \sqrt{1 - e^{-2\gamma dt}} \sqrt{1/(\beta m)}\, \xi \\
        [A]\; X_{t+1} = X_{t+1/2} + (dt / 2) V'_{t+1/2} \\
        [B]\; V_{t+1} = V'_{t+1/2} + (dt / 2m) F(X_{t+1})
    """

    def __init__(self, friction: float = 1e-3, **kwargs: Any):
        super().__init__(**kwargs)
        assert friction > 0
        self.friction = friction
        self.vscale = float(np.exp(-self.dt * self.friction))
        self.noisescale = float(np.sqrt(1 - self.vscale * self.vscale))

    def _attach_configurations(
        self,
        configurations: List[Configuration],
        beta: Union[float, List[float]],
        overdamped: bool = False,
    ):
        super()._attach_configurations(configurations, beta, overdamped)
        system = self.initial_system
        # Per-atom sqrt(1 / (beta m)) (reference langevin.py:211-215).
        beta_atom = jnp.broadcast_to(
            system.beta[:, None], system.masses.shape
        )
        self.beta_mass_ratio = jnp.sqrt(
            1.0 / beta_atom / system.masses
        )[..., None].astype(self.dtype)
        if system.atom_mask is not None:
            # Mixed-size batch: a zero noise scale freezes padded atoms
            # EXACTLY — with zero force (the masked energy is independent
            # of padded coordinates) and zero initial velocity, every
            # BAOAB substep is then the identity for padding.
            self.beta_mass_ratio = (
                self.beta_mass_ratio * system.atom_mask[..., None]
            )
        if system.velocities is None:
            vel = sample_maxwell_boltzmann(
                jax.random.PRNGKey(self.random_seed + 1),
                beta_atom,
                system.masses,
                dtype=self.dtype,
            )
            if system.atom_mask is not None:
                vel = vel * system.atom_mask[..., None]
            self.initial_system = system.replace(velocities=vel)

    def _timestep(self, carry: Dict) -> Dict:
        with jax.named_scope("baoab_timestep"):
            return self._baoab(carry)

    def _baoab(self, carry: Dict) -> Dict:
        dt = self.dt
        masses = self.initial_system.masses[..., None]
        key, sub = jax.random.split(carry["key"])

        # B (first velocity half-step)
        v = carry["vel"] + 0.5 * dt * carry["forces"] / masses
        # A (first position half-step)
        x = carry["pos"] + v * (dt * 0.5)
        # O (stochastic velocity update)
        noise = self.beta_mass_ratio * jax.random.normal(
            sub, carry["vel"].shape, dtype=carry["vel"].dtype
        )
        v = v * self.vscale + self.noisescale * noise
        # A (second position half-step)
        x = x + v * (dt * 0.5)
        # Force evaluation (the expensive part)
        potential, forces, _ = self._forces(carry, x)
        # B (second velocity half-step)
        v = v + 0.5 * dt * forces / masses

        return {
            **carry,
            "pos": x,
            "vel": v,
            "forces": forces,
            "potential": potential,
            "key": key,
        }

    def _frame_outputs(self, carry: Dict) -> Dict:
        out = super()._frame_outputs(carry)
        if self.save_energies:
            # Kinetic energies per sim (reference langevin.py:260-291).
            v = carry["vel"]
            m = self.initial_system.masses
            out["kinetic_energy"] = 0.5 * jnp.sum(
                m[..., None] * v * v, axis=(1, 2)
            )
        return out

    def _accumulate_extra(self, frames_np):
        if self.save_energies and "kinetic_energy" in frames_np:
            if not hasattr(self, "simulated_kinetic_energies") or (
                self.simulated_kinetic_energies is None
            ):
                self.simulated_kinetic_energies = []
            self.simulated_kinetic_energies.append(
                frames_np["kinetic_energy"]
            )

    def _write_extra_frames(self, frames_np: Dict, key: str):
        if self.save_energies and "kinetic_energy" in frames_np:
            np.save(
                f"{self.filename}_kineticenergy_{key}.npy",
                self._swap_and_export(frames_np["kinetic_energy"]),
            )


class OverdampedSimulation(Simulation):
    r"""Brownian dynamics: x <- x + F D dt + sqrt(2 D dt) xi, D = 1/(beta
    friction) (reference: langevin.py:315-434). Masses/velocities unused."""

    def __init__(self, friction: float = 1.0, **kwargs: Any):
        super().__init__(**kwargs)
        assert friction > 0
        self.friction = friction

    def _attach_configurations(
        self,
        configurations: List[Configuration],
        beta: Union[float, List[float]],
        overdamped: bool = True,
    ):
        super()._attach_configurations(configurations, beta, overdamped=True)
        system = self.initial_system
        if any(c.masses is not None for c in configurations):
            warnings.warn(
                "Masses were provided, but will not be used since an "
                "overdamped Langevin scheme is being used for integration."
            )
        beta_atom = jnp.broadcast_to(
            system.beta[:, None], system.masses.shape
        )[..., None]
        self.diffusion = (1.0 / beta_atom / self.friction).astype(self.dtype)
        if system.atom_mask is not None:
            # Freeze padded atoms exactly: zero diffusion kills both the
            # drift (F * dtau, F already zero) and the noise term.
            self.diffusion = self.diffusion * system.atom_mask[..., None]
        self._dtau = self.diffusion * self.dt

    def _timestep(self, carry: Dict) -> Dict:
        key, sub = jax.random.split(carry["key"])
        noise = jax.random.normal(
            sub, carry["pos"].shape, dtype=carry["pos"].dtype
        )
        x = (
            carry["pos"]
            + carry["forces"] * self._dtau
            + jnp.sqrt(2 * self._dtau) * noise
        )
        potential, forces, _ = self._forces(carry, x)
        return {
            **carry,
            "pos": x,
            "forces": forces,
            "potential": potential,
            "key": key,
        }
