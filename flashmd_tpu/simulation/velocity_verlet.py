"""NVE (microcanonical) velocity-Verlet integrator.

Re-design of the reference NVESimulation
(reference: src/flashmd/simulation/velocity_verlet.py:12-95): symplectic,
time-reversible, one force evaluation per step. Initial velocities are
Maxwell-Boltzmann sampled if absent.
"""

from __future__ import annotations

from typing import Dict, List, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..data.system import Configuration
from ..models.forcefield import compute_energy_forces
from .base import Simulation
from .langevin import sample_maxwell_boltzmann


class NVESimulation(Simulation):
    r"""Velocity Verlet:

    .. math::
        v_{t+1/2} = v_t + (dt / 2m) F(x_t) \\
        x_{t+1} = x_t + dt\, v_{t+1/2} \\
        v_{t+1} = v_{t+1/2} + (dt / 2m) F(x_{t+1})
    """

    def _attach_configurations(
        self,
        configurations: List[Configuration],
        beta: Union[float, List[float]],
        overdamped: bool = False,
    ):
        super()._attach_configurations(configurations, beta, overdamped)
        system = self.initial_system
        if system.velocities is None:
            beta_atom = jnp.broadcast_to(
                system.beta[:, None], system.masses.shape
            )
            vel = sample_maxwell_boltzmann(
                jax.random.PRNGKey(self.random_seed + 1),
                beta_atom,
                system.masses,
                dtype=self.dtype,
            )
            if system.atom_mask is not None:
                # Mixed batch: padded atoms start AND stay at rest (their
                # forces are identically zero, so velocity-Verlet never
                # moves them).
                vel = vel * system.atom_mask[..., None]
            self.initial_system = system.replace(velocities=vel)

    def _timestep(self, carry: Dict) -> Dict:
        dt = self.dt
        m = self.initial_system.masses[..., None]
        v_half = carry["vel"] + 0.5 * dt * carry["forces"] / m
        x = carry["pos"] + dt * v_half
        potential, forces, _ = self._forces(carry, x)
        v = v_half + 0.5 * dt * forces / m
        return {
            **carry,
            "pos": x,
            "vel": v,
            "forces": forces,
            "potential": potential,
        }

    def _frame_outputs(self, carry: Dict) -> Dict:
        out = super()._frame_outputs(carry)
        if self.save_energies:
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
