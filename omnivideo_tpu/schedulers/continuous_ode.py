"""EDM-style continuous ODE scheduler.

Semantics match reference `omnivideo/modules/schedulers/continuous_ode.py:4-58`
(ContinuousODEScheduler): Karras rho-spaced sigmas, timestep = 0.25·log σ,
preconditioned Euler step.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ContinuousODEScheduler:
    sigmas: jnp.ndarray
    timesteps: jnp.ndarray
    sigma_max: float = 700.0
    sigma_min: float = 0.002
    rho: float = 7.0

    @staticmethod
    def create(
        num_inference_steps: int = 100,
        sigma_max: float = 700.0,
        sigma_min: float = 0.002,
        rho: float = 7.0,
        denoising_strength: float = 1.0,
    ) -> "ContinuousODEScheduler":
        ramp = np.linspace(1 - denoising_strength, 1, num_inference_steps)
        min_r = sigma_min ** (1 / rho)
        max_r = sigma_max ** (1 / rho)
        sig = (max_r + ramp * (min_r - max_r)) ** rho
        return ContinuousODEScheduler(
            sigmas=jnp.asarray(sig, jnp.float32),
            timesteps=jnp.asarray(np.log(sig) * 0.25, jnp.float32),
            sigma_max=sigma_max,
            sigma_min=sigma_min,
            rho=rho,
        )

    def _tid(self, timestep):
        return jnp.argmin(jnp.abs(self.timesteps - jnp.asarray(timestep, jnp.float32)))

    def step(self, model_output, timestep, sample, to_final: bool = False):
        tid = self._tid(timestep)
        sigma = self.sigmas[tid]
        s2p1 = jnp.sqrt(sigma * sigma + 1)
        sample = sample * s2p1
        est = -sigma / s2p1 * model_output + sample / (sigma * sigma + 1)
        last = tid + 1 >= self.sigmas.shape[0]
        sigma_n = self.sigmas[jnp.minimum(tid + 1, self.sigmas.shape[0] - 1)]
        deriv = (sample - est) / sigma
        stepped = (sample + deriv * (sigma_n - sigma)) / jnp.sqrt(sigma_n * sigma_n + 1)
        return jnp.where(jnp.logical_or(to_final, last), est, stepped)

    def add_noise(self, original_samples, noise, timestep):
        sigma = self.sigmas[self._tid(timestep)]
        return (original_samples + noise * sigma) / jnp.sqrt(sigma * sigma + 1)

    def training_target(self, sample, noise, timestep):
        sigma = self.sigmas[self._tid(timestep)]
        s2p1 = jnp.sqrt(sigma * sigma + 1)
        return (-s2p1 / sigma + 1 / s2p1 / sigma) * sample + noise / s2p1

    def training_weight(self, timestep):
        sigma = self.sigmas[self._tid(timestep)]
        return jnp.sqrt(1 + sigma * sigma) / sigma
