"""Flow-matching training/Euler scheduler.

Semantics match the reference `omnivideo/modules/schedulers/flow_match.py:5-104`
(FlowMatchScheduler): shifted linspace sigma schedule, Euler step, linear
interpolation noising `x_t = (1-σ)x + σε`, velocity target `ε − x`, and the
Gaussian-bump timestep loss weights — re-expressed as a stateless sigma-table
object whose methods are jit/vmap-friendly (timestep → index lookup is a pure
argmin over a device-resident table; no host sync in the training step).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np


def _shifted_sigmas(
    num_steps: int,
    shift: float,
    sigma_max: float,
    sigma_min: float,
    extra_one_step: bool,
    inverse_timesteps: bool,
    reverse_sigmas: bool,
    denoising_strength: float = 1.0,
) -> np.ndarray:
    sigma_start = sigma_min + (sigma_max - sigma_min) * denoising_strength
    if extra_one_step:
        sigmas = np.linspace(sigma_start, sigma_min, num_steps + 1)[:-1]
    else:
        sigmas = np.linspace(sigma_start, sigma_min, num_steps)
    if inverse_timesteps:
        sigmas = sigmas[::-1].copy()
    sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
    if reverse_sigmas:
        sigmas = 1 - sigmas
    return sigmas.astype(np.float64)


@dataclasses.dataclass(frozen=True)
class FlowMatchScheduler:
    """Stateless flow-matching schedule.

    All tables are host-built numpy and exposed as jnp arrays; every method is
    pure so it can live inside a jitted train step.
    """

    sigmas: jnp.ndarray  # [S] float32
    timesteps: jnp.ndarray  # [S] float32 (= sigmas * num_train_timesteps)
    num_train_timesteps: int
    training_weights: Optional[jnp.ndarray] = None  # [S] float32
    terminal_sigma: float = 0.0  # sigma after the final step

    @staticmethod
    def create(
        num_inference_steps: int = 100,
        num_train_timesteps: int = 1000,
        shift: float = 3.0,
        sigma_max: float = 1.0,
        sigma_min: float = 0.003 / 1.002,
        inverse_timesteps: bool = False,
        extra_one_step: bool = False,
        reverse_sigmas: bool = False,
        is_training: bool = False,
        denoising_strength: float = 1.0,
    ) -> "FlowMatchScheduler":
        sig = _shifted_sigmas(
            num_inference_steps,
            shift,
            sigma_max,
            sigma_min,
            extra_one_step,
            inverse_timesteps,
            reverse_sigmas,
            denoising_strength,
        )
        ts = sig * num_train_timesteps
        weights = None
        if is_training:
            # Gaussian bump over timesteps (flow_match.py:33-37)
            x = ts
            y = np.exp(-2 * ((x - num_inference_steps / 2) / num_inference_steps) ** 2)
            y_shifted = y - y.min()
            weights = y_shifted * (num_inference_steps / y_shifted.sum())
            weights = jnp.asarray(weights, dtype=jnp.float32)
        terminal = 1.0 if (inverse_timesteps or reverse_sigmas) else 0.0
        return FlowMatchScheduler(
            sigmas=jnp.asarray(sig, dtype=jnp.float32),
            timesteps=jnp.asarray(ts, dtype=jnp.float32),
            num_train_timesteps=num_train_timesteps,
            training_weights=weights,
            terminal_sigma=terminal,
        )

    # -- helpers -----------------------------------------------------------

    def _timestep_id(self, timestep: jnp.ndarray) -> jnp.ndarray:
        """Nearest schedule index for (a batch of) timesteps."""
        timestep = jnp.atleast_1d(jnp.asarray(timestep, dtype=jnp.float32))
        return jnp.argmin(
            jnp.abs(self.timesteps[None, :] - timestep[:, None]), axis=-1
        )

    # -- inference ---------------------------------------------------------

    def step(self, model_output, timestep, sample, to_final: bool = False):
        """Euler step: x ← x + v·(σ_next − σ) (flow_match.py:40-50)."""
        tid = self._timestep_id(timestep)[0]
        sigma = self.sigmas[tid]
        last = tid + 1 >= self.sigmas.shape[0]
        sigma_next = jnp.where(
            jnp.logical_or(to_final, last),
            jnp.float32(self.terminal_sigma),
            self.sigmas[jnp.minimum(tid + 1, self.sigmas.shape[0] - 1)],
        )
        return sample + model_output * (sigma_next - sigma).astype(sample.dtype)

    def return_to_timestep(self, timestep, sample, sample_stabilized):
        tid = self._timestep_id(timestep)[0]
        sigma = self.sigmas[tid]
        return (sample - sample_stabilized) / sigma

    # -- training ----------------------------------------------------------

    def add_noise(self, original_samples, noise, timestep):
        """x_t = (1−σ)·x + σ·ε, σ looked up per-sample (flow_match.py:62-68)."""
        tid = self._timestep_id(timestep)
        sigma = self.sigmas[tid].astype(original_samples.dtype)
        sigma = sigma.reshape((-1,) + (1,) * (original_samples.ndim - 1))
        return (1 - sigma) * original_samples + sigma * noise

    def training_target(self, sample, noise, timestep=None):
        """Velocity target v = ε − x (flow_match.py:71-73)."""
        return noise - sample

    def training_weight(self, timestep):
        assert self.training_weights is not None, "create(is_training=True) required"
        tid = self._timestep_id(timestep)
        return self.training_weights[tid]
