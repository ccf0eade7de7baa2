"""Enhanced DDIM scheduler with optional zero-terminal-SNR rescale.

Semantics match reference `omnivideo/modules/schedulers/ddim.py:4-110`
(EnhancedDDIMScheduler): scaled-linear betas, timesteps aligned to 999…0,
epsilon / v-prediction denoise weights — as a stateless jnp-table object.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class EnhancedDDIMScheduler:
    alphas_cumprod: jnp.ndarray  # [T]
    timesteps: jnp.ndarray  # [S]
    num_train_timesteps: int
    prediction_type: str = "epsilon"

    @staticmethod
    def create(
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        beta_schedule: str = "scaled_linear",
        prediction_type: str = "epsilon",
        rescale_zero_terminal_snr: bool = False,
        num_inference_steps: int = 10,
        denoising_strength: float = 1.0,
    ) -> "EnhancedDDIMScheduler":
        if beta_schedule == "scaled_linear":
            betas = np.square(
                np.linspace(np.sqrt(beta_start), np.sqrt(beta_end), num_train_timesteps)
            )
        elif beta_schedule == "linear":
            betas = np.linspace(beta_start, beta_end, num_train_timesteps)
        else:
            raise NotImplementedError(beta_schedule)
        acp = np.cumprod(1.0 - betas)
        if rescale_zero_terminal_snr:
            # shift/scale sqrt(ᾱ) so terminal SNR is zero (ddim.py:22-38)
            s = np.sqrt(acp)
            s0, sT = s[0], s[-1]
            s = (s - sT) * (s0 / (s0 - sT))
            acp = np.square(s)
        ts = _timesteps(num_train_timesteps, num_inference_steps, denoising_strength)
        return EnhancedDDIMScheduler(
            alphas_cumprod=jnp.asarray(acp, jnp.float32),
            timesteps=jnp.asarray(ts, jnp.float32),
            num_train_timesteps=num_train_timesteps,
            prediction_type=prediction_type,
        )

    def set_timesteps(self, num_inference_steps, denoising_strength=1.0):
        ts = _timesteps(self.num_train_timesteps, num_inference_steps, denoising_strength)
        return dataclasses.replace(self, timesteps=jnp.asarray(ts, jnp.float32))

    # -- core ----------------------------------------------------------------

    def _denoise(self, model_output, sample, a_t, a_prev):
        if self.prediction_type == "epsilon":
            w_e = jnp.sqrt(1 - a_prev) - jnp.sqrt(a_prev * (1 - a_t) / a_t)
            w_x = jnp.sqrt(a_prev / a_t)
        elif self.prediction_type == "v_prediction":
            w_e = -jnp.sqrt(a_prev * (1 - a_t)) + jnp.sqrt(a_t * (1 - a_prev))
            w_x = jnp.sqrt(a_t * a_prev) + jnp.sqrt((1 - a_t) * (1 - a_prev))
        else:
            raise NotImplementedError(self.prediction_type)
        return sample * w_x + model_output * w_e

    def step(self, model_output, timestep, sample, to_final: bool = False):
        t = jnp.asarray(timestep, jnp.float32).reshape(())
        a_t = self.alphas_cumprod[t.astype(jnp.int32)]
        tid = jnp.argmin(jnp.abs(self.timesteps - t))
        last = tid + 1 >= self.timesteps.shape[0]
        t_prev = self.timesteps[jnp.minimum(tid + 1, self.timesteps.shape[0] - 1)]
        a_prev = jnp.where(
            jnp.logical_or(to_final, last),
            jnp.float32(1.0),
            self.alphas_cumprod[t_prev.astype(jnp.int32)],
        )
        return self._denoise(model_output, sample, a_t, a_prev)

    def return_to_timestep(self, timestep, sample, sample_stabilized):
        a_t = self.alphas_cumprod[jnp.asarray(timestep, jnp.int32).reshape(())]
        return (sample - jnp.sqrt(a_t) * sample_stabilized) / jnp.sqrt(1 - a_t)

    def add_noise(self, original_samples, noise, timestep):
        a_t = self.alphas_cumprod[jnp.asarray(timestep, jnp.int32).reshape(())]
        return jnp.sqrt(a_t) * original_samples + jnp.sqrt(1 - a_t) * noise

    def training_target(self, sample, noise, timestep):
        if self.prediction_type == "epsilon":
            return noise
        a_t = self.alphas_cumprod[jnp.asarray(timestep, jnp.int32).reshape(())]
        return jnp.sqrt(a_t) * noise - jnp.sqrt(1 - a_t) * sample

    def training_weight(self, timestep):
        return jnp.float32(1.0)


def _timesteps(num_train, num_steps, strength):
    """999…0-aligned timesteps (ddim.py:41-50)."""
    max_t = max(round(num_train * strength) - 1, 0)
    n = min(num_steps, max_t + 1)
    if n == 1:
        return np.array([max_t], np.float64)
    step = max_t / (n - 1)
    return np.array([round(max_t - i * step) for i in range(n)], np.float64)
