"""Flow-matching DPM-Solver++ multistep solver, TPU-native formulation.

Semantics match the reference `omnivideo/utils/fm_solvers.py:70-790`
(FlowDPMSolverMultistepScheduler, algorithm 'dpmsolver++', solver_type
'midpoint', final_sigmas_type 'zero') plus its helpers `get_sampling_sigmas`
(fm_solvers.py:23) and `retrieve_timesteps` (fm_solvers.py:30).

Like `unipc.py`, all schedule-dependent scalars are precomputed on the host in
float64 and folded into per-step coefficient tables so the device step is one
linear combination inside `lax.scan`:

    x0_i    = x_i − σ_i · v_i
    (m2,m1) ← (m1,x0_i)
    x_{i+1} = pX·x_i + pM1·m1 + pM2·m2 + pM3·m3

Order selection (first-order warmup, lower-order final steps,
fm_solvers.py:747-783) is resolved statically.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np


def get_sampling_sigmas(sampling_steps: int, shift: float) -> np.ndarray:
    """Shifted linspace sigmas (reference fm_solvers.py:23-27)."""
    sigma = np.linspace(1, 0, sampling_steps + 1, dtype=np.float64)[:sampling_steps]
    return shift * sigma / (1 + (shift - 1) * sigma)


class DPMState(NamedTuple):
    x: jnp.ndarray
    m1: jnp.ndarray
    m2: jnp.ndarray
    m3: jnp.ndarray


class DPMCoeffs(NamedTuple):
    sigma: jnp.ndarray
    timestep: jnp.ndarray
    pX: jnp.ndarray
    pM1: jnp.ndarray
    pM2: jnp.ndarray
    pM3: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class FlowDPMSolver:
    sigmas: np.ndarray  # [S+1] float64 (terminal appended)
    timesteps: np.ndarray  # [S] float64 integer-valued
    coeffs: DPMCoeffs
    num_train_timesteps: int
    solver_order: int

    @staticmethod
    def create(
        num_inference_steps: Optional[int] = None,
        shift: float = 1.0,
        num_train_timesteps: int = 1000,
        solver_order: int = 2,
        solver_type: str = "midpoint",
        lower_order_final: bool = True,
        euler_at_final: bool = False,
        sigmas: Optional[np.ndarray] = None,
    ) -> "FlowDPMSolver":
        N = num_train_timesteps
        if sigmas is None:
            assert num_inference_steps is not None
            sigma_max = 1.0 - 1.0 / N
            sigmas = np.linspace(
                sigma_max, 0.0, num_inference_steps + 1, dtype=np.float64
            )[:-1]
            sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
        else:
            sigmas = np.asarray(sigmas, dtype=np.float64)
        S = len(sigmas)
        timesteps = np.trunc(sigmas * N)
        sig = np.concatenate([sigmas, [0.0]])
        with np.errstate(divide="ignore"):
            lam = np.log(1.0 - sig) - np.log(sig)

        pX = np.zeros(S)
        pM1 = np.zeros(S)
        pM2 = np.zeros(S)
        pM3 = np.zeros(S)

        lower_order_nums = 0
        for i in range(S):
            # order gating (fm_solvers.py:747-783); final_sigmas_type=='zero'
            # forces first-order at the last step.
            is_last = i == S - 1
            is_second_last = i == S - 2
            low_final = is_last and (
                euler_at_final or (lower_order_final and S < 15) or True
            )
            low_second = is_second_last and lower_order_final and S < 15
            if solver_order == 1 or lower_order_nums < 1 or low_final:
                order = 1
            elif solver_order == 2 or lower_order_nums < 2 or low_second:
                order = 2
            else:
                order = 3
            lower_order_nums = min(lower_order_nums + 1, solver_order)

            alpha_t = 1.0 - sig[i + 1]
            h = lam[i + 1] - lam[i]
            em1 = np.expm1(-h)  # e^{-h} − 1
            pX[i] = sig[i + 1] / sig[i]
            if order == 1:
                pM1[i] = -alpha_t * em1
            elif order == 2:
                h0 = lam[i] - lam[i - 1]
                r0 = h0 / h
                if solver_type == "midpoint":
                    # −α·em1·D0 − 0.5·α·em1·D1, D1 = (m0−m1)/r0
                    pM1[i] = -alpha_t * em1 * (1.0 + 0.5 / r0)
                    pM2[i] = alpha_t * em1 * 0.5 / r0
                elif solver_type == "heun":
                    # −α·em1·D0 + α·(em1/h + 1)·D1
                    c1 = alpha_t * (em1 / h + 1.0)
                    pM1[i] = -alpha_t * em1 + c1 / r0
                    pM2[i] = -c1 / r0
                else:
                    raise NotImplementedError(solver_type)
            else:
                h0 = lam[i] - lam[i - 1]
                h1 = lam[i - 1] - lam[i - 2]
                r0, r1 = h0 / h, h1 / h
                # D1 = D1_0 + r0/(r0+r1)·(D1_0−D1_1); D2 = (D1_0−D1_1)/(r0+r1)
                # D1_0 = (m0−m1)/r0; D1_1 = (m1−m2)/r1   (fm_solvers.py:662-666)
                cD1 = alpha_t * (em1 / h + 1.0)
                cD2 = -alpha_t * ((em1 + h) / h**2 - 0.5)
                w = r0 / (r0 + r1)
                # D1 in terms of m: a0·m0 + a1·m1 + a2·m2
                a0 = (1 + w) / r0
                a1 = -(1 + w) / r0 - w / r1
                a2 = w / r1
                # D2: b0·m0 + b1·m1 + b2·m2
                b0 = 1.0 / (r0 * (r0 + r1))
                b1 = -(1.0 / r0 + 1.0 / r1) / (r0 + r1)
                b2 = 1.0 / (r1 * (r0 + r1))
                pM1[i] = -alpha_t * em1 + cD1 * a0 + cD2 * b0
                pM2[i] = cD1 * a1 + cD2 * b1
                pM3[i] = cD1 * a2 + cD2 * b2

        f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
        coeffs = DPMCoeffs(
            sigma=f32(sigmas),
            timestep=f32(timesteps),
            pX=f32(pX),
            pM1=f32(pM1),
            pM2=f32(pM2),
            pM3=f32(pM3),
        )
        return FlowDPMSolver(
            sigmas=sig,
            timesteps=timesteps,
            coeffs=coeffs,
            num_train_timesteps=N,
            solver_order=solver_order,
        )

    def init_state(self, latents: jnp.ndarray) -> DPMState:
        x = latents.astype(jnp.float32)
        z = jnp.zeros_like(x)
        return DPMState(x=x, m1=z, m2=z, m3=z)

    @staticmethod
    def scan_step(state: DPMState, coeffs: DPMCoeffs, velocity: jnp.ndarray) -> DPMState:
        v = velocity.astype(jnp.float32)
        x0 = state.x - coeffs.sigma * v
        m1, m2, m3 = x0, state.m1, state.m2
        x_next = coeffs.pX * state.x + coeffs.pM1 * m1 + coeffs.pM2 * m2 + coeffs.pM3 * m3
        return DPMState(x=x_next, m1=m1, m2=m2, m3=m3)

    def step(self, state: DPMState, velocity: jnp.ndarray, i: int) -> DPMState:
        c = DPMCoeffs(*[f[i] for f in self.coeffs])
        return self.scan_step(state, c, velocity)
