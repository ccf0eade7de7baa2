"""Flow-matching UniPC multistep solver, TPU-native formulation.

Semantics match the reference `omnivideo/utils/fm_solvers_unipc.py:21-740`
(FlowUniPCMultistepScheduler with predict_x0=True, solver_type='bh2',
lower_order_final=True, final_sigmas_type='zero', prediction='flow'), but the
solver is *re-derived* as a linear recurrence:

Every UniPC quantity that is a function of the (host-known) sigma schedule —
lambdas, h, the rk ratios, the B(h) series, and the solved rho weights for
both the UniC corrector and UniP predictor — is precomputed on the host in
float64 and folded into per-step scalar coefficient tables. The device-side
step then reduces to two fused linear combinations over at most five tensors:

    x0_i     = x_i − σ_i · v_i                         (flow → x0 conversion)
    x_corr   = cS·x_i + cX·x_{i-1}^c + cM1·m1 + cM2·m2 + cM3·m3 + cT·x0_i
    (m3,m2,m1) ← (m2,m1,x0_i)
    x_{i+1}  = pX·x_corr + pM1·m1 + pM2·m2 + pM3·m3

which runs inside `lax.scan` with the coefficient tables as scan inputs — no
data-dependent control flow, no host sync, no per-step recompiles. The
corrector/predictor order sequence (warmup + lower_order_final) is resolved
statically on the host, exactly mirroring the reference's
`lower_order_nums` / `this_order` bookkeeping (fm_solvers_unipc.py:690-735).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Sequence

import jax.numpy as jnp
import numpy as np


def _lam(sig: np.ndarray) -> np.ndarray:
    """λ(σ) = log α − log σ with α = 1 − σ (flow matching)."""
    with np.errstate(divide="ignore"):
        return np.log(1.0 - sig) - np.log(sig)


def _bh_series(hh: float, order: int, solver_type: str):
    """The b-vector of the B(h) linear system (fm_solvers_unipc.py:434-454)."""
    h_phi_1 = np.expm1(hh)
    if solver_type == "bh1":
        B_h = hh
    elif solver_type == "bh2":
        B_h = np.expm1(hh)
    else:
        raise NotImplementedError(solver_type)
    h_phi_k = h_phi_1 / hh - 1.0
    b = []
    factorial_i = 1.0
    for i in range(1, order + 1):
        b.append(h_phi_k * factorial_i / B_h)
        factorial_i *= i + 1
        h_phi_k = h_phi_k / hh - 1.0 / factorial_i
    return np.asarray(b), h_phi_1, B_h


class UniPCState(NamedTuple):
    """Scan carry for the UniPC recurrence (all float32)."""

    x: jnp.ndarray  # current sample
    m1: jnp.ndarray  # most recent converted model output (x0 pred)
    m2: jnp.ndarray
    m3: jnp.ndarray
    last_x: jnp.ndarray  # sample before the last predictor


class UniPCCoeffs(NamedTuple):
    """Per-step scalars; each field has shape [S] in the stacked table."""

    sigma: jnp.ndarray  # σ_i for the x0 conversion
    timestep: jnp.ndarray  # model-facing integer-valued timestep
    cS: jnp.ndarray  # corrector: weight of the *incoming* sample (1 at i=0)
    cX: jnp.ndarray  # corrector: weight of last_x
    cM1: jnp.ndarray
    cM2: jnp.ndarray
    cM3: jnp.ndarray
    cT: jnp.ndarray  # corrector: weight of x0_i (the "this model output" term)
    pX: jnp.ndarray  # predictor: weight of corrected sample
    pM1: jnp.ndarray
    pM2: jnp.ndarray
    pM3: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class FlowUniPC:
    """Precomputed UniPC schedule + coefficient tables."""

    sigmas: np.ndarray  # [S+1] float64, terminal appended
    timesteps: np.ndarray  # [S] float64 (integer-valued, matches torch int64 cast)
    coeffs: UniPCCoeffs  # stacked jnp tables, each [S]
    num_train_timesteps: int
    solver_order: int

    # ------------------------------------------------------------------
    @staticmethod
    def create(
        num_inference_steps: int,
        shift: float = 1.0,
        num_train_timesteps: int = 1000,
        solver_order: int = 2,
        solver_type: str = "bh2",
        lower_order_final: bool = True,
        disable_corrector: Sequence[int] = (),
        sigmas: Optional[np.ndarray] = None,
    ) -> "FlowUniPC":
        S = num_inference_steps
        N = num_train_timesteps
        if sigmas is None:
            # sigma_max = 1 − 1/N, sigma_min = 0 (fm_solvers_unipc.py:108-133)
            sigma_max = 1.0 - 1.0 / N
            sigma_min = 0.0
            sigmas = np.linspace(sigma_max, sigma_min, S + 1, dtype=np.float64)[:-1]
            sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
        else:
            sigmas = np.asarray(sigmas, dtype=np.float64)
            assert sigmas.shape == (S,)
        timesteps = np.trunc(sigmas * N)  # torch `.to(int64)` truncation
        sig = np.concatenate([sigmas, [0.0]])  # final_sigmas_type == 'zero'
        lam = _lam(sig)

        # --- static order bookkeeping (fm_solvers_unipc.py:713-722) ------
        # this_order at step i = min(solver_order, S - i, i + 1)
        this_order = np.minimum(
            np.minimum(solver_order, S - np.arange(S)), np.arange(S) + 1
        ) if lower_order_final else np.minimum(solver_order, np.arange(S) + 1)
        # corrector at step i uses this_order from step i-1
        use_corr = np.array(
            [i > 0 and (i - 1) not in set(disable_corrector) for i in range(S)]
        )

        cS = np.zeros(S)
        cX = np.zeros(S)
        cM1 = np.zeros(S)
        cM2 = np.zeros(S)
        cM3 = np.zeros(S)
        cT = np.zeros(S)
        pX = np.zeros(S)
        pM1 = np.zeros(S)
        pM2 = np.zeros(S)
        pM3 = np.zeros(S)

        for i in range(S):
            # ---------------- corrector (UniC) at step i ----------------
            if not use_corr[i]:
                cS[i] = 1.0
            else:
                order = int(this_order[i - 1])
                h = lam[i] - lam[i - 1]
                hh = -h  # predict_x0
                alpha_t = 1.0 - sig[i]
                b, h_phi_1, B_h = _bh_series(hh, order, solver_type)
                rks = []
                for k in range(1, order):
                    rks.append((lam[i - (k + 1)] - lam[i - 1]) / h)
                rks.append(1.0)
                rks = np.asarray(rks)
                if order == 1:
                    rhos = np.array([0.5])
                else:
                    R = np.vander(rks, order, increasing=True).T
                    rhos = np.linalg.solve(R, b)
                cX[i] = sig[i] / sig[i - 1]
                cM1[i] = -alpha_t * h_phi_1
                # D1 terms: D1_k = (m_{k+2-th most recent} − m1) / rk
                if order >= 2:
                    cM2[i] += -alpha_t * B_h * rhos[0] / rks[0]
                    cM1[i] += alpha_t * B_h * rhos[0] / rks[0]
                if order >= 3:
                    cM3[i] += -alpha_t * B_h * rhos[1] / rks[1]
                    cM1[i] += alpha_t * B_h * rhos[1] / rks[1]
                # D1_t = x0_i − m1
                cT[i] = -alpha_t * B_h * rhos[-1]
                cM1[i] += alpha_t * B_h * rhos[-1]

            # ---------------- predictor (UniP) at step i -----------------
            order = int(this_order[i])
            h = lam[i + 1] - lam[i]
            hh = -h
            alpha_t = 1.0 - sig[i + 1]
            b, h_phi_1, B_h = _bh_series(hh, order, solver_type)
            rks = []
            for k in range(1, order):
                rks.append((lam[i - k] - lam[i]) / h)
            rks.append(1.0)
            rks = np.asarray(rks)
            if order == 2:
                rhos = np.array([0.5])  # simplified (fm_solvers_unipc.py:459-460)
            elif order > 2:
                R = np.vander(rks, order, increasing=True).T
                rhos = np.linalg.solve(R[:-1, :-1], b[:-1])
            else:
                rhos = np.zeros(0)
            pX[i] = sig[i + 1] / sig[i]
            pM1[i] = -alpha_t * h_phi_1
            if order >= 2:
                pM2[i] += -alpha_t * B_h * rhos[0] / rks[0]
                pM1[i] += alpha_t * B_h * rhos[0] / rks[0]
            if order >= 3:
                pM3[i] += -alpha_t * B_h * rhos[1] / rks[1]
                pM1[i] += alpha_t * B_h * rhos[1] / rks[1]

        f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
        coeffs = UniPCCoeffs(
            sigma=f32(sigmas),
            timestep=f32(timesteps),
            cS=f32(cS),
            cX=f32(cX),
            cM1=f32(cM1),
            cM2=f32(cM2),
            cM3=f32(cM3),
            cT=f32(cT),
            pX=f32(pX),
            pM1=f32(pM1),
            pM2=f32(pM2),
            pM3=f32(pM3),
        )
        return FlowUniPC(
            sigmas=sig,
            timesteps=timesteps,
            coeffs=coeffs,
            num_train_timesteps=N,
            solver_order=solver_order,
        )

    # ------------------------------------------------------------------
    def init_state(self, latents: jnp.ndarray) -> UniPCState:
        x = latents.astype(jnp.float32)
        z = jnp.zeros_like(x)
        return UniPCState(x=x, m1=z, m2=z, m3=z, last_x=z)

    @staticmethod
    def scan_step(
        state: UniPCState, coeffs: UniPCCoeffs, velocity: jnp.ndarray
    ) -> UniPCState:
        """One corrector+predictor update; pure, runs inside lax.scan."""
        v = velocity.astype(jnp.float32)
        x0 = state.x - coeffs.sigma * v
        x_corr = (
            coeffs.cS * state.x
            + coeffs.cX * state.last_x
            + coeffs.cM1 * state.m1
            + coeffs.cM2 * state.m2
            + coeffs.cM3 * state.m3
            + coeffs.cT * x0
        )
        m1, m2, m3 = x0, state.m1, state.m2
        x_next = (
            coeffs.pX * x_corr + coeffs.pM1 * m1 + coeffs.pM2 * m2 + coeffs.pM3 * m3
        )
        return UniPCState(x=x_next, m1=m1, m2=m2, m3=m3, last_x=x_corr)

    def step(self, state: UniPCState, velocity: jnp.ndarray, i: int) -> UniPCState:
        """Eager single step (tests / non-scan drivers)."""
        c = UniPCCoeffs(*[f[i] for f in self.coeffs])
        return self.scan_step(state, c, velocity)
