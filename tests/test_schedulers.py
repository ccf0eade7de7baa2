"""Scheduler golden tests.

Each solver is verified against an *independent* float64 numpy oracle that
re-implements the reference's stateful algorithm step by step
(fm_solvers_unipc.py:656-740 / fm_solvers.py:707-790 / flow_match.py:5-104),
so the table-driven lax.scan formulation is proven equivalent to the
reference semantics without importing torch or the reference code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnivideo_tpu.schedulers import (
    FlowDPMSolver,
    FlowMatchScheduler,
    FlowUniPC,
    get_sampling_sigmas,
)


# ---------------------------------------------------------------------------
# numpy oracle: UniPC (stateful, mirrors reference control flow)
# ---------------------------------------------------------------------------


def _lam(s):
    with np.errstate(divide="ignore"):
        return np.log(1.0 - s) - np.log(s)


def _bh(hh, order):
    h_phi_1 = np.expm1(hh)
    B_h = np.expm1(hh)  # bh2
    h_phi_k = h_phi_1 / hh - 1
    b, fact = [], 1.0
    for i in range(1, order + 1):
        b.append(h_phi_k * fact / B_h)
        fact *= i + 1
        h_phi_k = h_phi_k / hh - 1 / fact
    return np.array(b), h_phi_1, B_h


class UniPCOracle:
    def __init__(self, sigmas, solver_order=2):
        self.sig = np.concatenate([sigmas, [0.0]])
        self.order = solver_order
        self.outs = [None] * solver_order
        self.lower_order_nums = 0
        self.last_sample = None
        self.this_order = None
        self.i = 0
        self.S = len(sigmas)

    def step(self, v, x):
        i = self.i
        sig = self.sig
        x0 = x - sig[i] * v
        if i > 0 and self.last_sample is not None:
            order = self.this_order
            lam = _lam(sig)
            h = lam[i] - lam[i - 1]
            alpha_t = 1 - sig[i]
            b, h_phi_1, B_h = _bh(-h, order)
            rks, D1s = [], []
            for k in range(1, order):
                rk = (lam[i - (k + 1)] - lam[i - 1]) / h
                rks.append(rk)
                D1s.append((self.outs[-(k + 1)] - self.outs[-1]) / rk)
            rks.append(1.0)
            rks = np.array(rks)
            if order == 1:
                rhos = np.array([0.5])
            else:
                R = np.stack([rks**p for p in range(order)])
                rhos = np.linalg.solve(R, b)
            corr = sum(r * d for r, d in zip(rhos[:-1], D1s)) if D1s else 0.0
            D1_t = x0 - self.outs[-1]
            x = (
                sig[i] / sig[i - 1] * self.last_sample
                - alpha_t * h_phi_1 * self.outs[-1]
                - alpha_t * B_h * (corr + rhos[-1] * D1_t)
            )
        self.outs = self.outs[1:] + [x0]
        this_order = min(self.order, self.S - i, self.lower_order_nums + 1)
        self.this_order = this_order
        self.last_sample = x
        # predictor
        lam = _lam(sig)
        h = lam[i + 1] - lam[i]
        alpha_t = 1 - sig[i + 1]
        b, h_phi_1, B_h = _bh(-h, this_order)
        rks, D1s = [], []
        for k in range(1, this_order):
            rk = (lam[i - k] - lam[i]) / h
            rks.append(rk)
            D1s.append((self.outs[-(k + 1)] - self.outs[-1]) / rk)
        rks.append(1.0)
        rks = np.array(rks)
        if this_order == 2:
            rhos = np.array([0.5])
        elif this_order > 2:
            R = np.stack([rks**p for p in range(this_order)])
            rhos = np.linalg.solve(R[:-1, :-1], b[:-1])
        else:
            rhos = np.zeros(0)
        pred = sum(r * d for r, d in zip(rhos, D1s)) if D1s else 0.0
        x_next = (
            sig[i + 1] / sig[i] * x - alpha_t * h_phi_1 * self.outs[-1] - alpha_t * B_h * pred
        )
        if self.lower_order_nums < self.order:
            self.lower_order_nums += 1
        self.i += 1
        return x_next


class DPMOracle:
    def __init__(self, sigmas, solver_order=2):
        self.sig = np.concatenate([sigmas, [0.0]])
        self.order = solver_order
        self.outs = [None] * solver_order
        self.lower_order_nums = 0
        self.i = 0
        self.S = len(sigmas)

    def step(self, v, x):
        i, sig = self.i, self.sig
        lam = _lam(sig)
        x0 = x - sig[i] * v
        self.outs = self.outs[1:] + [x0]
        low_final = i == self.S - 1  # final_sigmas_type == 'zero'
        low_second = (i == self.S - 2) and self.S < 15
        alpha_t = 1 - sig[i + 1]
        h = lam[i + 1] - lam[i]
        em1 = np.expm1(-h)
        if self.order == 1 or self.lower_order_nums < 1 or low_final:
            x_next = sig[i + 1] / sig[i] * x - alpha_t * em1 * self.outs[-1]
        elif self.order == 2 or self.lower_order_nums < 2 or low_second:
            r0 = (lam[i] - lam[i - 1]) / h
            m0, m1 = self.outs[-1], self.outs[-2]
            D1 = (m0 - m1) / r0
            x_next = sig[i + 1] / sig[i] * x - alpha_t * em1 * m0 - 0.5 * alpha_t * em1 * D1
        else:
            r0 = (lam[i] - lam[i - 1]) / h
            r1 = (lam[i - 1] - lam[i - 2]) / h
            m0, m1, m2 = self.outs[-1], self.outs[-2], self.outs[-3]
            D1_0, D1_1 = (m0 - m1) / r0, (m1 - m2) / r1
            D1 = D1_0 + r0 / (r0 + r1) * (D1_0 - D1_1)
            D2 = (D1_0 - D1_1) / (r0 + r1)
            x_next = (
                sig[i + 1] / sig[i] * x
                - alpha_t * em1 * m0
                + alpha_t * (em1 / h + 1) * D1
                - alpha_t * ((em1 + h) / h**2 - 0.5) * D2
            )
        if self.lower_order_nums < self.order:
            self.lower_order_nums += 1
        self.i += 1
        return x_next


def _fake_velocity(x, t):
    """Deterministic pseudo-model: smooth function of x and t."""
    return 0.3 * x + np.sin(t / 200.0) - 0.1


@pytest.mark.parametrize("steps,shift", [(10, 5.0), (25, 12.0), (4, 3.0)])
@pytest.mark.parametrize("order", [1, 2, 3])
def test_unipc_matches_oracle(steps, shift, order):
    sched = FlowUniPC.create(steps, shift=shift, solver_order=order)
    oracle = UniPCOracle(sched.sigmas[:-1].copy(), solver_order=order)

    rng = np.random.default_rng(0)
    x_np = rng.standard_normal((4, 6)).astype(np.float64)
    state = sched.init_state(jnp.asarray(x_np, dtype=jnp.float32))

    for i in range(steps):
        t = sched.timesteps[i]
        v_o = _fake_velocity(x_np, t)
        x_np = oracle.step(v_o, x_np)
        v_j = _fake_velocity(np.asarray(state.x, np.float64), t)
        state = sched.step(state, jnp.asarray(v_j, jnp.float32), i)
        np.testing.assert_allclose(
            np.asarray(state.x, np.float64), x_np, rtol=2e-4, atol=2e-4
        )


@pytest.mark.parametrize("steps,shift", [(10, 5.0), (25, 12.0)])
@pytest.mark.parametrize("order", [1, 2, 3])
def test_dpm_matches_oracle(steps, shift, order):
    sigmas = get_sampling_sigmas(steps, shift)
    sched = FlowDPMSolver.create(sigmas=sigmas, solver_order=order)
    oracle = DPMOracle(sigmas.copy(), solver_order=order)

    rng = np.random.default_rng(1)
    x_np = rng.standard_normal((3, 5)).astype(np.float64)
    state = sched.init_state(jnp.asarray(x_np, dtype=jnp.float32))

    for i in range(steps):
        t = sched.timesteps[i]
        v_o = _fake_velocity(x_np, t)
        x_np = oracle.step(v_o, x_np)
        v_j = _fake_velocity(np.asarray(state.x, np.float64), t)
        state = sched.step(state, jnp.asarray(v_j, jnp.float32), i)
        np.testing.assert_allclose(
            np.asarray(state.x, np.float64), x_np, rtol=2e-4, atol=2e-4
        )


def test_unipc_scan_equals_eager():
    """The lax.scan driver and eager stepping produce identical trajectories."""
    steps = 8
    sched = FlowUniPC.create(steps, shift=5.0)
    x0 = jnp.asarray(np.random.default_rng(2).standard_normal((2, 3)), jnp.float32)

    state = sched.init_state(x0)
    for i in range(steps):
        v = 0.3 * state.x + 0.5
        state = sched.step(state, v, i)
    eager_final = state.x

    def body(carry, coeffs):
        v = 0.3 * carry.x + 0.5
        return FlowUniPC.scan_step(carry, coeffs, v), None

    final, _ = jax.lax.scan(body, sched.init_state(x0), sched.coeffs)
    np.testing.assert_allclose(final.x, eager_final, rtol=1e-6)


def test_unipc_terminal_step_returns_x0():
    """With final sigma zero the last predictor returns the x0 prediction."""
    steps = 6
    sched = FlowUniPC.create(steps, shift=3.0)
    assert sched.sigmas[-1] == 0.0
    c = sched.coeffs
    # last predictor: pX=0, pM1=1, others 0
    assert float(c.pX[-1]) == 0.0
    np.testing.assert_allclose(float(c.pM1[-1]), 1.0, rtol=1e-6)
    assert float(c.pM2[-1]) == 0.0


def test_unipc_timesteps_integer_valued():
    sched = FlowUniPC.create(12, shift=5.0)
    assert np.all(sched.timesteps == np.trunc(sched.timesteps))
    assert sched.timesteps[0] <= 999


# ---------------------------------------------------------------------------
# FlowMatchScheduler
# ---------------------------------------------------------------------------


def test_flow_match_schedule_values():
    s = FlowMatchScheduler.create(
        num_inference_steps=100, shift=3.0, extra_one_step=True, is_training=True
    )
    # reference: linspace(sigma_start, sigma_min, n+1)[:-1], shifted
    sig = np.linspace(1.0, 0.003 / 1.002, 101)[:-1]
    sig = 3.0 * sig / (1 + 2.0 * sig)
    np.testing.assert_allclose(np.asarray(s.sigmas), sig, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s.timesteps), sig * 1000, rtol=1e-5)
    assert s.training_weights is not None
    np.testing.assert_allclose(float(jnp.sum(s.training_weights)), 100.0, rtol=1e-4)


def test_flow_match_add_noise_and_target():
    s = FlowMatchScheduler.create(num_inference_steps=100, shift=3.0, is_training=True)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 4)), jnp.float32)
    n = jnp.asarray(rng.standard_normal((2, 4)), jnp.float32)
    t = s.timesteps[jnp.array([5, 50])]
    noisy = s.add_noise(x, n, t)
    sig = np.asarray(s.sigmas)[np.array([5, 50])][:, None]
    np.testing.assert_allclose(
        np.asarray(noisy), (1 - sig) * np.asarray(x) + sig * np.asarray(n), rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(s.training_target(x, n)), np.asarray(n - x))


def test_flow_match_euler_step_recovers_linear_path():
    """For exact velocity v = ε − x0, Euler stepping retraces the path exactly."""
    s = FlowMatchScheduler.create(num_inference_steps=20, shift=1.0, extra_one_step=True)
    rng = np.random.default_rng(4)
    x0 = jnp.asarray(rng.standard_normal((3,)), jnp.float32)
    eps = jnp.asarray(rng.standard_normal((3,)), jnp.float32)
    v = eps - x0
    x = (1 - s.sigmas[0]) * x0 + s.sigmas[0] * eps
    for i in range(20):
        x = s.step(v, s.timesteps[i], x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# EnhancedDDIM / ContinuousODE (reference schedulers/ddim.py, continuous_ode.py)
# ---------------------------------------------------------------------------


def test_ddim_roundtrip_and_final_step():
    from omnivideo_tpu.schedulers import EnhancedDDIMScheduler

    s = EnhancedDDIMScheduler.create(num_inference_steps=10)
    rng = np.random.default_rng(7)
    x0 = jnp.asarray(rng.standard_normal((4,)), jnp.float32)
    eps = jnp.asarray(rng.standard_normal((4,)), jnp.float32)
    t = s.timesteps[3]
    noisy = s.add_noise(x0, eps, t)
    # epsilon prediction: return_to_timestep inverts add_noise
    rec = s.return_to_timestep(t, noisy, x0)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(eps), rtol=1e-4, atol=1e-5)
    # exact-eps DDIM from the last timestep with to_final recovers x0
    out = s.step(eps, t, noisy, to_final=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), rtol=1e-3, atol=1e-4)


def test_ddim_zero_terminal_snr():
    from omnivideo_tpu.schedulers import EnhancedDDIMScheduler

    s = EnhancedDDIMScheduler.create(rescale_zero_terminal_snr=True)
    assert abs(float(s.alphas_cumprod[-1])) < 1e-10


def test_continuous_ode_schedule_and_noise():
    from omnivideo_tpu.schedulers import ContinuousODEScheduler

    s = ContinuousODEScheduler.create(num_inference_steps=20)
    sig = np.asarray(s.sigmas)
    assert sig[0] == pytest.approx(700.0, rel=1e-4)
    assert sig[-1] == pytest.approx(0.002, rel=1e-3)
    np.testing.assert_allclose(np.asarray(s.timesteps), np.log(sig) * 0.25, rtol=1e-5)
    rng = np.random.default_rng(8)
    x0 = jnp.asarray(rng.standard_normal((4,)), jnp.float32)
    eps = jnp.asarray(rng.standard_normal((4,)), jnp.float32)
    t = s.timesteps[5]
    noisy = s.add_noise(x0, eps, t)
    sigma = sig[5]
    np.testing.assert_allclose(
        np.asarray(noisy),
        (np.asarray(x0) + np.asarray(eps) * sigma) / np.sqrt(sigma**2 + 1),
        rtol=1e-4,
    )
