"""Tests for EnKF, IMM, and UIKF.

Mirrors the reference suites: test_enkf.jl (EnKF ≈ KF on linear-Gaussian
systems), test_imm.jl (identical filters stay at uniform mode
probabilities; garbage mode is rejected; stationary distribution), and
test_uikf.jl (Darouach-style unknown-input recovery + KF comparison).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lowlevelparticlefilters_jl_tpu as llpf


@pytest.fixture(scope="module")
def linsys():
    A = jnp.array([[0.9, 0.1], [0.0, 0.95]])
    B = jnp.array([[0.0], [1.0]])
    C = jnp.array([[1.0, 0.0]])
    R1 = 0.01 * jnp.eye(2)
    R2 = 0.1 * jnp.eye(1)
    d0 = llpf.MvNormal(jnp.zeros(2), jnp.eye(2))
    return A, B, C, R1, R2, d0


class TestEnKF:
    def test_matches_kf_oracle(self, linsys):
        """EnKF state trajectory ≈ KF on a linear system (test_enkf.jl)."""
        A, B, C, R1, R2, d0 = linsys
        kf = llpf.KalmanFilter(A, B, C, 0, R1, R2, d0=d0)
        enkf = llpf.EnsembleKalmanFilter(
            dynamics=lambda x, u, p, t: A @ x + B @ u,
            measurement=lambda x, u, p, t: C @ x,
            R1=R1, R2=R2, d0=d0, N=2000, nu=1,
        )
        key = jax.random.PRNGKey(0)
        us = 0.5 * jnp.sin(jnp.arange(80))[:, None]
        xs, _, ys = llpf.simulate(kf, us, key)
        sol_kf = llpf.forward_trajectory(kf, us, ys)
        sol_en = enkf.forward_trajectory(us, ys, key=jax.random.PRNGKey(1))
        err_kf = float(jnp.sqrt(jnp.mean((sol_kf.xt - xs) ** 2)))
        err_en = float(jnp.sqrt(jnp.mean((sol_en.xt - xs) ** 2)))
        assert err_en < 1.3 * err_kf
        assert abs(float(sol_en.ll) - float(sol_kf.ll)) < 0.1 * abs(float(sol_kf.ll))

    def test_inflation_increases_spread(self, linsys):
        A, B, C, R1, R2, d0 = linsys
        def mk(infl):
            return llpf.EnsembleKalmanFilter(
                dynamics=lambda x, u, p, t: A @ x,
                measurement=lambda x, u, p, t: C @ x,
                R1=R1, R2=R2, d0=d0, N=500, nu=0, inflation=infl,
            )
        s1 = mk(1.0).init(jax.random.PRNGKey(2))
        s2 = mk(1.2).init(jax.random.PRNGKey(2))
        s1p = mk(1.0).predict(s1)
        s2p = mk(1.2).predict(s2)
        c1 = np.trace(np.asarray(llpf.ensemble_cov(s1p.X)))
        c2 = np.trace(np.asarray(llpf.ensemble_cov(s2p.X)))
        assert c2 > c1

    def test_ensemble_stats(self):
        X = jax.random.normal(jax.random.PRNGKey(0), (5000, 3)) @ jnp.array(
            [[2.0, 0, 0], [0.5, 1.0, 0], [0, 0, 0.1]]
        )
        m = llpf.ensemble_mean(X)
        c = llpf.ensemble_cov(X)
        np.testing.assert_allclose(np.asarray(m), np.mean(np.asarray(X), 0), atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(c), np.cov(np.asarray(X).T), rtol=1e-6, atol=1e-9
        )


class TestIMM:
    def _system(self):
        A = jnp.array([[0.99, 0.1], [0.0, 0.2]])
        B = jnp.array([[-0.74, 1.61], [-1.44, 1.75]])
        C = jnp.eye(2)
        R1 = jnp.eye(2)
        R2 = jnp.eye(2)
        d0 = llpf.MvNormal(jnp.zeros(2), jnp.eye(2))
        return A, B, C, R1, R2, d0

    def test_identical_models_stay_uniform(self):
        """Two identical KFs → μ stays [0.5, 0.5] (test_imm.jl:29-44)."""
        A, B, C, R1, R2, d0 = self._system()
        kf1 = llpf.KalmanFilter(A, B, C, 0, R1, R2, d0=d0)
        kf2 = llpf.KalmanFilter(A, B, C, 0, R1, R2, d0=d0)
        P = jnp.array([[0.5, 0.5], [0.5, 0.5]])
        imm = llpf.IMM([kf1, kf2], P, jnp.array([0.5, 0.5]))
        _, us, ys = llpf.simulate(kf1, jax.random.normal(jax.random.PRNGKey(0), (40, 2)),
                                  jax.random.PRNGKey(1))
        state = imm.init()
        for k in range(10):
            state, info = imm.update(state, us[k], ys[k])
            np.testing.assert_allclose(np.asarray(state.mu), [0.5, 0.5], atol=1e-6)
            # identical models keep identical states
            np.testing.assert_allclose(
                np.asarray(state.states[0].x), np.asarray(state.states[1].x), atol=1e-9
            )

    def test_garbage_mode_rejected(self):
        """Mode with wildly wrong dynamics gets μ→0 (test_imm.jl:48-63)."""
        A, B, C, R1, R2, d0 = self._system()
        kf1 = llpf.KalmanFilter(A, B, C, 0, R1, R2, d0=d0)
        kf2 = llpf.KalmanFilter(1e4 * A, B, C, 0, R1, 100 * R2, d0=d0)
        P = jnp.array([[0.5, 0.5], [0.5, 0.5]])
        imm = llpf.IMM([kf1, kf2], P, jnp.array([0.5, 0.5]))
        _, us, ys = llpf.simulate(kf1, jax.random.normal(jax.random.PRNGKey(2), (40, 2)),
                                  jax.random.PRNGKey(3))
        sol = imm.forward_trajectory(us, ys)
        mus = np.asarray(sol.extra)  # [T, n_modes]
        assert np.all(mus[2:, 0] > 0.95)
        np.testing.assert_allclose(mus.sum(-1), 1.0, atol=1e-6)

    def test_stationary_distribution(self):
        """Asymmetric P drives μ to its stationary distribution
        (test_imm.jl:66-82): for P=[[0.5,0.5],[1,0]] → [2/3, 1/3]."""
        A, B, C, R1, R2, d0 = self._system()
        kf1 = llpf.KalmanFilter(A, B, C, 0, R1, R2, d0=d0)
        kf2 = llpf.KalmanFilter(A, B, C, 0, R1, R2, d0=d0)
        P = jnp.array([[0.5, 0.5], [1.0, 0.0]])
        imm = llpf.IMM([kf1, kf2], P, jnp.array([0.5, 0.5]))
        _, us, ys = llpf.simulate(kf1, jax.random.normal(jax.random.PRNGKey(4), (40, 2)),
                                  jax.random.PRNGKey(5))
        sol = imm.forward_trajectory(us, ys)
        mu_inf = np.linalg.matrix_power(np.asarray(P), 100)[0]
        np.testing.assert_allclose(np.asarray(sol.extra)[-1], mu_inf, atol=1e-3)

    def test_mixed_filter_types(self):
        """IMM over a KF + UKF bank (the reference allows any Kalman-type
        combination, imm.jl:20-23)."""
        A, B, C, R1, R2, d0 = self._system()
        kf = llpf.KalmanFilter(A, B, C, 0, R1, R2, d0=d0)
        ukf = llpf.make_ukf(
            lambda x, u, p, t: A @ x + B @ u,
            lambda x, u, p, t: C @ x,
            R1, R2, d0=d0, nu=2, ny=2,
        )
        P = jnp.array([[0.5, 0.5], [0.5, 0.5]])
        imm = llpf.IMM([kf, ukf], P, jnp.array([0.5, 0.5]))
        _, us, ys = llpf.simulate(kf, jax.random.normal(jax.random.PRNGKey(6), (30, 2)),
                                  jax.random.PRNGKey(7))
        sol = imm.forward_trajectory(us, ys)
        assert np.isfinite(float(sol.ll))
        # KF and UKF agree on linear systems → μ stays ≈ uniform
        np.testing.assert_allclose(np.asarray(sol.extra)[-1], [0.5, 0.5], atol=1e-3)


class TestUIKF:
    def _darouach(self):
        # Darouach et al. (1995) §5 example (test_uikf.jl:8-26)
        A = jnp.array([[0.0, 0.6, 0.075], [0.75, 0.0, 0.0], [0.0, 0.75, 0.0375]])
        B = jnp.array([[1.0], [1.0], [0.0]])
        G = jnp.array([[0.0], [1.0], [1.0]])
        C = jnp.array([[1.0, 1.0, 0.0], [0.0, 1.0, 1.0]])
        R1 = jnp.diag(jnp.array([3.0, 6.0, 9.0]))
        R2 = jnp.diag(jnp.array([12.0, 12.0]))
        d0 = llpf.MvNormal(jnp.zeros(3), 10.0 * jnp.eye(3))
        return A, B, G, C, R1, R2, d0

    def test_recovers_unknown_input(self):
        A, B, G, C, R1, R2, d0 = self._darouach()
        kf = llpf.KalmanFilter(A, B, C, 0, R1, R2, d0=d0)
        uikf = llpf.UIKalmanFilter(kf=kf, G=G)
        T = 400
        key = jax.random.PRNGKey(0)
        d_true = 10.0 * jnp.sign(jnp.sin(2 * jnp.pi * jnp.arange(T) / 50.0))[:, None]
        ks = jax.random.split(key, 2)
        w = jax.random.normal(ks[0], (T, 3)) @ jnp.sqrt(R1)
        v = jax.random.normal(ks[1], (T, 2)) @ jnp.sqrt(R2)
        us = jnp.zeros((T, 1))

        def stepsim(x, inp):
            dk, wk, vk = inp
            y = C @ x + vk
            xn = A @ x + G @ dk + wk
            return xn, (x, y)

        _, (xs, ys) = jax.lax.scan(stepsim, jnp.zeros(3), (d_true, w, v))
        sol = llpf.forward_trajectory(uikf, us, ys)
        d_est = np.asarray(sol.extra)[:, 0]
        # the input estimate d̂(k-1) reconstructs the square wave (skip
        # transients and switch instants)
        d_ref = np.asarray(d_true)[:, 0]
        mask = np.ones(T, bool)
        mask[:5] = False
        sw = np.where(np.diff(d_ref) != 0)[0]
        for s in sw:
            mask[s:s + 3] = False
        corr = np.corrcoef(d_est[mask][1:], d_ref[mask][:-1])[0, 1]
        assert corr > 0.5, corr

    def test_comparable_to_kf_without_input(self):
        """With d ≡ 0, UIKF ≈ KF up to the input-estimation penalty
        (test_uikf.jl:66-75)."""
        A, B, G, C, R1, R2, d0 = self._darouach()
        kf = llpf.KalmanFilter(A, B, C, 0, R1, R2, d0=d0)
        uikf = llpf.UIKalmanFilter(kf=kf, G=G)
        key = jax.random.PRNGKey(1)
        us = jax.random.normal(key, (100, 1))
        xs, _, ys = llpf.simulate(kf, us, jax.random.PRNGKey(2))
        sol_kf = llpf.forward_trajectory(kf, us, ys)
        sol_ui = llpf.forward_trajectory(uikf, us, ys)
        assert abs(float(sol_ui.ll) - float(sol_kf.ll)) < 0.1 * abs(float(sol_kf.ll))
        err_kf = float(jnp.linalg.norm(sol_kf.xt - xs))
        err_ui = float(jnp.linalg.norm(sol_ui.xt - xs))
        assert err_ui < 1.3 * err_kf


class TestIMMGradients:
    def test_sticky_imm_loglik_grad_finite(self):
        """Regression: with a terminal mode (P[1,0]=0) the dying mode's
        mixing weight decays through the denormal range; the interact
        step's mu/cj quotient-rule gradient used to overflow to NaN.
        jax.grad through a sticky IMM must stay finite (and match FD —
        verified in x64 during the fix; here we assert finiteness)."""
        A = jnp.array([[1.0, 0.1], [0.0, 1.0]])
        C = jnp.eye(2)
        d0 = llpf.MvNormal(jnp.zeros(2), jnp.eye(2))
        rng = np.random.default_rng(0)
        ys = jnp.asarray(rng.normal(size=(60, 2)).cumsum(0) * 0.1)
        us = jnp.zeros((60, 0))

        def nll(log_r1):
            R1 = (10.0**log_r1) * jnp.eye(2)
            mk = lambda q: llpf.KalmanFilter(
                A, jnp.zeros((2, 0)), C, 0, q * R1, 0.1 * jnp.eye(2), d0=d0)
            imm = llpf.IMM((mk(1.0), mk(25.0)),
                           jnp.array([[0.995, 0.005], [0.0, 1.0]]),
                           jnp.array([1.0, 0.0]))
            return -llpf.loglik(imm, us, ys)

        v, g = jax.value_and_grad(nll)(jnp.asarray(-1.0))
        assert np.isfinite(float(v))
        assert np.isfinite(float(g)), "sticky-IMM gradient NaN regression"

    def test_imm_constructible_under_jit(self):
        """IMM construction inside a jitted loss (parameter tuning
        rebuilds the filter per call) must not run eager validation."""
        A = jnp.eye(1)
        d0 = llpf.MvNormal(jnp.zeros(1), jnp.eye(1))
        ys = jnp.ones((5, 1))
        us = jnp.zeros((5, 0))

        @jax.jit
        def ll(q):
            mk = lambda s: llpf.KalmanFilter(
                A, jnp.zeros((1, 0)), A, 0, s * q * jnp.eye(1),
                jnp.eye(1), d0=d0)
            imm = llpf.IMM((mk(1.0), mk(4.0)),
                           jnp.array([[0.9, 0.1], [0.1, 0.9]]),
                           jnp.array([0.5, 0.5]))
            return llpf.loglik(imm, us, ys)

        assert np.isfinite(float(ll(jnp.asarray(0.1))))
