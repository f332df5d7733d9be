"""Numeric-utils layer: integrator covariances, rk4, logsumexp.

Mirrors the inline testsets of /root/reference/test/runtests.jl:29-47
(logsumexp), :182-188 (rk4), :190-243 (n_integrator_covariance[_smooth]
— the reference checks against ControlSystemsBase c2d; here the oracles
are the matrix exponential (exact linear-system flow) and the Van Loan
integral computed with scipy).
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

import lowlevelparticlefilters_jl_tpu as llpf
from lowlevelparticlefilters_jl_tpu.ops.logsumexp import (
    logsumexp_normalize,
    expnormalize,
)


def _chain(n):
    """Continuous n-integrator chain: x_i' = x_{i+1}, x_n' = u."""
    A = np.eye(n, k=1)
    B = np.zeros((n, 1))
    B[-1, 0] = 1.0
    return A, B


class TestIntegratorCovariances:
    @pytest.mark.parametrize("n,s2", [(2, 1.0), (3, 1.0), (4, 2.0)])
    def test_n_integrator_covariance_matches_c2d(self, n, s2):
        """runtests.jl:190-215: R = B_d B_dᵀ with B_d from the exact
        zero-order-hold discretization of the integrator chain."""
        Ts = 0.1
        A, B = _chain(n)
        M = np.zeros((n + 1, n + 1))
        M[:n, :n] = A
        M[:n, n:] = B
        Bd = scipy.linalg.expm(M * Ts)[:n, n:]
        R_expected = s2 * Bd @ Bd.T
        R = np.asarray(llpf.n_integrator_covariance(n, Ts, s2))
        np.testing.assert_allclose(R, R_expected, rtol=1e-6, atol=1e-12)

    @pytest.mark.parametrize("n,s2", [(2, 1.0), (3, 1.0), (4, 2.0)])
    def test_n_integrator_covariance_smooth_matches_van_loan(self, n, s2):
        """runtests.jl:217-243: the continuous-noise covariance
        ∫₀ᵀˢ e^{As} B s2 Bᵀ e^{Aᵀs} ds via the Van Loan trick."""
        Ts = 0.1
        A, B = _chain(n)
        Q = s2 * (B @ B.T)
        VL = np.zeros((2 * n, 2 * n))
        VL[:n, :n] = -A
        VL[:n, n:] = Q
        VL[n:, n:] = A.T
        E = scipy.linalg.expm(VL * Ts)
        Ad = E[n:, n:].T
        R_expected = Ad @ E[:n, n:]
        R = np.asarray(llpf.n_integrator_covariance_smooth(n, Ts, s2))
        np.testing.assert_allclose(R, R_expected, rtol=1e-6, atol=1e-12)

    def test_double_integrator_consistency(self):
        """double_integrator_covariance[_smooth] == the n=2 general form
        (utils.jl:133-184)."""
        Ts, s2 = 0.3, 1.7
        np.testing.assert_allclose(
            np.asarray(llpf.double_integrator_covariance(Ts, s2)),
            np.asarray(llpf.n_integrator_covariance(2, Ts, s2)), rtol=1e-7)
        np.testing.assert_allclose(
            np.asarray(llpf.double_integrator_covariance_smooth(Ts, s2)),
            np.asarray(llpf.n_integrator_covariance_smooth(2, Ts, s2)),
            rtol=1e-7)


class TestRK4:
    def test_linear_system_matches_expm(self):
        """runtests.jl:182-188 spirit: rk4 of a linear system approaches
        the exact matrix-exponential flow at O(Ts^5)."""
        A = np.array([[0.0, 1.0], [-2.0, -0.3]])
        Ts = 0.05
        step = llpf.rk4(lambda x, u, p, t: jnp.asarray(A) @ x, Ts)
        x0 = jnp.array([1.0, -0.5])
        x1 = np.asarray(step(x0, None, None, 0.0))
        x1_exact = scipy.linalg.expm(A * Ts) @ np.asarray(x0)
        np.testing.assert_allclose(x1, x1_exact, rtol=1e-6)

    def test_supersample_improves_accuracy(self):
        A = np.array([[0.0, 1.0], [-25.0, -0.5]])  # stiff-ish
        Ts = 0.2
        x0 = jnp.array([1.0, 0.0])
        x_exact = scipy.linalg.expm(A * Ts) @ np.asarray(x0)
        errs = []
        for ss in (1, 4, 16):
            step = llpf.rk4(lambda x, u, p, t: jnp.asarray(A) @ x, Ts,
                            supersample=ss)
            errs.append(np.linalg.norm(
                np.asarray(step(x0, None, None, 0.0)) - x_exact))
        assert errs[0] > errs[1] > errs[2]

    def test_time_argument_advances_within_substeps(self):
        """The RK4 stages see t, t+h/2, t+h (utils.jl:220-237 contract):
        integrating dx/dt = t over one step gives Ts²/2 exactly (RK4 is
        exact for polynomials up to degree 4)."""
        Ts = 0.4
        step = llpf.rk4(lambda x, u, p, t: jnp.asarray([t]), Ts)
        out = float(step(jnp.zeros(1), None, None, 0.0)[0])
        np.testing.assert_allclose(out, Ts**2 / 2, rtol=1e-7)


class TestLogsumexpWeights:
    def test_normalize_matches_dense(self):
        """runtests.jl:29-47: normalized log/exp weights and the ll
        increment agree with the naive dense computation."""
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.normal(size=500) * 3)
        wn, we, ll = logsumexp_normalize(w)
        dense = np.exp(np.asarray(w))
        np.testing.assert_allclose(np.asarray(we), dense / dense.sum(),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(wn),
                                   np.asarray(w) - np.log(dense.sum()),
                                   rtol=1e-5)
        # ll is the plain logsumexp; the -log(N) accounting lives in the
        # uniform initial weights (filtering.jl:166 + _uniform_weights)
        np.testing.assert_allclose(float(ll), np.log(dense.sum()), rtol=1e-5)

    def test_expnormalize_stability(self):
        w = jnp.array([-1e30, 0.0, 1.0])
        we = np.asarray(expnormalize(w))
        assert np.isfinite(we).all()
        np.testing.assert_allclose(we.sum(), 1.0, rtol=1e-6)
        assert we[0] == 0.0
