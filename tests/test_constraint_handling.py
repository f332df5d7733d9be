"""Constraint handling: rank-1 bound projection + truncated moment matching.

Mirrors /root/reference/test/test_constraint_handling.jl (331 LoC):
basic projection cases, Monte-Carlo verification of the truncated
moments (univariate + multivariate conditional structure), extreme/
degenerate cases, integration with a UKF via the post_correct_cb hook,
and numerical stability on near-singular covariances.  Source under
test: ops/constraints.py (kalman.jl:181-358 analogue).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lowlevelparticlefilters_jl_tpu as llpf
from lowlevelparticlefilters_jl_tpu.ops.constraints import (
    project_bound,
    truncated_moment_match,
    truncated_scalar_moments,
)


MU3 = jnp.array([1.0, -2.0, 3.0])
SIG3 = jnp.array([[2.0, 0.5, 0.1],
                  [0.5, 1.0, 0.2],
                  [0.1, 0.2, 0.5]])


def _is_sym(M, tol=1e-6):
    return bool(jnp.max(jnp.abs(M - M.T)) < tol)


def _is_posdef(M):
    return bool(jnp.min(jnp.linalg.eigvalsh(M)) > -1e-9)


class TestProjectBound:
    def test_lower_bound(self):
        """test_constraint_handling.jl:14-29."""
        mu, P = project_bound(MU3, SIG3, 1, lower=0.0)
        assert abs(float(mu[1])) < 1e-6
        assert _is_sym(P) and _is_posdef(P)
        assert float(P[1, 1]) < float(SIG3[1, 1])
        assert float(P[0, 1]) != float(SIG3[0, 1])

    def test_upper_bound(self):
        mu0 = jnp.array([1.0, 5.0, 3.0])
        mu, P = project_bound(mu0, SIG3, 1, upper=2.0)
        assert abs(float(mu[1]) - 2.0) < 1e-6
        assert _is_sym(P) and _is_posdef(P)

    def test_two_sided_projects_to_nearest(self):
        mu, P = project_bound(MU3, SIG3, 1, lower=0.0, upper=1.0)
        assert abs(float(mu[1])) < 1e-6  # -2 is below, nearest bound is 0
        assert _is_sym(P) and _is_posdef(P)

    def test_already_feasible_unchanged(self):
        mu0 = jnp.array([1.0, 0.5, 3.0])
        mu, P = project_bound(mu0, SIG3, 1, lower=0.0, upper=1.0)
        np.testing.assert_allclose(np.asarray(mu), np.asarray(mu0))
        np.testing.assert_allclose(np.asarray(P), np.asarray(SIG3))

    def test_degenerate_zero_variance(self):
        """Zero variance: mean clamps, covariance untouched (jl:72-83)."""
        S = SIG3.at[1, 1].set(0.0)
        mu, P = project_bound(MU3, S, 1, lower=0.0)
        assert abs(float(mu[1])) < 1e-6
        np.testing.assert_allclose(np.asarray(P), np.asarray(S))

    def test_correlation_preservation(self):
        """Positive correlation pulls x[0] up with the projection (jl:85-100)."""
        mu0 = jnp.array([0.0, -3.0])
        S = jnp.array([[1.0, 0.8], [0.8, 1.0]])
        mu, P = project_bound(mu0, S, 1, lower=0.0)
        assert float(mu[0]) > 0.0
        assert abs(float(mu[1])) < 1e-6
        corr = float(P[0, 1] / jnp.sqrt(P[0, 0] * P[1, 1] + 1e-30))
        assert corr < 0.8


class TestTruncatedMomentMatch:
    def test_basic(self):
        """jl:104-121."""
        mu, P = truncated_moment_match(MU3, SIG3, 1, lower=0.0)
        assert float(mu[1]) > 0.0 and float(mu[1]) > float(MU3[1])
        assert _is_sym(P) and _is_posdef(P)
        assert float(P[1, 1]) < float(SIG3[1, 1])

    def test_monte_carlo_univariate(self):
        """Truncated-normal moments vs 1e5 samples (jl:123-142)."""
        m, s, lo, hi = 2.0, 1.5, 0.0, 5.0
        mu, P = truncated_moment_match(
            jnp.array([m]), jnp.array([[s**2]]), 0, lower=lo, upper=hi)
        rng = np.random.default_rng(0)
        samp = rng.normal(m, s, 400000)
        samp = samp[(samp >= lo) & (samp <= hi)]
        assert abs(float(mu[0]) - samp.mean()) < 0.01 * abs(samp.mean())
        assert abs(float(P[0, 0]) - samp.var()) < 0.02 * samp.var()

    def test_monte_carlo_multivariate(self):
        """Conditional structure vs rejection sampling (jl:144-168)."""
        mu0 = np.array([1.0, -1.0])
        S0 = np.array([[2.0, 1.0], [1.0, 1.5]])
        mu, P = truncated_moment_match(jnp.asarray(mu0), jnp.asarray(S0), 1,
                                       lower=0.0)
        rng = np.random.default_rng(1)
        samp = rng.multivariate_normal(mu0, S0, 400000)
        valid = samp[samp[:, 1] >= 0]
        emp_mean = valid.mean(axis=0)
        emp_cov = np.cov(valid.T)
        np.testing.assert_allclose(np.asarray(mu), emp_mean, rtol=0.03)
        np.testing.assert_allclose(np.asarray(P), emp_cov, rtol=0.08)

    def test_one_sided_lower_uncorrelated(self):
        """Uncorrelated components stay untouched (jl:170-188)."""
        mu0 = jnp.array([0.0, -2.0, 1.0])
        S0 = jnp.diag(jnp.array([1.0, 2.0, 0.5]))
        mu, P = truncated_moment_match(mu0, S0, 1, lower=0.0)
        assert float(mu[1]) > 0.0
        assert float(P[1, 1]) < 2.0
        np.testing.assert_allclose(float(mu[0]), 0.0, atol=1e-6)
        np.testing.assert_allclose(float(mu[2]), 1.0, atol=1e-6)
        np.testing.assert_allclose(float(P[0, 0]), 1.0, atol=1e-6)
        np.testing.assert_allclose(float(P[2, 2]), 0.5, atol=1e-6)

    def test_one_sided_upper(self):
        mu0 = jnp.array([0.0, 3.0, 1.0])
        S0 = jnp.diag(jnp.array([1.0, 2.0, 0.5]))
        mu, P = truncated_moment_match(mu0, S0, 1, upper=1.0)
        assert float(mu[1]) < 1.0 and float(mu[1]) < 3.0
        assert float(P[1, 1]) < 2.0

    def test_two_sided_symmetric(self):
        mu0 = jnp.array([0.0, 0.0, 1.0])
        S0 = jnp.diag(jnp.array([1.0, 4.0, 0.5]))
        mu, P = truncated_moment_match(mu0, S0, 1, lower=-1.0, upper=1.0)
        assert -1.0 <= float(mu[1]) <= 1.0
        assert abs(float(mu[1])) < 0.1
        assert float(P[1, 1]) < 4.0

    def test_extreme_truncation_falls_back_to_projection(self):
        """Mass numerically zero -> equality projection at bound (jl:217-229)."""
        mu0 = jnp.zeros(2)
        S0 = jnp.eye(2)
        mu, P = truncated_moment_match(mu0, S0, 1, lower=50.0)
        np.testing.assert_allclose(float(mu[1]), 50.0, atol=1e-5)
        assert float(P[1, 1]) < 1e-6

    def test_correlation_handling(self):
        mu0 = jnp.zeros(2)
        S0 = jnp.array([[1.0, 0.7], [0.7, 1.0]])
        mu, P = truncated_moment_match(mu0, S0, 1, lower=1.0)
        assert float(mu[0]) > 0.0
        assert float(mu[1]) > 1.0
        assert float(P[0, 1]) > 0.0

    def test_scalar_moments_two_sided_vs_onesided_limit(self):
        """[a, +38sigma] two-sided ~= [a, inf) one-sided."""
        m1, s1, ok1 = truncated_scalar_moments(0.5, 1.2, -0.3, jnp.inf)
        m2, s2, ok2 = truncated_scalar_moments(0.5, 1.2, -0.3, 1e6)
        assert bool(ok1) and bool(ok2)
        np.testing.assert_allclose(float(m1), float(m2), rtol=1e-5)
        np.testing.assert_allclose(float(s1), float(s2), rtol=1e-4)


class TestFilterIntegration:
    """Constraint enforcement inside forward_trajectory via the
    post_correct_cb hook (jl:248-314, functional-callback analogue)."""

    def _run(self, constrain):
        A = jnp.array([[0.9, 0.1], [0.0, 0.8]])
        B = jnp.array([[1.0], [0.5]])
        C = jnp.array([[1.0, 0.0]])
        R1 = jnp.diag(jnp.array([0.1, 0.1]))
        R2 = jnp.array([[0.01]])

        def dyn(x, u, p, t):
            return A @ x + B @ u

        def meas(x, u, p, t):
            return C @ x

        ukf = llpf.make_ukf(
            dyn, meas, R1, R2,
            d0=llpf.MvNormal(jnp.array([1.0, 0.5]),
                             jnp.diag(jnp.array([0.1, 0.1]))),
            nu=1, ny=1)
        rng = np.random.default_rng(3)
        T = 50
        u = jnp.asarray(rng.normal(size=(T, 1)))
        y = jnp.asarray(rng.normal(0.0, 0.5, size=(T, 1)))

        def cb(f, state, info, u_t, y_t, p, t):
            x, R = constrain(state.x, state.R)
            return state.replace(x=x, R=R), None

        sol = llpf.forward_trajectory(ukf, u, y, post_correct_cb=cb)
        return sol

    def test_project_bound_callback(self):
        sol = self._run(lambda x, R: project_bound(x, R, 1, lower=0.0))
        xt = np.asarray(sol.xt)
        assert (xt[:, 1] >= -1e-6).all()
        Rlast = np.asarray(sol.Rt[-1])
        assert _is_posdef(jnp.asarray(Rlast))

    def test_tmm_callback(self):
        sol = self._run(lambda x, R: truncated_moment_match(x, R, 1, lower=0.0))
        xt = np.asarray(sol.xt)
        assert (xt[:, 1] >= -1e-6).all()
        Rlast = np.asarray(sol.Rt[-1])
        assert _is_posdef(jnp.asarray(Rlast))


class TestNumericalStability:
    def test_near_singular(self):
        """jl:316-331."""
        mu0 = jnp.array([1.0, -1.0, 0.0])
        S0 = jnp.array([[1e-8, 0.0, 0.0],
                        [0.0, 1.0, 0.99],
                        [0.0, 0.99, 1.0]])
        mu, P = project_bound(mu0, S0, 1, lower=0.0)
        assert np.isfinite(np.asarray(mu)).all()
        assert np.isfinite(np.asarray(P)).all()
        mu, P = truncated_moment_match(mu0, S0, 1, lower=0.0)
        assert np.isfinite(np.asarray(mu)).all()
        assert np.isfinite(np.asarray(P)).all()

    def test_jit_and_grad(self):
        """The selects keep both paths AD-safe (no NaN from inf bounds)."""
        def loss(m):
            mu, P = truncated_moment_match(m, SIG3, 1, lower=0.0)
            return jnp.sum(mu) + jnp.trace(P)

        g = jax.grad(loss)(MU3)
        assert np.isfinite(np.asarray(g)).all()
        v = jax.jit(loss)(MU3)
        assert np.isfinite(float(v))
