"""Parameter estimation + constraint handling tests.

Mirrors the reference's test_autotune_covariances.jl (ML/MAP covariance
recovery), runtests.jl:412-468 (loglik curves + metropolis), and
test_constraint_handling.jl:123-168 (Monte-Carlo verification of
truncated moment matching).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

import lowlevelparticlefilters_jl_tpu as llpf


@pytest.fixture(scope="module")
def linsys():
    A = jnp.array([[0.97043, -0.097368], [0.097368, 0.970437]])
    B = jnp.array([[0.1], [0.0]])
    C = jnp.eye(2)
    R1 = 0.05 * jnp.eye(2)
    R2 = 0.2 * jnp.eye(2)
    kf = llpf.KalmanFilter(A, B, C, 0, R1, R2)
    us = 0.5 * jnp.sin(0.3 * jnp.arange(300))[:, None]
    xs, _, ys = llpf.simulate(kf, us, jax.random.PRNGKey(0))
    return kf, us, ys, R1, R2


class TestTriangular:
    def test_roundtrip(self):
        x = jnp.arange(1.0, 7.0)
        T = llpf.triangular(x)
        assert T.shape == (3, 3)
        np.testing.assert_allclose(np.asarray(llpf.invtriangular(T)), np.asarray(x))
        assert np.allclose(np.asarray(T), np.triu(np.asarray(T)))


class TestPredictionErrors:
    def test_loglik_residuals_recover_loglik(self, linsys):
        """‖res‖² == −loglik + T·offset (smoothing.jl:195-207)."""
        kf, us, ys, *_ = linsys
        offset = 5.0
        res = llpf.prediction_errors(kf, us, ys, loglik=True, offset=offset)
        assert res.shape == (ys.shape[0] * (ys.shape[1] + 1),)
        ll = llpf.loglik(kf, us, ys)
        np.testing.assert_allclose(
            float(jnp.sum(res**2)), -float(ll) + ys.shape[0] * offset, rtol=1e-5
        )

    def test_weighted_residuals_recover_sse(self, linsys):
        kf, us, ys, *_ = linsys
        res = llpf.prediction_errors(kf, us, ys, lam=2.0)
        np.testing.assert_allclose(
            float(jnp.sum(res**2)), float(llpf.sse(kf, us, ys, lam=2.0)), rtol=1e-5
        )


class TestAutotune:
    def test_recovers_inflated_covariances(self, linsys):
        """Start from wrong covariances; ML tuning must beat them and
        approach the truth (test_autotune_covariances.jl)."""
        kf, us, ys, R1_true, R2_true = linsys
        kf_bad = llpf.reconstruct_filter(kf, 10 * R1_true, 0.05 * R2_true)
        f_opt, info = llpf.autotune_covariances(
            kf_bad, us, ys, offset=10.0, iters=40
        )
        ll_bad = float(llpf.loglik(kf_bad, us, ys))
        ll_opt = float(llpf.loglik(f_opt, us, ys))
        ll_true = float(llpf.loglik(kf, us, ys))
        assert ll_opt > ll_bad
        assert ll_opt > ll_true - 5.0  # within a few nats of the truth
        # diagonal magnitudes in the right ballpark (×3)
        r2 = np.diag(np.asarray(info["R2"]))
        assert np.all(r2 < 3 * np.diag(np.asarray(R2_true)))
        assert np.all(r2 > np.diag(np.asarray(R2_true)) / 3)

    def test_map_prior_pulls_towards_prior_mean(self, linsys):
        kf, us, ys, R1_true, R2_true = linsys
        kf0 = llpf.reconstruct_filter(kf, R1_true, R2_true)
        _, info_ml = llpf.autotune_covariances(kf0, us[:100], ys[:100],
                                               offset=10.0, iters=15)
        _, info_map = llpf.autotune_covariances(kf0, us[:100], ys[:100],
                                                offset=10.0, iters=15,
                                                v_R1=50.0, v_R2=50.0)
        d_ml = np.linalg.norm(np.asarray(info_ml["R1"]) - np.asarray(R1_true))
        d_map = np.linalg.norm(np.asarray(info_map["R1"]) - np.asarray(R1_true))
        assert d_map <= d_ml + 1e-6


class TestMetropolis:
    def test_kf_posterior_concentrates(self, linsys):
        """PMMH over the R2 scale: posterior mean near the true value
        (runtests.jl:452-468 pattern)."""
        kf, us, ys, R1_true, R2_true = linsys

        def ffp(theta):
            return llpf.reconstruct_filter(kf, R1_true, jnp.exp(theta[0]) * jnp.eye(2))

        prior = llpf.MvNormal(jnp.zeros(1), 4.0 * jnp.eye(1))
        ll = llpf.log_likelihood_fun(ffp, [prior], us, ys)
        theta0 = jnp.array([jnp.log(0.5)])
        thetas, lls = llpf.metropolis(
            ll, 300, theta0, key=jax.random.PRNGKey(0)
        )
        post = np.exp(np.asarray(thetas)[150:, 0])
        assert abs(np.mean(post) - 0.2) < 0.1
        assert np.all(np.isfinite(np.asarray(lls)))

    def test_parallel_chains_shape(self, linsys):
        kf, us, ys, R1_true, R2_true = linsys

        def ffp(theta):
            return llpf.reconstruct_filter(kf, R1_true, jnp.exp(theta[0]) * jnp.eye(2))

        prior = llpf.MvNormal(jnp.zeros(1), 4.0 * jnp.eye(1))
        ll = llpf.log_likelihood_fun(ffp, [prior], us[:50], ys[:50])
        out = llpf.metropolis_parallel(
            10, ll, 30, jnp.array([jnp.log(0.5)]), key=jax.random.PRNGKey(1),
            n_chains=4,
        )
        assert out.shape == ((30 - 10) * 4, 2)


class TestConstraints:
    def test_truncated_scalar_moments_vs_scipy(self):
        """Truncated-normal moments match scipy.stats.truncnorm
        (Monte-Carlo analogue of test_constraint_handling.jl:123-168)."""
        for (m, s, a, b) in [
            (0.0, 1.0, -1.0, 2.0),
            (1.5, 0.5, 1.0, np.inf),
            (-0.3, 2.0, -np.inf, 0.0),
            (0.0, 1.0, 3.0, np.inf),   # deep tail
        ]:
            mp, s2p, ok = llpf.truncated_scalar_moments(m, s, a, b)
            assert bool(ok)
            al, be = (a - m) / s, (b - m) / s
            ref = stats.truncnorm(al, be, loc=m, scale=s)
            np.testing.assert_allclose(float(mp), ref.mean(), rtol=1e-4)
            np.testing.assert_allclose(float(s2p), ref.var(), rtol=1e-3, atol=1e-8)

    def test_moment_match_montecarlo(self):
        """Moment-matched joint Gaussian ≈ empirical moments of truncated
        samples (test_constraint_handling.jl:123-168)."""
        key = jax.random.PRNGKey(0)
        mu = jnp.array([0.5, -0.2])
        Sig = jnp.array([[1.0, 0.6], [0.6, 1.5]])
        lower, upper = 0.0, 1.2
        x_mm, S_mm = llpf.truncated_moment_match(mu, Sig, 0, lower=lower, upper=upper)
        L = np.linalg.cholesky(np.asarray(Sig))
        z = np.asarray(jax.random.normal(key, (400_000, 2)))
        samp = np.asarray(mu) + z @ L.T
        keep = (samp[:, 0] >= lower) & (samp[:, 0] <= upper)
        emp_m = samp[keep].mean(0)
        emp_S = np.cov(samp[keep].T)
        np.testing.assert_allclose(np.asarray(x_mm), emp_m, atol=5e-3)
        np.testing.assert_allclose(np.asarray(S_mm), emp_S, atol=1e-2)

    def test_project_bound(self):
        mu = jnp.array([-0.5, 1.0])
        Sig = jnp.array([[1.0, 0.3], [0.3, 2.0]])
        x, S = llpf.project_bound(mu, Sig, 0, lower=0.0)
        assert float(x[0]) == pytest.approx(0.0, abs=1e-9)
        # conditional update shifts the correlated coordinate
        assert float(x[1]) != pytest.approx(1.0)
        # feasible state untouched
        x2, S2 = llpf.project_bound(jnp.array([0.5, 1.0]), Sig, 0, lower=0.0)
        np.testing.assert_allclose(np.asarray(x2), [0.5, 1.0])
        np.testing.assert_allclose(np.asarray(S2), np.asarray(Sig))

    def test_inside_scan_and_grad(self):
        """Constraint ops compose with scan bodies and jax.grad (the whole
        point of the branchless design)."""
        mu = jnp.array([-0.5, 1.0])
        Sig = jnp.array([[1.0, 0.3], [0.3, 2.0]])

        def loss(mu0):
            x, S = llpf.truncated_moment_match(mu0, Sig, 0, lower=0.0)
            return jnp.sum(x**2) + jnp.trace(S)

        g = jax.grad(loss)(mu)
        assert np.all(np.isfinite(np.asarray(g)))


class TestAutotuneMatrix:
    """The reference's full MLE/MAP case matrix
    (test_autotune_covariances.jl:37-350): per-filter-type tuning with
    diagonal and full (Cholesky) parametrizations, x0 optimization, and
    Inverse-Wishart priors."""

    A = jnp.array([[0.97043, -0.097368], [0.097368, 0.970437]])
    B = jnp.array([[0.1], [0.0]])
    C = jnp.eye(2)
    d0 = staticmethod(lambda: llpf.MvNormal(jnp.zeros(2), 0.5 * jnp.eye(2)))

    def _data(self, linsys, T=100, seed=0):
        kf_true, us_all, ys_all, R1, R2 = linsys
        xs = None
        us, ys = us_all[:T], ys_all[:T]
        xs, _, ys = llpf.simulate(kf_true, us, jax.random.PRNGKey(seed))
        return kf_true, xs, us, ys, R1, R2

    def _detuned_kf(self, linsys, scale1=5.0, scale2=0.2):
        _, _, _, R1, R2 = linsys
        return llpf.KalmanFilter(self.A, self.B, self.C, 0, scale1 * R1,
                                 scale2 * R2, d0=self.d0())

    def test_kf_full_parametrization_psd(self, linsys):
        """Full (triangular) parametrization improves ll and returns PSD
        covariances (test_autotune_covariances.jl:66-94)."""
        kf_true, xs, us, ys, R1, R2 = self._data(linsys)
        kf0 = self._detuned_kf(linsys)
        ll0 = float(llpf.loglik(kf0, us, ys))
        f_opt, info = llpf.autotune_covariances(
            kf0, us, ys, diagonal=False, iters=25
        )
        ll1 = float(llpf.loglik(f_opt, us, ys))
        assert ll1 > ll0
        for R in (info["R1"], info["R2"]):
            evals = np.linalg.eigvalsh(np.asarray(R))
            assert evals.min() > 0

    def test_kf_optimize_x0(self, linsys):
        """optimize_x0=true moves x0 toward the true initial state
        (test_autotune_covariances.jl:97-124)."""
        A, B, C = self.A, self.B, self.C
        kf_true, xs, us, ys, R1, R2 = self._data(linsys)
        x_true0 = np.asarray(xs[0])
        d0_wrong = llpf.MvNormal(jnp.asarray([3.0, -3.0]), jnp.eye(2))
        kf0 = llpf.KalmanFilter(A, B, C, 0, 5 * R1, R2, d0=d0_wrong)
        ll0 = float(llpf.loglik(kf0, us, ys))
        f_opt, info = llpf.autotune_covariances(
            kf0, us, ys, optimize_x0=True, iters=25
        )
        assert float(llpf.loglik(f_opt, us, ys)) > ll0
        assert info["x0"].shape == (2,)
        assert (np.linalg.norm(np.asarray(info["x0"]) - x_true0)
                < np.linalg.norm(np.asarray(d0_wrong.mean) - x_true0))

    def test_ekf_diagonal(self, linsys):
        """EKF tuning (test_autotune_covariances.jl:127-152)."""
        A, B, C, d0 = self.A, self.B, self.C, self.d0()
        kf_true, xs, us, ys, R1, R2 = self._data(linsys)
        ekf0 = llpf.make_ekf(
            lambda x, u, p, t: A @ x + B @ u,
            lambda x, u, p, t: C @ x,
            5 * R1, 0.2 * R2, d0=d0, nu=B.shape[1], ny=C.shape[0],
        )
        ll0 = float(llpf.loglik(ekf0, us, ys))
        f_opt, info = llpf.autotune_covariances(ekf0, us, ys, iters=20)
        assert float(llpf.loglik(f_opt, us, ys)) > ll0
        assert isinstance(f_opt, llpf.ExtendedKalmanFilter)

    def test_ukf_diagonal(self, linsys):
        """UKF tuning (test_autotune_covariances.jl:155-181)."""
        A, B, C, d0 = self.A, self.B, self.C, self.d0()
        kf_true, xs, us, ys, R1, R2 = self._data(linsys)
        ukf0 = llpf.make_ukf(
            lambda x, u, p, t: A @ x + B @ u,
            lambda x, u, p, t: C @ x,
            5 * R1, 0.2 * R2, d0=d0, nu=B.shape[1], ny=C.shape[0],
        )
        ll0 = float(llpf.loglik(ukf0, us, ys))
        f_opt, info = llpf.autotune_covariances(ukf0, us, ys, iters=20)
        assert float(llpf.loglik(f_opt, us, ys)) > ll0
        assert isinstance(f_opt, llpf.UnscentedKalmanFilter)

    def test_ukf_augmented_dynamics(self, linsys):
        """AUGD=true (test_autotune_covariances.jl:184-213)."""
        A, B, C, d0 = self.A, self.B, self.C, self.d0()
        kf_true, xs, us, ys, R1, R2 = self._data(linsys)
        ukf0 = llpf.make_ukf(
            lambda x, u, p, t, w: A @ x + B @ u + w,
            lambda x, u, p, t: C @ x,
            5 * R1, 0.2 * R2, d0=d0, nu=B.shape[1], ny=C.shape[0],
            augmented_dynamics=True,
        )
        ll0 = float(llpf.loglik(ukf0, us, ys))
        f_opt, info = llpf.autotune_covariances(ukf0, us, ys, iters=20)
        assert float(llpf.loglik(f_opt, us, ys)) > ll0

    def test_ukf_augmented_measurement(self, linsys):
        """AUGM=true (test_autotune_covariances.jl:216-245)."""
        A, B, C, d0 = self.A, self.B, self.C, self.d0()
        kf_true, xs, us, ys, R1, R2 = self._data(linsys)
        ukf0 = llpf.make_ukf(
            lambda x, u, p, t: A @ x + B @ u,
            lambda x, u, p, t, e: C @ x + e,
            5 * R1, 0.2 * R2, d0=d0, nu=B.shape[1], ny=C.shape[0],
            augmented_measurement=True,
        )
        ll0 = float(llpf.loglik(ukf0, us, ys))
        f_opt, info = llpf.autotune_covariances(ukf0, us, ys, iters=20)
        assert float(llpf.loglik(f_opt, us, ys)) > ll0

    def test_x0_at_least_as_good_as_diag(self, linsys):
        """diag+x0 ≥ diag (test_autotune_covariances.jl:248-293)."""
        kf_true, xs, us, ys, R1, R2 = self._data(linsys)
        kf0 = self._detuned_kf(linsys)
        _, info_d = llpf.autotune_covariances(kf0, us, ys, iters=25)
        _, info_dx = llpf.autotune_covariances(kf0, us, ys, optimize_x0=True, iters=25)
        assert info_dx["neg_loglik"] <= info_d["neg_loglik"] + 1e-3

    def test_map_strong_prior_stays_closer(self, linsys):
        """Strong IW prior keeps R1 nearer the prior mean than MLE does
        (test_autotune_covariances.jl:296-351)."""
        kf_true, xs, us, ys, R1, R2 = self._data(linsys)
        kf0 = self._detuned_kf(linsys)
        R1_init = np.diag(np.asarray(kf0.R1))
        _, info_mle = llpf.autotune_covariances(kf0, us, ys, iters=25)
        _, info_weak = llpf.autotune_covariances(kf0, us, ys, v_R1=4.0, iters=25)
        _, info_strong = llpf.autotune_covariances(kf0, us, ys, v_R1=2000.0, iters=25)
        d = lambda info: np.linalg.norm(np.diag(np.asarray(info["R1"])) - R1_init)
        # weak prior ≈ MLE; strong prior pinned near the prior mean
        assert d(info_weak) < d(info_mle) + 0.5
        assert d(info_strong) < d(info_mle)

    def test_invalid_prior_dof_raises(self, linsys):
        kf0 = self._detuned_kf(linsys)
        kf_true, xs, us, ys, R1, R2 = self._data(linsys)
        with pytest.raises(ValueError, match="v_R1"):
            llpf.autotune_covariances(kf0, us, ys, v_R1=0.5)
