"""Large-system cross-filter equivalence + compile-stability tests.

Mirrors /root/reference/test/test_large.jl: on a random stable 100-state
linear-Gaussian system every Kalman-family variant must produce the same
log-likelihood (:78) and all smoothers the same trajectories (:133-147);
sensor fusion runs any filter against any measurement model (:149-167).
The reference's allocation ceilings (:38-121) become jit-cache stability
checks: repeated calls with fresh data must not retrace or recompile.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lowlevelparticlefilters_jl_tpu as llpf


@pytest.fixture(scope="module")
def big_system():
    nx, nu, ny = 100, 2, 90
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    A = jax.random.normal(k1, (nx, nx)) / jnp.sqrt(nx)
    A = 0.7 * A / jnp.max(jnp.abs(jnp.linalg.eigvals(A))).real
    B = jax.random.normal(k2, (nx, nu)) / 10
    C = jax.random.normal(k3, (ny, nx)) / jnp.sqrt(nx)
    R1 = 0.1 * jnp.eye(nx)
    R2 = 0.5 * jnp.eye(ny)
    d0 = llpf.MvNormal(jnp.zeros(nx), jnp.eye(nx))
    kf = llpf.KalmanFilter(A, B, C, 0, R1, R2, d0=d0)
    us = jax.random.normal(k4, (50, nu))
    xs, us, ys = llpf.simulate(kf, us, jax.random.PRNGKey(1))
    return A, B, C, R1, R2, d0, kf, us, ys


class TestCrossFilterEquivalence:
    def test_all_kalman_variants_same_loglik(self, big_system):
        """KF ≡ SqKF ≡ EKF ≡ UKF ≡ IEKF on a 100-state linear system
        (test_large.jl:78)."""
        A, B, C, R1, R2, d0, kf, us, ys = big_system
        dyn = lambda x, u, p, t: A @ x + B @ u
        meas = lambda x, u, p, t: C @ x
        nu, ny = B.shape[1], C.shape[0]
        filters = {
            "kf": kf,
            "sqkf": llpf.SqKalmanFilter(A, B, C, 0, R1, R2, d0=d0),
            "ekf": llpf.make_ekf(dyn, meas, R1, R2, d0=d0, nu=nu, ny=ny),
            "iekf": llpf.make_iekf(dyn, meas, R1, R2, d0=d0, nu=nu, ny=ny),
            "ukf": llpf.make_ukf(dyn, meas, R1, R2, d0=d0, nu=nu, ny=ny),
        }
        lls = {k: float(llpf.loglik(f, us, ys)) for k, f in filters.items()}
        base = lls["kf"]
        for k, v in lls.items():
            np.testing.assert_allclose(v, base, rtol=1e-4, err_msg=k)

    def test_all_smoothers_agree(self, big_system):
        """RTS ≡ MBF ≡ unscented RTS ≡ EKF smoother (test_large.jl:133-147)."""
        A, B, C, R1, R2, d0, kf, us, ys = big_system
        dyn = lambda x, u, p, t: A @ x + B @ u
        meas = lambda x, u, p, t: C @ x
        nu, ny = B.shape[1], C.shape[0]
        ss_rts = llpf.smooth(kf, us, ys)
        sol = llpf.forward_trajectory(kf, us, ys)
        ss_mbf, *_ = llpf.smooth_mbf(sol, kf)
        ekf = llpf.make_ekf(dyn, meas, R1, R2, d0=d0, nu=nu, ny=ny)
        ss_ekf = llpf.smooth(ekf, us, ys)
        ukf = llpf.make_ukf(dyn, meas, R1, R2, d0=d0, nu=nu, ny=ny)
        ss_ukf = llpf.smooth(ukf, us, ys)
        ref = np.asarray(ss_rts.xT)
        for name, ss in [("mbf", ss_mbf), ("ekf", ss_ekf), ("ukf", ss_ukf)]:
            np.testing.assert_allclose(
                np.asarray(ss.xT), ref, atol=2e-3, err_msg=name
            )


class TestSensorFusion:
    def test_any_filter_any_measurement_model(self, big_system):
        """Mixed-model correction: a UKF corrects with a linear model and
        an EKF model, fused via CompositeMeasurementModel
        (test_large.jl:149-167)."""
        A, B, C, R1, R2, d0, kf, us, ys = big_system
        ny = C.shape[0]
        ny1 = ny // 2
        C1, C2 = C[:ny1], C[ny1:]
        R21, R22 = R2[:ny1, :ny1], R2[ny1:, ny1:]
        mm_lin = llpf.LinearMeasurementModel(C=C1, R2=R21, ny=ny1)
        mm_ekf = llpf.EKFMeasurementModel(
            measurement=lambda x, u, p, t: C2 @ x, R2=R22, ny=ny - ny1
        )
        comp = llpf.CompositeMeasurementModel(models=(mm_lin, mm_ekf))
        ukf = llpf.make_ukf(
            lambda x, u, p, t: A @ x + B @ u, comp, R1, None,
            d0=d0, nu=B.shape[1], ny=ny,
        )
        sol = llpf.forward_trajectory(ukf, us, ys)
        sol_kf = llpf.forward_trajectory(kf, us, ys)
        # fused sequential corrections ≈ joint correction (block-diag R2)
        np.testing.assert_allclose(
            np.asarray(sol.xt), np.asarray(sol_kf.xt), atol=1e-4
        )


class TestCompileStability:
    """The reference asserts allocation-free stepping (test_jet.jl:51-94);
    the XLA analogue: the jitted trajectory pass compiles once and is
    reused for new data — no retraces, no recompiles."""

    def test_no_retrace_on_new_data(self):
        A = jnp.array([[0.9, 0.1], [0.0, 0.95]])
        kf = llpf.KalmanFilter(A, jnp.zeros((2, 1)), jnp.eye(2), 0,
                               0.01 * jnp.eye(2), 0.1 * jnp.eye(2))
        fn = jax.jit(lambda u, y: llpf.forward_trajectory(kf, u, y).ll)
        us = jnp.zeros((30, 1))
        for seed in range(3):
            ys = jax.random.normal(jax.random.PRNGKey(seed), (30, 2))
            fn(us, ys)
        assert fn._cache_size() == 1

    def test_filter_pytree_swap_no_retrace(self):
        """Different filter *parameters* (same structure) reuse the
        compilation when the filter is an argument."""
        A = jnp.array([[0.9, 0.1], [0.0, 0.95]])

        def mk(q):
            return llpf.KalmanFilter(A, jnp.zeros((2, 1)), jnp.eye(2), 0,
                                     q * jnp.eye(2), 0.1 * jnp.eye(2))

        fn = jax.jit(lambda f, u, y: llpf.loglik(f, u, y))
        us = jnp.zeros((20, 1))
        ys = jax.random.normal(jax.random.PRNGKey(0), (20, 2))
        for q in (0.01, 0.02, 0.5):
            fn(mk(q), us, ys)
        assert fn._cache_size() == 1
