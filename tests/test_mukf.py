"""MUKF tests mirroring /root/reference/test/test_mukf.jl:

- linear-system oracle: MUKF with an artificial nonlinear/linear split
  must match the full KalmanFilter exactly (test_mukf.jl:274-360),
- nonlinear tutorial system roundtrip sanity (test_mukf.jl:7-70),
- arbitrary state ordering via n_inds/l_inds.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lowlevelparticlefilters_jl_tpu as llpf


class TestMUKFLinearOracle:
    def _build(self):
        # x1' = 0.9 x1 + 0.2 x2 + w1 ; x2' = 0.95 x2 + w2
        # y1 = x1 + v1 ; y2 = 0.5 x2 + v2      (test_mukf.jl:282-330)
        fn = lambda xn, u, p, t: jnp.array([0.9 * xn[0], 0.0])
        A = jnp.array([[0.2], [0.95]])   # [An; Al]
        g = lambda xn, u, p, t: jnp.array([xn[0], 0.0])
        Cl = jnp.array([[0.0], [0.5]])
        R1 = jnp.diag(jnp.array([0.01, 0.01]))
        R2 = 0.1 * jnp.eye(2)
        d0 = llpf.MvNormal(jnp.array([0.5, 0.3]), jnp.diag(jnp.array([0.1, 0.1])))
        mm = llpf.RBMeasurementModel(measurement=g, R2=R2, ny=2)
        mukf = llpf.MUKF(dynamics=fn, nl_measurement_model=mm, A=A, Cl=Cl,
                         R1=R1, d0=d0, nxn=1, nu=0, ny=2)
        A_full = jnp.array([[0.9, 0.2], [0.0, 0.95]])
        C_full = jnp.array([[1.0, 0.0], [0.0, 0.5]])
        kf = llpf.KalmanFilter(A_full, jnp.zeros((2, 0)), C_full, 0, R1, R2,
                               d0=d0, nu=0, ny=2)
        return mukf, kf

    def test_matches_kf(self):
        mukf, kf = self._build()
        us = jnp.zeros((100, 0))
        xs, _, ys = llpf.simulate(kf, us, jax.random.PRNGKey(0))
        sol_kf = llpf.forward_trajectory(kf, us, ys)
        sol_mu = llpf.forward_trajectory(mukf, us, ys)
        np.testing.assert_allclose(float(sol_mu.ll), float(sol_kf.ll), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(sol_mu.xt), np.asarray(sol_kf.xt), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(sol_mu.Rt), np.asarray(sol_kf.Rt), atol=1e-6
        )

    def test_reordered_state_matches(self):
        """n_inds/l_inds swapped ordering gives the same estimates
        (mukf.jl arbitrary state ordering, :129-130)."""
        mukf, kf = self._build()
        # put the linear state FIRST in the full state vector
        fn2 = lambda xn, u, p, t: jnp.array([0.0, 0.9 * xn[0]])
        A2 = jnp.array([[0.95], [0.2]])  # rows in full-state order [l; n]
        g2 = lambda xn, u, p, t: jnp.array([xn[0], 0.0])
        d0_2 = llpf.MvNormal(jnp.array([0.3, 0.5]), jnp.diag(jnp.array([0.1, 0.1])))
        mm2 = llpf.RBMeasurementModel(
            measurement=g2, R2=0.1 * jnp.eye(2), ny=2
        )
        mukf2 = llpf.MUKF(dynamics=fn2, nl_measurement_model=mm2, A=A2,
                          Cl=jnp.array([[0.0], [0.5]]),
                          R1=jnp.diag(jnp.array([0.01, 0.01])), d0=d0_2,
                          nxn=1, nu=0, ny=2, n_inds=(1,), l_inds=(0,))
        us = jnp.zeros((60, 0))
        xs, _, ys = llpf.simulate(kf, us, jax.random.PRNGKey(1))
        sol1 = llpf.forward_trajectory(mukf, us, ys)
        sol2 = llpf.forward_trajectory(mukf2, us, ys)
        np.testing.assert_allclose(float(sol2.ll), float(sol1.ll), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(sol2.xt)[:, ::-1], np.asarray(sol1.xt), atol=1e-6
        )


class TestMUKFNonlinear:
    def test_tutorial_system_roundtrip(self):
        """atan-dynamics RBPF tutorial system (test_mukf.jl:7-70)."""
        nxn, nxl, ny = 1, 3, 2
        fn = lambda xn, u, p, t: jnp.concatenate(
            [jnp.arctan(xn), jnp.zeros(nxl)]
        )
        g = lambda xn, u, p, t: jnp.array([0.1 * xn[0] ** 2 * jnp.sign(xn[0]), 0.0])
        An = jnp.array([[1.0, 0.0, 0.0]])
        Al = jnp.array([[1.0, 0.3, 0.0], [0.0, 0.92, -0.3], [0.0, 0.3, 0.92]])
        A = jnp.concatenate([An, Al], axis=0)
        Cl = jnp.array([[0.0, 0.0, 0.0], [1.0, -1.0, 1.0]])
        R1 = jnp.diag(jnp.array([0.01, 0.01, 0.01, 0.01]))
        R2 = 0.1 * jnp.eye(ny)
        d0 = llpf.MvNormal(
            jnp.zeros(4), jnp.diag(jnp.array([1.0, 0.01, 0.01, 0.01]))
        )
        mm = llpf.RBMeasurementModel(measurement=g, R2=R2, ny=ny)
        mukf = llpf.MUKF(dynamics=fn, nl_measurement_model=mm, A=A, Cl=Cl,
                         R1=R1, d0=d0, nxn=nxn, nu=0, ny=ny)
        T = 150
        us = jnp.zeros((T, 0))
        xs, _, ys = llpf.simulate(mukf, us, jax.random.PRNGKey(2))
        sol = llpf.forward_trajectory(mukf, us, ys)
        assert np.isfinite(float(sol.ll))
        rmse = float(jnp.sqrt(jnp.mean((sol.xt[:, 0] - xs[:, 0]) ** 2)))
        assert rmse < 3.0
        # covariance stays PSD along the trajectory
        eigs = np.linalg.eigvalsh(np.asarray(sol.Rt))
        assert eigs.min() > -1e-8

    def test_mukf_vs_rbpf(self):
        """MUKF and a large-N RBPF agree on the nonlinear-state estimate
        (cross-estimator consistency).  The measurement of xn is linear so
        the posterior stays unimodal — with the tutorial's xn²·sign(xn)
        output the posterior is multimodal and the Gaussian MUKF and the
        particle RBPF legitimately diverge (the reference only asserts a
        loose rmse<3 there, test_mukf.jl:63)."""
        fn_rb = lambda xn, u, p, t: jnp.arctan(xn)
        fn_mu = lambda xn, u, p, t: jnp.concatenate([jnp.arctan(xn), jnp.zeros(3)])
        g = lambda xn, u, p, t: jnp.array([xn[0], 0.0])
        An = jnp.array([[1.0, 0.0, 0.0]])
        Al = jnp.array([[1.0, 0.3, 0.0], [0.0, 0.92, -0.3], [0.0, 0.3, 0.92]])
        Cl = jnp.array([[0.0, 0.0, 0.0], [1.0, -1.0, 1.0]])
        R1n = jnp.array([[0.01]])
        R1l = 0.01 * jnp.eye(3)
        R2 = 0.1 * jnp.eye(2)
        d0n = llpf.MvNormal(jnp.zeros(1), jnp.eye(1))
        d0l = llpf.MvNormal(jnp.zeros(3), 0.01 * jnp.eye(3))
        kf_lin = llpf.KalmanFilter(Al, jnp.zeros((3, 0)), Cl, 0, R1l, R2,
                                   d0=d0l, nu=0, ny=2)
        mm = llpf.RBMeasurementModel(measurement=g, R2=R2, ny=2)
        rbpf = llpf.RBPF(N=2000, kf=kf_lin, dynamics=fn_rb,
                         nl_measurement_model=mm, R1n=R1n, d0n=d0n, An=An,
                         nu=0, resample_threshold=1.0)
        d0 = llpf.MvNormal(jnp.zeros(4), jnp.diag(jnp.array([1.0, .01, .01, .01])))
        R1f = jnp.block([[R1n, jnp.zeros((1, 3))], [jnp.zeros((3, 1)), R1l]])
        mukf = llpf.MUKF(dynamics=fn_mu, nl_measurement_model=mm,
                         A=jnp.concatenate([An, Al]), Cl=Cl, R1=R1f, d0=d0,
                         nxn=1, nu=0, ny=2)
        T = 100
        us = jnp.zeros((T, 0))
        xs, _, ys = llpf.simulate(rbpf, us, jax.random.PRNGKey(3))
        sol_mu = llpf.forward_trajectory(mukf, us, ys)
        sol_rb = llpf.forward_trajectory(rbpf, us, ys, key=jax.random.PRNGKey(4))
        m_rb = np.einsum("tn,tnd->td", np.asarray(sol_rb.we), np.asarray(sol_rb.x))
        # nonlinear-substate estimates agree to Monte-Carlo tolerance
        diff = np.sqrt(np.mean((np.asarray(sol_mu.xt)[:, 0] - m_rb[:, 0]) ** 2))
        assert diff < 0.3, diff
