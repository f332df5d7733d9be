"""RBPF tests mirroring /root/reference/test/test_rbpf.jl:

- simulate-then-filter roundtrip on the mixed 1D/1D model with An coupling,
- the "everything is linear" and "everything is nonlinear" degenerate
  configurations must reproduce the exact KalmanFilter log-likelihood,
- the augmented-dynamics (AUGD) variant agrees too.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lowlevelparticlefilters_jl_tpu as llpf


class TestRBPFMixed:
    def test_roundtrip(self):
        """1D nonlinear + 1D linear with An coupling (test_rbpf.jl:5-45)."""
        An = jnp.array([[0.5]])
        A = jnp.array([[0.95]])
        C2 = jnp.array([[1.0]])
        B = jnp.zeros((1, 0))
        R1n = jnp.array([[0.01]])
        R1l = jnp.array([[0.01]])
        R2 = jnp.array([[0.1]])
        d0l = llpf.MvNormal(jnp.array([1.0]), jnp.array([[1.0]]))
        d0n = llpf.MvNormal(jnp.array([1.0]), R1n)
        kf = llpf.KalmanFilter(A, B, C2, 0, R1l, R2, d0=d0l, nu=0, ny=1)
        mm = llpf.RBMeasurementModel(measurement=lambda xn, u, p, t: xn, R2=R2, ny=1)
        pf = llpf.RBPF(N=500, kf=kf, dynamics=lambda xn, u, p, t: xn,
                       nl_measurement_model=mm, R1n=R1n, d0n=d0n, An=An, nu=0)
        assert pf.single_riccati  # constant matrices → shared Riccati
        T = 200
        us = jnp.zeros((T, 0))
        keys = jax.random.split(jax.random.PRNGKey(0), 3)
        xs, us_, ys = llpf.simulate(pf, us, keys[0])
        sol = llpf.forward_trajectory(pf, us_, ys, key=keys[1])
        assert np.isfinite(float(sol.ll))
        m = np.einsum("tn,tnd->td", np.asarray(sol.we), np.asarray(sol.x))
        rmse = np.sqrt(np.mean((m - np.asarray(xs)) ** 2))
        # estimates track the simulated state
        prior_rmse = np.sqrt(np.mean(np.asarray(xs) ** 2))
        assert rmse < prior_rmse

    def _linear_system(self):
        A = jnp.array([[1.0, 0.1], [0.0, 1.0]])
        B = jnp.array([[0.0], [1.0]])
        C = jnp.array([[1.0, 0.0]])
        R1 = llpf.double_integrator_covariance(0.1) + 1e-6 * jnp.eye(2)
        R2 = 10.0 * jnp.eye(1)
        d0 = llpf.MvNormal(jnp.zeros(2), 2.0 * jnp.eye(2))
        kf = llpf.KalmanFilter(A, B, C, 0, R1, R2, d0=d0)
        key = jax.random.PRNGKey(42)
        us = jax.random.normal(key, (300, 1))
        xs, _, ys = llpf.simulate(kf, us, jax.random.PRNGKey(43))
        solkf = llpf.forward_trajectory(kf, us, ys)
        return A, B, C, R1, R2, d0, kf, us, ys, solkf

    def test_all_linear_matches_kf(self):
        """g = 0, fake nonlinear state → RBPF ≡ KF (test_rbpf.jl:100-112)."""
        A, B, C, R1, R2, d0, kf, us, ys, solkf = self._linear_system()
        R1n = jnp.array([[1e-12]])
        d0n = llpf.MvNormal(jnp.zeros(1), R1n)
        mm = llpf.RBMeasurementModel(
            measurement=lambda xn, u, p, t: jnp.zeros(1), R2=R2, ny=1
        )
        pf = llpf.RBPF(N=500, kf=kf, dynamics=lambda xn, u, p, t: xn,
                       nl_measurement_model=mm, R1n=R1n, d0n=d0n, An=None, nu=1)
        sol = llpf.forward_trajectory(pf, us, ys, key=jax.random.PRNGKey(1))
        np.testing.assert_allclose(float(sol.ll), float(solkf.ll), rtol=1e-2)

    def test_all_nonlinear_matches_kf(self):
        """Fake linear state, full model in the PF part (test_rbpf.jl:121-141)."""
        A, B, C, R1, R2, d0, kf, us, ys, solkf = self._linear_system()
        kf2 = llpf.KalmanFilter(
            jnp.zeros((1, 1)), jnp.zeros((1, 1)), jnp.zeros((1, 1)), 0,
            jnp.eye(1), R2, d0=llpf.MvNormal(jnp.zeros(1), jnp.array([[0.0]])),
            nu=1, ny=1,
        )
        mm = llpf.RBMeasurementModel(
            measurement=lambda xn, u, p, t: C @ xn, R2=R2, ny=1
        )
        pf2 = llpf.RBPF(N=2000, kf=kf2,
                        dynamics=lambda xn, u, p, t: A @ xn + B @ u,
                        nl_measurement_model=mm, R1n=R1, d0n=d0, An=None, nu=1,
                        resample_threshold=1.0)
        assert pf2.zero_C
        sol = llpf.forward_trajectory(pf2, us, ys, key=jax.random.PRNGKey(2))
        np.testing.assert_allclose(float(sol.ll), float(solkf.ll), rtol=1e-2)

    def test_augmented_dynamics_matches_kf(self):
        """AUGD: noise passed into the dynamics (test_rbpf.jl:152-157)."""
        A, B, C, R1, R2, d0, kf, us, ys, solkf = self._linear_system()
        kf2 = llpf.KalmanFilter(
            jnp.zeros((1, 1)), jnp.zeros((1, 1)), jnp.zeros((1, 1)), 0,
            jnp.eye(1), R2, d0=llpf.MvNormal(jnp.zeros(1), jnp.array([[0.0]])),
            nu=1, ny=1,
        )
        mm = llpf.RBMeasurementModel(
            measurement=lambda xn, u, p, t: C @ xn, R2=R2, ny=1
        )
        pf2 = llpf.RBPF(N=2000, kf=kf2,
                        dynamics=lambda xn, u, p, t, w: A @ xn + B @ u + w,
                        nl_measurement_model=mm, R1n=R1, d0n=d0, An=None, nu=1,
                        augmented_dynamics=True, resample_threshold=1.0)
        sol = llpf.forward_trajectory(pf2, us, ys, key=jax.random.PRNGKey(3))
        np.testing.assert_allclose(float(sol.ll), float(solkf.ll), rtol=1e-2)
