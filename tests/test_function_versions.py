"""All-callable system matrices across KF/EKF/UKF + None-matrix support.

Mirrors /root/reference/test/test_function_versions.jl: every matrix
supplied as a function ``(x,u,p,t)->M`` gives identical trajectories
across the three filters on a linear system, d0 cannot be defaulted from
a callable R1, and None matrices (no input / no feedthrough) work.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lowlevelparticlefilters_jl_tpu as llpf
from lowlevelparticlefilters_jl_tpu.ops.discretize import double_integrator_covariance

NX, NU, NY = 2, 1, 1
A = jnp.array([[1.0, 0.1], [0.0, 1.0]])
B = jnp.array([[0.0], [1.0]])
C = jnp.array([[1.0, 0.0]])
R1 = double_integrator_covariance(0.1) + 1e-6 * jnp.eye(NX)
R2 = 1e-3 * jnp.eye(NY)


def fw(m):
    return lambda x, u, p, t: m


def dyn(x, u, p, t):
    return A @ x + B @ u


def meas(x, u, p, t):
    return C @ x


d0 = lambda: llpf.MvNormal(jnp.asarray([0.3, -0.2]), 2.0 * jnp.eye(NX))


class TestFunctionMatrices:
    def test_kf_ekf_ukf_identical_with_callable_matrices(self):
        """test_function_versions.jl:29-44."""
        kf = llpf.KalmanFilter(fw(A), fw(B), fw(C), 0, fw(R1), fw(R2),
                               d0=d0(), nx=NX, nu=NU, ny=NY)
        ekf = llpf.make_ekf(dyn, meas, fw(R1), fw(R2), d0=d0(), nu=NU, ny=NY)
        ukf = llpf.make_ukf(dyn, meas, fw(R1), fw(R2), d0=d0(), nu=NU, ny=NY)
        du = llpf.MvNormal(jnp.zeros(NU), jnp.eye(NU))
        x, u, y = llpf.simulate(kf, 200, jax.random.PRNGKey(0), du=du)
        solkf = llpf.forward_trajectory(kf, u, y)
        solekf = llpf.forward_trajectory(ekf, u, y)
        solukf = llpf.forward_trajectory(ukf, u, y)
        np.testing.assert_allclose(solkf.x, solekf.x, rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(solkf.x, solukf.x, rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(solkf.Rt, solekf.Rt, rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(solkf.Rt, solukf.Rt, rtol=1e-4, atol=1e-7)

    def test_callable_R1_without_d0_raises(self):
        """test_function_versions.jl:52-54: a clear error naming d0."""
        with pytest.raises(ValueError, match="d0"):
            llpf.KalmanFilter(fw(A), fw(B), fw(C), 0, fw(R1), fw(R2),
                              nx=NX, nu=NU, ny=NY)
        with pytest.raises(ValueError, match="d0"):
            llpf.make_ekf(dyn, meas, fw(R1), fw(R2), nu=NU, ny=NY)

    def test_none_matrix_support(self):
        """test_function_versions.jl:57-67: B=None (no input), D=None."""
        kf_no_input = llpf.KalmanFilter(fw(A), None, fw(C), None, R1, R2,
                                        d0=d0(), nx=NX, nu=0, ny=NY)
        du = llpf.MvNormal(jnp.zeros(0), jnp.eye(0))
        x, u, y = llpf.simulate(kf_no_input, jnp.zeros((50, 0)),
                                jax.random.PRNGKey(1))
        assert x.shape == (50, NX) and y.shape == (50, NY)
        assert bool(jnp.all(jnp.isfinite(x)))

        mm_no_D = llpf.LinearMeasurementModel(C=C, D=None, R2=R2, ny=NY)
        out = mm_no_D(jnp.ones(NX), jnp.zeros(NU), None, 0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(C @ jnp.ones(NX)))

    def test_callable_matrices_under_jit_and_grad(self):
        """The callable form stays jit/grad-compatible end to end (the
        functional-JAX upgrade over the reference)."""
        kf = llpf.KalmanFilter(fw(A), fw(B), fw(C), 0, fw(R1), fw(R2),
                               d0=d0(), nx=NX, nu=NU, ny=NY)
        du = llpf.MvNormal(jnp.zeros(NU), jnp.eye(NU))
        x, u, y = llpf.simulate(kf, 60, jax.random.PRNGKey(2), du=du)

        def nll(s):
            kfp = llpf.KalmanFilter(
                lambda xx, uu, p, t: s * A, fw(B), fw(C), 0, fw(R1), fw(R2),
                d0=d0(), nx=NX, nu=NU, ny=NY,
            )
            return -llpf.loglik(kfp, u, y)

        g = float(jax.jit(jax.grad(nll))(1.0))
        assert np.isfinite(g) and abs(g) > 0
