"""get_mat convention + IndexingMatrix tests.

Mirrors /root/reference/test/test_getmat_3d_time.jl (time-stacked matrices
agree with the callable form across filters), test_smoother_timevarying.jl
(RTS with time-varying A), and test_indexing_matrix.jl:1-122 (selector
semantics and multiplies).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lowlevelparticlefilters_jl_tpu as llpf
from lowlevelparticlefilters_jl_tpu.ops.matrices import resolve_mat


def _A(t):
    a = 0.97 * (1.0 + 0.001 * t)
    return jnp.array([[a, -0.097], [0.097, a]])


class TestGetMat:
    def test_three_forms_agree(self):
        """Constant | stacked | callable resolve identically
        (filtering.jl:16-43 convention)."""
        T = 50
        A_stack = jnp.stack([_A(t) for t in range(T)])
        A_fn = lambda x, u, p, t: _A(t)
        for k in (0, 7, 49):
            np.testing.assert_allclose(
                np.asarray(resolve_mat(A_stack, None, None, None, k)),
                np.asarray(_A(k)), rtol=1e-6,
            )
            np.testing.assert_allclose(
                np.asarray(resolve_mat(llpf.FnMat(fn=A_fn), None, None, None, k)),
                np.asarray(_A(k)), rtol=1e-6,
            )
        np.testing.assert_allclose(
            np.asarray(resolve_mat(_A(0), None, None, None, 33)),
            np.asarray(_A(0)),
        )

    def _filters(self, Aspec):
        B = jnp.array([[0.1], [0.0]])
        C = jnp.eye(2)
        R1 = 0.01 * jnp.eye(2)
        R2 = 0.1 * jnp.eye(2)
        d0 = llpf.MvNormal(jnp.zeros(2), 0.5 * jnp.eye(2))
        return llpf.KalmanFilter(Aspec, B, C, 0, R1, R2, d0=d0, nx=2, ny=2)

    def test_stacked_equals_callable_trajectory(self):
        """KF with 3-D stacked A ≡ KF with A(t) callable
        (test_getmat_3d_time.jl pattern)."""
        T = 60
        kf_fn = self._filters(lambda x, u, p, t: _A(t))
        kf_3d = self._filters(llpf.TimeVarying(jnp.stack([_A(t) for t in range(T)])))
        us = 0.3 * jnp.ones((T, 1))
        _, _, ys = llpf.simulate(kf_fn, us, jax.random.PRNGKey(0))
        s1 = llpf.forward_trajectory(kf_fn, us, ys)
        s2 = llpf.forward_trajectory(kf_3d, us, ys)
        np.testing.assert_allclose(np.asarray(s2.xt), np.asarray(s1.xt), atol=1e-5)
        np.testing.assert_allclose(float(s2.ll), float(s1.ll), rtol=1e-6)

    def test_timevarying_smoother(self):
        """RTS smoothing with time-varying A matches across spec forms and
        improves on filtering (test_smoother_timevarying.jl pattern)."""
        T = 60
        kf_fn = self._filters(lambda x, u, p, t: _A(t))
        kf_3d = self._filters(llpf.TimeVarying(jnp.stack([_A(t) for t in range(T)])))
        us = 0.3 * jnp.ones((T, 1))
        xs, _, ys = llpf.simulate(kf_fn, us, jax.random.PRNGKey(1))
        ss1 = llpf.smooth(kf_fn, us, ys)
        ss2 = llpf.smooth(kf_3d, us, ys)
        np.testing.assert_allclose(np.asarray(ss2.xT), np.asarray(ss1.xT), atol=1e-5)
        rmse_f = float(jnp.sqrt(jnp.mean((ss1.sol.xt - xs) ** 2)))
        rmse_s = float(jnp.sqrt(jnp.mean((ss1.xT - xs) ** 2)))
        assert rmse_s < rmse_f

    def test_timevarying_R2(self):
        """Time-varying measurement noise via callable (adaptive-KF
        workflow, docs/adaptive_kalmanfilter.md)."""
        kf = llpf.KalmanFilter(
            _A(0), jnp.array([[0.1], [0.0]]), jnp.eye(2), 0,
            0.01 * jnp.eye(2),
            lambda x, u, p, t: (0.1 + 0.05 * jnp.sin(t)) * jnp.eye(2),
            d0=llpf.MvNormal(jnp.zeros(2), jnp.eye(2)), nx=2, ny=2,
        )
        us = 0.3 * jnp.ones((40, 1))
        ys = jax.random.normal(jax.random.PRNGKey(2), (40, 2)) * 0.3
        sol = llpf.forward_trajectory(kf, us, ys)
        assert bool(sol.ok.all())


class TestIndexingMatrix:
    def test_selector_semantics(self):
        """I @ v == dense @ v; Iᵀ @ v scatters (indexing_matrix.jl:51-101)."""
        I = llpf.indexing_matrix([2, 0, 3], 5)
        v = jnp.arange(5.0)
        np.testing.assert_allclose(np.asarray(I @ v), [2.0, 0.0, 3.0])
        dense = np.asarray(I.todense())
        np.testing.assert_allclose(dense, np.eye(5)[[2, 0, 3]])
        # matrix multiply both sides
        M = jax.random.normal(jax.random.PRNGKey(0), (5, 4))
        np.testing.assert_allclose(np.asarray(I @ M), dense @ np.asarray(M), rtol=1e-6)
        M2 = jax.random.normal(jax.random.PRNGKey(1), (4, 3))
        np.testing.assert_allclose(
            np.asarray(M2 @ llpf.indexing_matrix([1, 0, 2], 3)),
            np.asarray(M2) @ np.eye(3)[[1, 0, 2]],
            rtol=1e-6,
        )

    def test_rmatvec_scatter(self):
        I = llpf.indexing_matrix([2, 0, 2], 4)  # duplicate rows add
        v = jnp.array([1.0, 10.0, 100.0])
        out = np.asarray(I.rmatvec(v))
        np.testing.assert_allclose(out, [10.0, 0.0, 101.0, 0.0])
        np.testing.assert_allclose(
            out, np.asarray(I.todense()).T @ np.asarray(v)
        )

    def test_shape_and_jit(self):
        I = llpf.indexing_matrix([0, 1], 3)
        assert I.shape == (2, 3)
        f = jax.jit(lambda v: I @ v)
        np.testing.assert_allclose(np.asarray(f(jnp.arange(3.0))), [0.0, 1.0])


class TestIndexingMatrixTranspose:
    """Lazy-transpose view + measurement-model integration
    (indexing_matrix.jl:51-101 fast multiplies; the friction-NN workflow
    uses an IndexingMatrix as the C of a LinearMeasurementModel)."""

    def test_transpose_matmuls(self):
        I = llpf.indexing_matrix([0, 2], 4)
        D = np.asarray(I.todense())
        R = jnp.arange(16.0).reshape(4, 4)
        np.testing.assert_allclose(np.asarray(R @ I.T), np.asarray(R) @ D.T)
        np.testing.assert_allclose(
            np.asarray((I @ R) @ I.T), D @ np.asarray(R) @ D.T)
        K2 = jnp.arange(8.0).reshape(2, 4)
        np.testing.assert_allclose(np.asarray(I.T @ K2), D.T @ np.asarray(K2))
        assert I.T.shape == (4, 2)
        assert I.T.T is I

    def test_linear_measurement_model_indexing_C(self):
        """KF correct with C=IndexingMatrix == C=dense, bit-for-bit."""
        nx, ny = 4, 2
        A = 0.1 * jnp.eye(nx)
        R1 = jnp.eye(nx)
        R2 = 0.5 * jnp.eye(ny)
        Isel = llpf.indexing_matrix([1, 3], nx)
        d0 = llpf.MvNormal(jnp.arange(1.0, nx + 1), 2.0 * jnp.eye(nx))
        kf_i = llpf.KalmanFilter(A, jnp.zeros((nx, 1)), Isel, 0, R1, R2, d0=d0)
        kf_d = llpf.KalmanFilter(A, jnp.zeros((nx, 1)), Isel.todense(), 0,
                                 R1, R2, d0=d0)
        y = jnp.array([0.3, -0.8])
        u = jnp.zeros(1)
        si, infoi = kf_i.correct(kf_i.init(), u, y)
        sd, infod = kf_d.correct(kf_d.init(), u, y)
        np.testing.assert_allclose(np.asarray(si.x), np.asarray(sd.x), atol=1e-6)
        np.testing.assert_allclose(np.asarray(si.R), np.asarray(sd.R), atol=1e-6)
        np.testing.assert_allclose(float(infoi.ll), float(infod.ll), rtol=1e-6)

    def test_mm_indexing_C_full_trajectory(self):
        """LinearMeasurementModel(C=IndexingMatrix) through an EKF scan."""
        nx, ny = 3, 1
        dyn = lambda x, u, p, t: 0.9 * x
        R1 = 0.1 * jnp.eye(nx)
        R2 = jnp.array([[0.2]])
        mm = llpf.LinearMeasurementModel(
            C=llpf.indexing_matrix([2], nx), R2=R2, ny=ny)
        mmd = llpf.LinearMeasurementModel(
            C=llpf.indexing_matrix([2], nx).todense(), R2=R2, ny=ny)
        d0 = llpf.MvNormal(jnp.zeros(nx), jnp.eye(nx))
        e1 = llpf.make_ekf(dyn, mm, R1, None, d0=d0, nu=0, ny=ny)
        e2 = llpf.make_ekf(dyn, mmd, R1, None, d0=d0, nu=0, ny=ny)
        rng = np.random.default_rng(0)
        us = jnp.zeros((50, 0))
        ys = jnp.asarray(rng.normal(size=(50, ny)))
        s1 = llpf.forward_trajectory(e1, us, ys)
        s2 = llpf.forward_trajectory(e2, us, ys)
        np.testing.assert_allclose(np.asarray(s1.xt), np.asarray(s2.xt),
                                   atol=1e-5)
        np.testing.assert_allclose(float(s1.ll), float(s2.ll), rtol=1e-6)
