"""RTS / MBF smoother tests vs. NumPy oracle and cross-smoother agreement
(test/test_large.jl:133-147 pattern: all smoothers identical on linear
systems)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lowlevelparticlefilters_jl_tpu as llpf

A = np.array([[1.0, 0.1], [0.0, 0.98]])
B = np.array([[0.0], [1.0]])
C = np.array([[1.0, 0.0]])
R1 = 0.01 * np.eye(2)
R2 = 0.1 * np.eye(1)


@pytest.fixture(scope="module")
def sim():
    kf = llpf.KalmanFilter(A, B, C, 0, R1, R2)
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.normal(size=(100, 1)))
    x, u, y = llpf.simulate(kf, u, jax.random.PRNGKey(3))
    return kf, x, u, y


def numpy_rts(kf_sol):
    x, xt, R, Rt = map(np.asarray, (kf_sol.x, kf_sol.xt, kf_sol.R, kf_sol.Rt))
    T = len(x)
    xT, RT = xt.copy(), Rt.copy()
    for t in range(T - 2, -1, -1):
        Ck = Rt[t] @ A.T @ np.linalg.inv(R[t + 1])
        xT[t] = xt[t] + Ck @ (xT[t + 1] - x[t + 1])
        RT[t] = Rt[t] + Ck @ (RT[t + 1] - R[t + 1]) @ Ck.T
    return xT, RT


def test_rts_matches_numpy(sim):
    kf, x, u, y = sim
    ssol = llpf.smooth(kf, u, y)
    xT_np, RT_np = numpy_rts(ssol.sol)
    np.testing.assert_allclose(ssol.xT, xT_np, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(ssol.RT, RT_np, rtol=1e-6, atol=1e-9)


def test_smoother_beats_filter(sim):
    kf, x, u, y = sim
    ssol = llpf.smooth(kf, u, y)
    rmse_f = float(jnp.sqrt(jnp.mean((ssol.sol.xt - x) ** 2)))
    rmse_s = float(jnp.sqrt(jnp.mean((ssol.xT - x) ** 2)))
    assert rmse_s < rmse_f


def test_mbf_matches_rts(sim):
    """MBF ≡ RTS on a linear system (smoothing.jl:41-99)."""
    kf, x, u, y = sim
    sol = llpf.forward_trajectory(kf, u, y)
    ssol_rts = llpf.rts_smooth(sol, kf)
    ssol_mbf, ll, lam_t, lam_h, r = llpf.smooth_mbf(sol, kf)
    np.testing.assert_allclose(ssol_mbf.xT, ssol_rts.xT, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(ssol_mbf.RT, ssol_rts.RT, rtol=1e-5, atol=1e-8)


def test_smoothing_solution_forwards_fields(sim):
    kf, x, u, y = sim
    ssol = llpf.smooth(kf, u, y)
    assert ssol.xt.shape == ssol.xT.shape
    assert np.isfinite(float(ssol.ll))
