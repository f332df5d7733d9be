"""RTS / MBF smoothers with a 3-D time-varying A.

Mirrors /root/reference/test/test_smoother_timevarying.jl: the forward
pass resolves A at step t (the transition t → t+1); the backward pass
must use the SAME A_t — a hand-rolled RTS recursion over the stacked A
is the oracle.  Also exercised for the factored SqKF smoother and the
temporal-parallel smoother, which share the step convention.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lowlevelparticlefilters_jl_tpu as llpf


def _system(T=30, Ts=1.0):
    nx, nu, ny = 2, 1, 1
    A_seq = np.zeros((T, nx, nx))
    for k in range(T):
        th = 0.05 * (k + 1)
        A_seq[k] = 0.97 * np.array(
            [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
        )
    B = np.array([[0.0], [1.0]])
    C = np.array([[1.0, 0.0]])
    R1 = 0.01 * np.eye(nx)
    R2 = 0.1 * np.eye(ny)
    d0 = llpf.MvNormal(jnp.zeros(nx), jnp.eye(nx))
    kf = llpf.KalmanFilter(
        jnp.asarray(A_seq), B, C, 0, R1, R2, d0=d0, nx=nx, ny=ny, Ts=Ts
    )
    rng = np.random.default_rng(123)
    x = rng.standard_normal(nx)
    us, ys = [], []
    for t in range(T):
        u = rng.standard_normal(nu)
        ys.append(C @ x + np.sqrt(0.1) * rng.standard_normal(ny))
        x = A_seq[t] @ x + B @ u + np.sqrt(0.01) * rng.standard_normal(nx)
        us.append(u)
    return kf, A_seq, jnp.asarray(np.stack(us)), jnp.asarray(np.stack(ys))


def _hand_rts(sol, A_seq):
    """Hand-rolled RTS oracle over the stacked A (the .jl reference loop)."""
    xt, Rt = np.asarray(sol.xt), np.asarray(sol.Rt)
    xp, Rp = np.asarray(sol.x), np.asarray(sol.R)
    T = xt.shape[0]
    xT = xt.copy()
    RT = Rt.copy()
    for t in range(T - 2, -1, -1):
        Ck = Rt[t] @ A_seq[t].T @ np.linalg.inv(Rp[t + 1])
        xT[t] = xt[t] + Ck @ (xT[t + 1] - xp[t + 1])
        RT[t] = Rt[t] + Ck @ (RT[t + 1] - Rp[t + 1]) @ Ck.T
        RT[t] = 0.5 * (RT[t] + RT[t].T)
    return xT, RT


class TestTimeVaryingSmoothers:
    def test_rts_uses_step_t_transition(self):
        kf, A_seq, us, ys = _system()
        sol = llpf.forward_trajectory(kf, us, ys)
        ss = llpf.smooth(kf, us, ys)
        xT_ref, RT_ref = _hand_rts(sol, A_seq)
        np.testing.assert_allclose(np.asarray(ss.xT), xT_ref, rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(ss.RT), RT_ref, rtol=1e-8, atol=1e-10)

    def test_mbf_matches_rts(self):
        from lowlevelparticlefilters_jl_tpu.smoothing import smooth_mbf

        kf, A_seq, us, ys = _system()
        sol = llpf.forward_trajectory(kf, us, ys)
        xT_ref, RT_ref = _hand_rts(sol, A_seq)
        ssol, ll, lam_t, lam_h, r = smooth_mbf(sol, kf)
        np.testing.assert_allclose(np.asarray(ssol.xT), xT_ref, rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(np.asarray(ssol.RT), RT_ref, rtol=1e-6, atol=1e-8)

    def test_sqkf_factored_smoother_timevarying(self):
        """The factored square-root smoother resolves A at step t too."""
        kf, A_seq, us, ys = _system()
        sq = llpf.SqKalmanFilter(
            kf.A, kf.B, kf.C, 0, 0.01 * np.eye(2), 0.1 * np.eye(1),
            d0=llpf.MvNormal(jnp.zeros(2), jnp.eye(2)), nx=2, ny=1,
        )
        sol = llpf.forward_trajectory(kf, us, ys)
        xT_ref, RT_ref = _hand_rts(sol, A_seq)
        ss = llpf.smooth(sq, us, ys)
        np.testing.assert_allclose(np.asarray(ss.xT), xT_ref, rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(np.asarray(ss.RT), RT_ref, rtol=1e-6, atol=1e-9)

    def test_parallel_smoother_timevarying(self):
        kf, A_seq, us, ys = _system()
        sol = llpf.forward_trajectory(kf, us, ys)
        xT_ref, RT_ref = _hand_rts(sol, A_seq)
        ss = llpf.parallel_rts_smooth(kf, us, ys)
        np.testing.assert_allclose(np.asarray(ss.xT), xT_ref, rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(np.asarray(ss.RT), RT_ref, rtol=1e-7, atol=1e-9)

    @pytest.mark.parametrize("Ts", [0.5, 2.0])
    def test_timevarying_smoother_nonunit_Ts(self, Ts):
        """The round-2 step-indexing fix must hold through the smoother."""
        kf, A_seq, us, ys = _system(Ts=Ts)
        sol = llpf.forward_trajectory(kf, us, ys)
        ss = llpf.smooth(kf, us, ys)
        xT_ref, RT_ref = _hand_rts(sol, A_seq)
        np.testing.assert_allclose(np.asarray(ss.xT), xT_ref, rtol=1e-8, atol=1e-10)
