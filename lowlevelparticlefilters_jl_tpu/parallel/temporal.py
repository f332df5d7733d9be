"""Temporal parallelization of Kalman filtering and RTS smoothing.

The reference's `forward_trajectory` is an inherently sequential O(T) loop
(/root/reference/src/filtering.jl:293-315) — the only option on a CPU.  On
TPU the linear-Gaussian recursion is *associative* (Särkkä &
García-Fernández, "Temporal Parallelization of Bayesian Smoothers",
IEEE TAC 2021, arXiv:1905.13002; see PAPERS.md): filtering and smoothing
both factor into elements combined by an associative operator, so
`jax.lax.associative_scan` evaluates the whole pass in O(log T) depth with
all the per-step 5-matrix algebra batched onto the MXU.

This is an *acceleration layer*: `parallel_forward_trajectory` /
`parallel_rts_smooth` reproduce the sequential results to numerical
precision (validated in tests) and share the solution containers.

Filtering element k: (A, b, C, η, J) such that
    p(x_k | y_{1:k}) under composition;  combination (⊗):
    D = (I + C1 J2)⁻¹
    A = A2 D A1,          b = A2 D (b1 + C1 η2) + b2,  C = A2 D C1 A2ᵀ + C2
    η = A1ᵀ Dᵀ (η2 − J2 b1) + η1,   J = A1ᵀ Dᵀ J2 A1 + J1
After the scan, b_k / C_k are the filtered mean/covariance.

Smoothing element k: (E, g, L) with reverse combination
    (E_i, g_i, L_i) ∘ (E_j, g_j, L_j) = (E_i E_j, E_i g_j + g_i,
                                         E_i L_j E_iᵀ + L_i)
giving the smoothed mean/covariance g_k / L_k.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.linalg import symmetrize, chol_lower, rdiv_chol
from ..ops.matrices import resolve_mat
from ..ops.mvnormal import mvnormal_logpdf
from ..utils.solutions import KalmanFilteringSolution, KalmanSmoothingSolution


def _resolve_seq(M, x0, u_seq, tvec, p, Ts=1.0):
    """Resolve a get_mat-style spec into a stacked [T, ...] array."""
    if M is None:
        return None
    if isinstance(M, jax.Array) and M.ndim == 2:
        return jnp.broadcast_to(M, (tvec.shape[0], *M.shape))
    return jax.vmap(lambda u, t: resolve_mat(M, x0, u, p, t, Ts=Ts))(u_seq, tvec)


def _state_indep_flag(M, x0, u0, p, t0, Ts=1.0):
    """jit-safe guard for the associative-scan path's core assumption.

    The temporal-parallel filter resolves callable matrices at ``x0`` for
    every step, which is only valid for matrices that do NOT depend on the
    state.  Returns None for non-callable specs; otherwise a boolean that is
    False when the callable's value changes under a state perturbation —
    ANDed into ``sol.ok`` so a state-dependent model surfaces as an invalid
    solution instead of silently wrong numbers.
    """
    if M is None or not (callable(M) and not isinstance(M, jax.Array)):
        return None
    a = resolve_mat(M, x0, u0, p, t0, Ts=Ts)
    b = resolve_mat(M, x0 + 1.0, u0, p, t0, Ts=Ts)
    return jnp.all(jnp.abs(a - b) <= 1e-6 * (1.0 + jnp.abs(a)))


def _filter_elements(F, c, H, Q, R, y, m0, P0):
    """Per-step associative filtering elements (§III-B of the paper),
    adapted to this package's correct-then-predict convention
    (filtering.jl:293-315): the first measurement updates the *prior*
    directly, and the transition entering step k is the one resolved at
    step k−1.
    """
    T, nx = c.shape
    eye = jnp.eye(nx, dtype=c.dtype)

    def generic(Fk, ck, Hk, Qk, Rk, yk):
        # element k≥1: filtered_{k-1} → predict (F_{k-1}) → update (y_k)
        S = symmetrize(Hk @ Qk @ Hk.T) + Rk
        Sch = chol_lower(S)
        K = rdiv_chol(Qk @ Hk.T, Sch)
        A = (eye - K @ Hk) @ Fk
        b = ck + K @ (yk - Hk @ ck)
        C = symmetrize((eye - K @ Hk) @ Qk)
        HtSinv = rdiv_chol(Hk.T, Sch)
        eta = Fk.T @ HtSinv @ (yk - Hk @ ck)
        J = symmetrize(Fk.T @ HtSinv @ Hk @ Fk)
        return A, b, C, eta, J

    A, b, C, eta, J = jax.vmap(generic)(F[:-1], c[:-1], H[1:], Q[:-1], R[1:], y[1:])

    # element 0: measurement update of the prior (no prediction first)
    S0 = symmetrize(H[0] @ P0 @ H[0].T) + R[0]
    S0ch = chol_lower(S0)
    K0 = rdiv_chol(P0 @ H[0].T, S0ch)
    b0 = m0 + K0 @ (y[0] - H[0] @ m0)
    C0 = symmetrize((eye - K0 @ H[0]) @ P0)
    A = jnp.concatenate([jnp.zeros((1, nx, nx), A.dtype), A], axis=0)
    b = jnp.concatenate([b0[None], b], axis=0)
    C = jnp.concatenate([C0[None], C], axis=0)
    eta = jnp.concatenate([jnp.zeros((1, nx), eta.dtype), eta], axis=0)
    J = jnp.concatenate([jnp.zeros((1, nx, nx), J.dtype), J], axis=0)
    return A, b, C, eta, J


def _filter_combine(e1, e2):
    A1, b1, C1, eta1, J1 = e1
    A2, b2, C2, eta2, J2 = e2
    nx = A1.shape[-1]
    eye = jnp.eye(nx, dtype=A1.dtype)
    M = eye + C1 @ J2                       # D = M⁻¹
    A2_D = jnp.linalg.solve(M.mT, A2.mT).mT  # A2 D
    G = jnp.linalg.solve(M, A1)              # Gᵀ = A1ᵀ Dᵀ
    A = A2_D @ A1
    b = jnp.einsum("...ij,...j->...i", A2_D, b1 + jnp.einsum("...ij,...j->...i", C1, eta2)) + b2
    C = A2_D @ C1 @ A2.mT + C2
    eta = jnp.einsum(
        "...ji,...j->...i", G,
        eta2 - jnp.einsum("...ij,...j->...i", J2, b1),
    ) + eta1
    J = jnp.einsum("...ji,...jk->...ik", G, J2 @ A1) + J1
    C = 0.5 * (C + C.mT)
    J = 0.5 * (J + J.mT)
    return A, b, C, eta, J


def _parallel_filter_core(F, c, H, Q, R, y_eff, m0, P0):
    """Associative-scan filtering on a prepared affine time-varying model.

    Inputs are stacked [T, ...] sequences; returns
    ``(x_pred, R_pred, xt, Rt, e, S, Schol, K, lls)``.
    """
    elems = _filter_elements(F, c, H, Q, R, y_eff, m0, P0)
    A_, b_, C_, eta_, J_ = jax.lax.associative_scan(_filter_combine, elems)
    xt, Rt = b_, C_  # filtered moments

    # predicted moments, innovations, gains — all vectorized post-hoc.
    # x[0] is the prior (correct-then-predict: sol.x stores x(k|k−1) with
    # x(0|−1) = d0), later steps use the step-(k−1) transition.
    x_pred = jnp.concatenate(
        [m0[None], jnp.einsum("tij,tj->ti", F[:-1], xt[:-1]) + c[:-1]], axis=0
    )
    R_pred = jnp.concatenate(
        [P0[None],
         symmetrize(jnp.einsum("tij,tjk,tlk->til", F[:-1], Rt[:-1], F[:-1]))
         + Q[:-1]],
        axis=0,
    )
    e = y_eff - jnp.einsum("tij,tj->ti", H, x_pred)
    S = symmetrize(jnp.einsum("tij,tjk,tlk->til", H, R_pred, H)) + R
    Schol = jnp.linalg.cholesky(S)
    K = jax.vmap(rdiv_chol)(jnp.einsum("tij,tkj->tik", R_pred, H), Schol)
    lls = jax.vmap(lambda ek, Lk: mvnormal_logpdf(ek, jnp.zeros_like(ek), Lk))(e, Schol)
    return x_pred, R_pred, xt, Rt, e, S, Schol, K, lls


def _parallel_smooth_core(F, c, Q, xt, Rt):
    """Associative-scan RTS backward pass on a prepared affine model."""
    elems = _smooth_elements(F, c, Q, xt, Rt)
    _, g, L = jax.lax.associative_scan(
        lambda a, b: _smooth_combine(b, a), elems, reverse=True
    )
    return g, L


def parallel_forward_trajectory(kf, u, y, p=None) -> KalmanFilteringSolution:
    """O(log T)-depth Kalman filtering pass via `lax.associative_scan`.

    Matches :func:`...trajectory.kalman_forward_trajectory` outputs
    (x, xt, R, Rt, ll, e, S, K) for constant or stacked/callable
    time-varying system matrices that do not depend on the state.
    """
    y = jnp.asarray(y)
    T = y.shape[0]
    u_seq = jnp.zeros((T, 0), dtype=y.dtype) if u is None else jnp.asarray(u)
    p = kf.p if p is None else p
    Ts = getattr(kf, "Ts", 1.0)
    tvec = jnp.arange(T) * Ts
    m0, P0 = kf.d0.mean, kf.d0.cov
    nx = m0.shape[-1]

    F = _resolve_seq(kf.A, m0, u_seq, tvec, p, Ts)
    B = _resolve_seq(kf.B, m0, u_seq, tvec, p, Ts)
    H = _resolve_seq(kf.C, m0, u_seq, tvec, p, Ts)
    D = _resolve_seq(kf.D, m0, u_seq, tvec, p, Ts)
    Q = _resolve_seq(kf.R1, m0, u_seq, tvec, p, Ts)
    R = _resolve_seq(kf.R2, m0, u_seq, tvec, p, Ts)
    c = (
        jnp.einsum("tij,tj->ti", B, u_seq)
        if (B is not None and u_seq.shape[-1])
        else jnp.zeros((T, nx), dtype=y.dtype)
    )
    y_eff = y - jnp.einsum("tij,tj->ti", D, u_seq) if D is not None else y

    x_pred, R_pred, xt, Rt, e, S, Schol, K, lls = _parallel_filter_core(
        F, c, H, Q, R, y_eff, m0, P0
    )
    ok = jnp.all(jnp.isfinite(xt), axis=-1)
    flags = [
        _state_indep_flag(M, m0, u_seq[0], p, tvec[0], Ts)
        for M in (kf.A, kf.B, kf.C, kf.D, kf.R1, kf.R2)
    ]
    flags = [f for f in flags if f is not None]
    if flags:
        ok = ok & jnp.stack(flags).all()
    return KalmanFilteringSolution(
        u=u_seq, y=y, x=x_pred, xt=xt, R=R_pred, Rt=Rt, ll=jnp.sum(lls),
        e=e, K=K, S=S, extra=None, t=tvec, ok=ok,
    )


def _smooth_elements(F, c, Q, xt, Rt):
    """Per-step associative smoothing elements (§IV of the paper)."""

    def generic(Fk, ck, Qk, mk, Pk):
        Pp = symmetrize(Fk @ Pk @ Fk.T) + Qk
        E = rdiv_chol(Pk @ Fk.T, chol_lower(Pp))
        g = mk - E @ (Fk @ mk + ck)
        L = symmetrize(Pk - E @ Fk @ Pk)
        return E, g, L

    # element k uses the step-k transition (k→k+1), matching the
    # sequential smoother's resolve-at-step-k (smoothing.jl:17-22)
    E, g, L = jax.vmap(generic)(F[:-1], c[:-1], Q[:-1], xt[:-1], Rt[:-1])
    # last element: identity at the filtered terminal state
    E = jnp.concatenate([E, jnp.zeros_like(E[-1:])], axis=0)
    g = jnp.concatenate([g, xt[-1:]], axis=0)
    L = jnp.concatenate([L, Rt[-1:]], axis=0)
    return E, g, L


def _smooth_combine(ei, ej):
    """Reverse-direction combination: element i (earlier) absorbs j."""
    E1, g1, L1 = ei
    E2, g2, L2 = ej
    E = E1 @ E2
    g = jnp.einsum("...ij,...j->...i", E1, g2) + g1
    L = symmetrize(E1 @ L2 @ jnp.swapaxes(E1, -1, -2) + L1)
    return E, g, L


def parallel_rts_smooth(kf, u, y, p=None, sol: Optional[KalmanFilteringSolution] = None):
    """O(log T)-depth RTS smoother: parallel filter pass + reverse
    `associative_scan` (arXiv:1905.13002 §IV).  Returns a
    :class:`KalmanSmoothingSolution` matching the sequential smoother."""
    if sol is None:
        sol = parallel_forward_trajectory(kf, u, y, p)
    y = jnp.asarray(sol.y)
    T = y.shape[0]
    u_seq = sol.u
    p = kf.p if p is None else p
    Ts = getattr(kf, "Ts", 1.0)
    tvec = jnp.arange(T) * Ts
    m0 = kf.d0.mean
    nx = m0.shape[-1]

    F = _resolve_seq(kf.A, m0, u_seq, tvec, p, Ts)
    B = _resolve_seq(kf.B, m0, u_seq, tvec, p, Ts)
    Q = _resolve_seq(kf.R1, m0, u_seq, tvec, p, Ts)
    c = (
        jnp.einsum("tij,tj->ti", B, u_seq)
        if (B is not None and u_seq.shape[-1])
        else jnp.zeros((T, nx), dtype=y.dtype)
    )
    # reverse=True feeds operands as (later-suffix, earlier-element); the
    # combination is written (earlier, later) — _parallel_smooth_core swaps.
    g, L = _parallel_smooth_core(F, c, Q, sol.xt, sol.Rt)
    return KalmanSmoothingSolution(sol=sol, xT=g, RT=L)


# ---------------------------------------------------------------------------
# Parallel *iterated extended* Kalman filter/smoother — the O(log T)
# treatment for NONLINEAR models (García-Fernández, Sarmavuori & Särkkä,
# "Parallel iterated extended and sigma-point Kalman smoothers"; same
# associative operators as above, arXiv:1905.13002).
# ---------------------------------------------------------------------------


def parallel_iekf_smooth(ekf, u, y, p=None, *, iters: int = 8):
    """O(log T)-depth iterated extended Kalman smoother.

    Gauss–Newton on the MAP trajectory: each iteration linearizes the
    nonlinear dynamics/measurement along the current smoothed trajectory
    (an affine time-varying model) and runs the associative-scan Kalman
    filter + RTS smoother on it.  The fixed point is the iterated EKS
    (MAP) trajectory; one sequential pass of the classic EKS is the same
    construction with a per-step running linearization, so the two agree
    on mildly nonlinear models and exactly on linear ones.

    The sequential counterpart is ``ExtendedKalmanFilter.smooth``
    (ekf.jl:193-225); this routine gives nonlinear models the same
    O(log T) treatment :func:`parallel_forward_trajectory` gives linear
    ones.  Requires an EKF-shaped measurement model (measurement + Cjac).

    Returns a :class:`KalmanSmoothingSolution` whose ``sol`` is the
    filtered solution of the *final* linearization.
    """
    mm = ekf.measurement_model
    if not hasattr(mm, "measurement"):
        raise TypeError("parallel_iekf_smooth needs an EKF-shaped measurement model")
    y = jnp.asarray(y)
    T = y.shape[0]
    u_seq = jnp.zeros((T, 0), dtype=y.dtype) if u is None else jnp.asarray(u)
    p = ekf.p if p is None else p
    Ts = getattr(ekf, "Ts", 1.0)
    tvec = jnp.arange(T) * Ts
    m0, P0 = ekf.d0.mean, ekf.d0.cov

    dyn = ekf.dynamics
    h = mm.measurement
    Ajac = ekf._Ajac
    Cjac = mm._Cjac
    Q = _resolve_seq(ekf.R1, m0, u_seq, tvec, p, Ts)
    R = _resolve_seq(mm.R2, m0, u_seq, tvec, p, Ts)

    # initial nominal trajectory: noiseless rollout from the prior mean
    def roll(x, inp):
        uk, tk = inp
        return dyn(x, uk, p, tk), x

    _, xbar0 = jax.lax.scan(roll, m0, (u_seq, tvec))

    def linearize(xbar):
        F = jax.vmap(lambda xk, uk, tk: Ajac(xk, uk, p, tk))(xbar, u_seq, tvec)
        fx = jax.vmap(lambda xk, uk, tk: dyn(xk, uk, p, tk))(xbar, u_seq, tvec)
        c = fx - jnp.einsum("tij,tj->ti", F, xbar)
        H = jax.vmap(lambda xk, uk, tk: Cjac(xk, uk, p, tk))(xbar, u_seq, tvec)
        hx = jax.vmap(lambda xk, uk, tk: h(xk, uk, p, tk))(xbar, u_seq, tvec)
        d = hx - jnp.einsum("tij,tj->ti", H, xbar)
        return F, c, H, y - d

    def one_iter(xbar, _):
        F, c, H, y_eff = linearize(xbar)
        _, _, xt, Rt, _, _, _, _, _ = _parallel_filter_core(
            F, c, H, Q, R, y_eff, m0, P0
        )
        xT, _ = _parallel_smooth_core(F, c, Q, xt, Rt)
        return xT, None

    xbar, _ = jax.lax.scan(one_iter, xbar0, None, length=max(1, iters))

    # Final pass at the converged trajectory to assemble full outputs.
    F, c, H, y_eff = linearize(xbar)
    x_pred, R_pred, xt, Rt, e, S, Schol, K, lls = _parallel_filter_core(
        F, c, H, Q, R, y_eff, m0, P0
    )
    xT, RT = _parallel_smooth_core(F, c, Q, xt, Rt)
    ok = jnp.all(jnp.isfinite(xT), axis=-1)
    sol = KalmanFilteringSolution(
        u=u_seq, y=y, x=x_pred, xt=xt, R=R_pred, Rt=Rt, ll=jnp.sum(lls),
        e=e, K=K, S=S, extra=None, t=tvec, ok=ok,
    )
    return KalmanSmoothingSolution(sol=sol, xT=xT, RT=RT)


# ---------------------------------------------------------------------------
# Parallel *sigma-point* (iterated posterior-linearization) smoother — the
# O(log T) treatment for the UKF itself (García-Fernández, Sarmavuori &
# Särkkä, "Parallel iterated extended and sigma-point Kalman smoothers").
# Statistical linearization replaces the IEKS Jacobians, so the fixed
# point is the sigma-point (unscented) smoother rather than the MAP
# trajectory.
# ---------------------------------------------------------------------------


def _slr(fn, m, P, W, params, out_dim):
    """Statistical linear regression of ``fn`` at N(m, P) via the
    unscented transform: returns ``(Fk, ck, Om)`` with
    ``fn(x) ≈ Fk x + ck + e, e ~ N(0, Om)``  (the sigma-point analogue
    of a Jacobian linearization; exact for affine fn with Om = 0)."""
    from ..models.sigmapoints import sigmapoints, ut_mean, ut_cov, ut_cross_cov
    from ..ops.linalg import chol_lower as _chol

    xs = sigmapoints(m, P, params)
    ys = jax.vmap(fn)(xs)
    ybar = ut_mean(ys, W)
    Pxy = ut_cross_cov(xs, m, ys, ybar, W)
    Pyy = ut_cov(ys, ybar, W)
    Lc = _chol(symmetrize(P))
    # Fk = Pxyᵀ P⁻¹ via two triangular solves
    Fk = jax.scipy.linalg.cho_solve((Lc, True), Pxy).T
    ck = ybar - Fk @ m
    Om = symmetrize(Pyy - Fk @ P @ Fk.T)
    return Fk, ck, Om


def parallel_ukf_smooth(ukf, u, y, p=None, *, iters: int = 8):
    """O(log T)-depth iterated sigma-point (posterior-linearization)
    Kalman smoother — the unscented counterpart of
    :func:`parallel_iekf_smooth`.

    Each iteration statistically linearizes the nonlinear dynamics and
    measurement along the current smoothed trajectory *and covariance*
    (unscented-transform SLR), producing an affine time-varying model
    with SLR residual covariances folded into R1/R2; the associative-scan
    filter + RTS smoother then run in O(log T) depth.  On linear models
    the SLR is exact and one iteration reproduces the KF/RTS; on
    nonlinear models the fixed point is the iterated posterior-
    linearization smoother, which agrees with the sequential unscented
    RTS smoother (/root/reference/src/ukf.jl:862-925 counterpart,
    `filters/ukf.py::UnscentedKalmanFilter.smooth`) to linearization
    tolerance on mildly nonlinear models.

    Returns a :class:`KalmanSmoothingSolution`.
    """
    from ..models.sigmapoints import ukf_weights

    mm = ukf.measurement_model
    if not hasattr(mm, "measurement"):
        raise TypeError("parallel_ukf_smooth needs a UKF-shaped measurement model")
    y = jnp.asarray(y)
    T = y.shape[0]
    u_seq = jnp.zeros((T, 0), dtype=y.dtype) if u is None else jnp.asarray(u)
    p = ukf.p if p is None else p
    Ts = getattr(ukf, "Ts", 1.0)
    tvec = jnp.arange(T) * Ts
    m0, P0 = ukf.d0.mean, ukf.d0.cov
    nx = m0.shape[-1]
    params = ukf.weight_params
    W = ukf_weights(params, nx)

    dyn = ukf.dynamics
    h = mm.measurement
    Q = _resolve_seq(ukf.R1, m0, u_seq, tvec, p, Ts)
    R = _resolve_seq(mm.R2, m0, u_seq, tvec, p, Ts)

    # initial nominal trajectory: noiseless rollout, prior covariance
    # accumulated through the rollout Jacobian-free (P := P0 each step is
    # enough to seed the SLR; the iteration replaces it immediately).
    def roll(x, inp):
        uk, tk = inp
        return dyn(x, uk, p, tk), x

    _, xbar0 = jax.lax.scan(roll, m0, (u_seq, tvec))
    Pbar0 = jnp.broadcast_to(P0, (T, nx, nx))

    def linearize(xbar, Pbar):
        def one(mk, Pk, uk, tk):
            Fk, ck, Omf = _slr(lambda x: dyn(x, uk, p, tk), mk, Pk, W,
                               params, nx)
            Hk, dk, Omh = _slr(lambda x: h(x, uk, p, tk), mk, Pk, W,
                               params, y.shape[1])
            return Fk, ck, Omf, Hk, dk, Omh

        F, c, Omf, H, d, Omh = jax.vmap(one)(xbar, Pbar, u_seq, tvec)
        return F, c, Q + Omf, H, R + Omh, y - d

    def one_iter(carry, _):
        xbar, Pbar = carry
        F, c, Qe, H, Re, y_eff = linearize(xbar, Pbar)
        _, _, xt, Rt, _, _, _, _, _ = _parallel_filter_core(
            F, c, H, Qe, Re, y_eff, m0, P0
        )
        xT, RT = _parallel_smooth_core(F, c, Qe, xt, Rt)
        return (xT, RT), None

    (xbar, Pbar), _ = jax.lax.scan(one_iter, (xbar0, Pbar0), None,
                                   length=max(1, iters))

    F, c, Qe, H, Re, y_eff = linearize(xbar, Pbar)
    x_pred, R_pred, xt, Rt, e, S, Schol, K, lls = _parallel_filter_core(
        F, c, H, Qe, Re, y_eff, m0, P0
    )
    xT, RT = _parallel_smooth_core(F, c, Qe, xt, Rt)
    ok = jnp.all(jnp.isfinite(xT), axis=-1)
    sol = KalmanFilteringSolution(
        u=u_seq, y=y, x=x_pred, xt=xt, R=R_pred, Rt=Rt, ll=jnp.sum(lls),
        e=e, K=K, S=S, extra=None, t=tvec, ok=ok,
    )
    return KalmanSmoothingSolution(sol=sol, xT=xT, RT=RT)
