"""Square-root Kalman filters (linear and extended) via QR updates.

TPU-native re-design of /root/reference/src/sq_kalman.jl (QR-only
square-root KF, Tracy 2022, arXiv:2208.06452) and src/sq_ekf.jl.  The
state covariance is stored as its upper-triangular Cholesky factor ``U``
(Σ = UᵀU); both time and measurement updates are thin QR factorizations,
which XLA maps to batched Householder kernels.

Design deviation from the reference: `state_cov` (and therefore the
solution arrays R/Rt) always materializes the *full* covariance ``UᵀU``,
so all generic smoothers and diagnostics work unchanged; the factor lives
in ``state.U``.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ..models.measurement_models import AbstractMeasurementModel, EKFMeasurementModel
from ..ops.linalg import positive_qr_r, symmetrize
from ..ops.matrices import MatLike, as_matspec, resolve_mat
from ..ops.mvnormal import MvNormal, as_mvnormal, mvnormal_logpdf
from ..utils.signal_names import SignalNames, default_names
from ..utils.struct import struct, field, static_field
from .base import AbstractKalmanFilter
from .kalman import KalmanInfo


@struct
class SqKFState:
    """Square-root filter state: mean ``x``, upper Cholesky factor ``U``."""

    x: jax.Array = field()
    U: jax.Array = field()
    t: jax.Array = field(default=0)


def _upper_factor(R):
    """Coerce a covariance matrix to its upper Cholesky factor (Σ = UᵀU)."""
    if R is None:
        return None
    R = jnp.asarray(R)
    return jnp.linalg.cholesky(R).T


def sqkf_predict_factor(U, At, U1, alpha=1.0):
    """U⁺ = qr([√α U Aᵀ; U1]).R (sq_kalman.jl:104-128)."""
    a = jnp.sqrt(alpha)
    M = jnp.concatenate([a * U @ At.T, U1], axis=0)
    return positive_qr_r(M)


def sqkf_correct_factor(x, U, Ct, e, U2):
    """Square-root measurement update (sq_kalman.jl:136-159).

    Returns (x, U, info).  ``S`` in the info is the full innovation
    covariance; ``Schol`` its lower factor.
    """
    S0 = positive_qr_r(jnp.concatenate([U @ Ct.T, U2], axis=0))  # upper, +diag
    # K = ((Uᵀ (U Cᵀ)) / S) / Sᵀ  — two triangular solves.
    UCt = U @ Ct.T
    B = U.T @ UCt
    tmp = jax.scipy.linalg.solve_triangular(S0.T, B.T, lower=True)  # S0ᵀ Xᵀ = Bᵀ
    K = jax.scipy.linalg.solve_triangular(S0, tmp, lower=False).T
    xn = x + K @ e
    nx = U.shape[-1]
    M = jnp.concatenate(
        [U @ (jnp.eye(nx, dtype=U.dtype) - K @ Ct).T, U2 @ K.T], axis=0
    )
    Un = positive_qr_r(M)
    S = S0.T @ S0
    ll = mvnormal_logpdf(e, jnp.zeros_like(e), S0.T)
    return xn, Un, KalmanInfo(ll=ll, e=e, S=S, Schol=S0.T, K=K)


@struct
class SqKalmanFilter(AbstractKalmanFilter):
    """Linear Kalman filter on square-root form (sq_kalman.jl:1-65).

    ``R1``/``R2`` may be covariance matrices (factorized at construction)
    or callables returning **upper Cholesky factors** — matching the
    reference's convention for function-valued noise (sq_kalman.jl:38).
    """

    A: MatLike = field()
    B: MatLike = field()
    C: MatLike = field()
    D: MatLike = field(default=None)
    R1: MatLike = field(default=None)  # stored as upper factor if constant
    R2: MatLike = field(default=None)
    d0: MvNormal = field(default=None)
    p: Any = field(default=None)
    alpha: Any = field(default=1.0)
    Ts: float = static_field(default=1.0)
    nx: int = static_field(default=-1)
    nu: int = static_field(default=-1)
    ny: int = static_field(default=-1)
    names: SignalNames = static_field(default=None)
    _factored: bool = static_field(default=False)

    def __post_init__(self):
        o = object.__setattr__
        o(self, "A", as_matspec(self.A))
        o(self, "B", as_matspec(self.B))
        o(self, "C", as_matspec(self.C))
        if isinstance(self.D, (int, float)) and self.D == 0:
            o(self, "D", None)
        else:
            o(self, "D", as_matspec(self.D))
        if not self._factored:
            # Factor constant covariances exactly once.
            if self.d0 is None:
                if callable(self.R1):
                    raise ValueError("d0 must be provided when R1 is not a matrix")
                o(self, "d0", as_mvnormal(jnp.asarray(self.R1)))
            else:
                o(self, "d0", as_mvnormal(self.d0))
            if not callable(self.R1):
                o(self, "R1", _upper_factor(self.R1))
            else:
                o(self, "R1", as_matspec(self.R1))
            if not callable(self.R2):
                o(self, "R2", _upper_factor(self.R2))
            else:
                o(self, "R2", as_matspec(self.R2))
            o(self, "_factored", True)
        nx, nu, ny = self.nx, self.nu, self.ny
        if nx < 0:
            nx = self.d0.dim
        if nu < 0 and isinstance(self.B, jax.Array):
            nu = self.B.shape[-1]
        if ny < 0 and isinstance(self.C, jax.Array):
            ny = self.C.shape[-2]
        o(self, "nx", nx)
        o(self, "nu", nu)
        o(self, "ny", ny)
        if self.names is None:
            o(self, "names", default_names(nx, max(nu, 0), max(ny, 0), "SqKF"))

    # ------------------------------------------------------------------
    def covariance(self, state):
        return state.U.T @ state.U

    def init(self, key=None) -> SqKFState:
        return SqKFState(
            x=self.d0.mean,
            U=_upper_factor(self.d0.cov),
            t=jnp.asarray(0, jnp.int32),
        )

    def predict(self, state: SqKFState, u=None, p=None, t=None, R1=None, alpha=None):
        p = self.p if p is None else p
        t = state.t * self.Ts if t is None else t
        At = resolve_mat(self.A, state.x, u, p, t)
        Bt = resolve_mat(self.B, state.x, u, p, t)
        U1 = resolve_mat(self.R1, state.x, u, p, t) if R1 is None else R1
        a = self.alpha if alpha is None else alpha
        x = At @ state.x
        if u is not None and Bt is not None and jnp.size(u):
            x = x + Bt @ jnp.asarray(u)
        U = sqkf_predict_factor(state.U, At, U1, a)
        return SqKFState(x=x, U=U, t=state.t + 1)

    def correct(self, state: SqKFState, u, y, p=None, t=None, R2=None, mm=None):
        p = self.p if p is None else p
        t = state.t * self.Ts if t is None else t
        if mm is not None:
            raise NotImplementedError(
                "square-root filters use their built-in measurement update"
            )
        Ct = resolve_mat(self.C, state.x, u, p, t)
        Dt = resolve_mat(self.D, state.x, u, p, t)
        U2 = resolve_mat(self.R2, state.x, u, p, t) if R2 is None else R2
        e = jnp.asarray(y) - Ct @ state.x
        if Dt is not None and u is not None and jnp.size(u):
            e = e - Dt @ jnp.asarray(u)
        x, U, info = sqkf_correct_factor(state.x, state.U, Ct, e, U2)
        return SqKFState(x=x, U=U, t=state.t), info

    # -- simulation hooks (sq_kalman.jl:82-84) ---------------------------
    def sample_initial(self, key, p=None, noise=True):
        return self.d0.sample(key) if noise else self.d0.mean

    def sample_state(self, key, x, u, p=None, t=0, noise=True):
        At = resolve_mat(self.A, x, u, p, t)
        Bt = resolve_mat(self.B, x, u, p, t)
        xn = At @ x
        if u is not None and Bt is not None and jnp.size(u):
            xn = xn + Bt @ jnp.asarray(u)
        if noise:
            U1 = resolve_mat(self.R1, x, u, p, t)
            xn = xn + U1.T @ jax.random.normal(key, (self.nx,), dtype=xn.dtype)
        return xn

    def sample_measurement(self, key, x, u, p=None, t=0, noise=True):
        Ct = resolve_mat(self.C, x, u, p, t)
        Dt = resolve_mat(self.D, x, u, p, t)
        y = Ct @ x
        if u is not None and Dt is not None and jnp.size(u):
            y = y + Dt @ jnp.asarray(u)
        if noise:
            U2 = resolve_mat(self.R2, x, u, p, t)
            y = y + U2.T @ jax.random.normal(key, (self.ny,), dtype=y.dtype)
        return y


@struct
class SqExtendedKalmanFilter(AbstractKalmanFilter):
    """Square-root EKF (sq_ekf.jl): linearized dynamics/measurement with
    QR covariance-factor updates."""

    dynamics: Callable = static_field()
    measurement_model: Any = field()
    R1: MatLike = field(default=None)  # upper factor if constant
    d0: MvNormal = field(default=None)
    p: Any = field(default=None)
    alpha: Any = field(default=1.0)
    Ajac: Optional[Callable] = static_field(default=None)
    Ts: float = static_field(default=1.0)
    nu: int = static_field(default=-1)
    ny: int = static_field(default=-1)
    names: SignalNames = static_field(default=None)
    _factored: bool = static_field(default=False)

    def __post_init__(self):
        o = object.__setattr__
        if not self._factored:
            if self.d0 is None:
                o(self, "d0", as_mvnormal(jnp.asarray(self.R1)))
            else:
                o(self, "d0", as_mvnormal(self.d0))
            if not callable(self.R1):
                o(self, "R1", _upper_factor(self.R1))
            else:
                o(self, "R1", as_matspec(self.R1))
            o(self, "_factored", True)
        ny = self.ny
        if ny < 0:
            ny = getattr(self.measurement_model, "ny", -1)
        o(self, "ny", ny)
        if self.names is None:
            o(self, "names", default_names(self.d0.dim, max(self.nu, 0), max(ny, 0), "SqEKF"))

    @property
    def nx(self) -> int:
        return self.d0.dim

    def _Ajac(self, x, u, p, t):
        if self.Ajac is not None:
            return self.Ajac(x, u, p, t)
        return jax.jacfwd(lambda xi: self.dynamics(xi, u, p, t))(x)

    def _Cjac(self, x, u, p, t):
        mm = self.measurement_model
        if getattr(mm, "Cjac", None) is not None:
            return mm.Cjac(x, u, p, t)
        return jax.jacfwd(lambda xi: mm.measurement(xi, u, p, t))(x)

    def covariance(self, state):
        return state.U.T @ state.U

    def init(self, key=None) -> SqKFState:
        return SqKFState(
            x=self.d0.mean, U=_upper_factor(self.d0.cov), t=jnp.asarray(0, jnp.int32)
        )

    def predict(self, state: SqKFState, u=None, p=None, t=None, R1=None, alpha=None):
        p = self.p if p is None else p
        t = state.t * self.Ts if t is None else t
        A = self._Ajac(state.x, u, p, t)
        U1 = resolve_mat(self.R1, state.x, u, p, t) if R1 is None else R1
        a = self.alpha if alpha is None else alpha
        x = self.dynamics(state.x, u, p, t)
        U = sqkf_predict_factor(state.U, A, U1, a)
        return SqKFState(x=x, U=U, t=state.t + 1)

    def correct(self, state: SqKFState, u, y, p=None, t=None, R2=None, mm=None):
        p = self.p if p is None else p
        t = state.t * self.Ts if t is None else t
        model = self.measurement_model if mm is None else mm
        C = self._Cjac(state.x, u, p, t)
        # The model's R2 is a full covariance (EKFMeasurementModel); factor
        # it here — XLA hoists the factorization of a constant out of the
        # scan.  An explicitly passed R2 must already be an upper factor
        # (the reference's convention, sq_ekf.jl:219-222).
        U2 = _upper_factor(resolve_mat(model.R2, state.x, u, p, t)) if R2 is None else R2
        e = jnp.asarray(y) - model.measurement(state.x, u, p, t)
        x, U, info = sqkf_correct_factor(state.x, state.U, C, e, U2)
        return SqKFState(x=x, U=U, t=state.t), info

    def smooth(self, u, y, p=None, sol=None, **kwargs):
        """Square-root RTS smoother (sq_ekf.jl:254-296) — operates on the
        full covariances stored in the solution, re-linearizing A at the
        smoothed point like the EKF smoother."""
        from ..filters.ekf import ExtendedKalmanFilter

        proxy = ExtendedKalmanFilter(
            dynamics=self.dynamics,
            measurement_model=self.measurement_model,
            R1=jnp.eye(self.nx),
            d0=self.d0,
            p=self.p,
            Ajac=self.Ajac,
            Ts=self.Ts,
            nu=self.nu,
            ny=self.ny,
        )
        from ..trajectory import forward_trajectory

        p = self.p if p is None else p
        if sol is None:
            sol = forward_trajectory(self, u, y, p, **kwargs)
        return proxy.smooth(u, y, p, sol=sol)

    def sample_initial(self, key, p=None, noise=True):
        return self.d0.sample(key) if noise else self.d0.mean

    def sample_state(self, key, x, u, p=None, t=0, noise=True):
        xn = self.dynamics(x, u, p, t)
        if noise:
            U1 = resolve_mat(self.R1, x, u, p, t)
            xn = xn + U1.T @ jax.random.normal(key, x.shape, dtype=xn.dtype)
        return xn

    def sample_measurement(self, key, x, u, p=None, t=0, noise=True):
        mm = self.measurement_model
        y = mm.measurement(x, u, p, t)
        if noise:
            R2 = resolve_mat(mm.R2, x, u, p, t)
            y = y + as_mvnormal(R2).sample(key)
        return y


def make_sqekf(dynamics, measurement, R1, R2, d0=None, *, Cjac=None, **kwargs):
    """Convenience constructor (sq_ekf.jl:81-87)."""
    R2a = jnp.asarray(R2) if not callable(R2) else R2
    mm = EKFMeasurementModel(
        measurement=measurement,
        R2=R2a,
        Cjac=Cjac,
        ny=R2a.shape[-1] if isinstance(R2a, jax.Array) else -1,
    )
    return SqExtendedKalmanFilter(
        dynamics=dynamics, measurement_model=mm, R1=R1, d0=d0, **kwargs
    )
