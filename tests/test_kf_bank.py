"""Shared-Riccati KF bank (filters/bank.py) vs the vmapped oracle.

The bank path computes the data-independent covariance/gain recursion
once and advances all lane means with bank-major matmuls; every output
must match `vmap(forward_trajectory)` / `vmap(loglik)` over the same
shared filter (filtering.jl:52-128 semantics) to fp tolerance.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lowlevelparticlefilters_jl_tpu as llpf
from lowlevelparticlefilters_jl_tpu.filters.bank import (
    kf_bank_admissible, kf_bank_forward, kf_bank_loglik)

A = jnp.array([[0.97, -0.1], [0.1, 0.97]])
B = jnp.array([[0.1], [0.0]])
C = jnp.array([[1.0, 0.0], [0.2, 1.0]])
D = jnp.array([[0.05], [0.0]])
R1 = 0.01 * jnp.eye(2)
R2 = 0.1 * jnp.eye(2)
Bk, T = 7, 23


def _data(key=0, nu=1, ny=2):
    ku, ky = jax.random.split(jax.random.PRNGKey(key))
    us = 0.3 * jax.random.normal(ku, (Bk, T, nu))
    ys = jax.random.normal(ky, (Bk, T, ny))
    return us, ys


def _oracle_ll(kf, us, ys):
    return jax.vmap(lambda u, y: llpf.loglik(kf, u, y))(us, ys)


@pytest.mark.parametrize("case", ["plain", "feedthrough", "r12", "alpha",
                                  "timevarying", "no_input"])
def test_bank_loglik_matches_vmap(case):
    kw = dict(d0=llpf.MvNormal(jnp.array([0.1, -0.2]), 0.5 * jnp.eye(2)))
    us, ys = _data()
    if case == "plain":
        kf = llpf.KalmanFilter(A, B, C, 0, R1, R2, **kw)
    elif case == "feedthrough":
        kf = llpf.KalmanFilter(A, B, C, D, R1, R2, **kw)
    elif case == "r12":
        kf = llpf.KalmanFilter(A, B, C, 0, R1, R2,
                               R12=0.02 * jnp.ones((2, 2)), **kw)
    elif case == "alpha":
        kf = llpf.KalmanFilter(A, B, C, 0, R1, R2, alpha=1.05, **kw)
    elif case == "timevarying":
        As = jnp.stack([A * (1.0 - 0.002 * k) for k in range(T)])
        kf = llpf.KalmanFilter(As, B, C, 0, R1, R2, nx=2, **kw)
    elif case == "no_input":
        kf = llpf.KalmanFilter(A, jnp.zeros((2, 0)), C, 0, R1, R2,
                               nu=0, **kw)
        us = None
    assert kf_bank_admissible(kf)
    ll = kf_bank_loglik(kf, us, ys)
    if us is None:
        ll_o = jax.vmap(lambda y: llpf.loglik(kf, None, y))(ys)
    else:
        ll_o = _oracle_ll(kf, us, ys)
    np.testing.assert_allclose(np.asarray(ll), np.asarray(ll_o),
                               rtol=1e-8)


def test_bank_shared_u_broadcast():
    kf = llpf.KalmanFilter(A, B, C, 0, R1, R2)
    us, ys = _data()
    u_shared = us[0]
    ll = kf_bank_loglik(kf, u_shared, ys)
    ll_o = jax.vmap(lambda y: llpf.loglik(kf, u_shared, y))(ys)
    np.testing.assert_allclose(np.asarray(ll), np.asarray(ll_o),
                               rtol=1e-8)


def test_bank_forward_matches_vmap_trajectory():
    kf = llpf.KalmanFilter(A, B, C, D, R1, R2,
                           d0=llpf.MvNormal(jnp.zeros(2), jnp.eye(2)))
    us, ys = _data()
    sol = kf_bank_forward(kf, us, ys)
    osol = jax.vmap(lambda u, y: llpf.forward_trajectory(kf, u, y))(us, ys)
    np.testing.assert_allclose(np.asarray(sol.x), np.asarray(osol.x),
                               rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(sol.xt), np.asarray(osol.xt),
                               rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(sol.e), np.asarray(osol.e),
                               rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(sol.ll), np.asarray(osol.ll),
                               rtol=1e-8)
    # shared covariances equal every lane's
    np.testing.assert_allclose(np.asarray(sol.R), np.asarray(osol.R[0]),
                               rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(np.asarray(sol.Rt), np.asarray(osol.Rt[0]),
                               rtol=1e-8, atol=1e-12)


def test_bank_fallback_for_callable_matrices():
    kf = llpf.KalmanFilter(lambda x, u, p, t: A, B, C, 0, R1, R2,
                           nx=2, d0=llpf.MvNormal(jnp.zeros(2), jnp.eye(2)))
    assert not kf_bank_admissible(kf)
    us, ys = _data()
    ll = kf_bank_loglik(kf, us, ys)         # silent vmap fallback
    np.testing.assert_allclose(np.asarray(ll),
                               np.asarray(_oracle_ll(kf, us, ys)),
                               rtol=1e-8)
    with pytest.raises(ValueError, match="shared-Riccati"):
        kf_bank_forward(kf, us, ys)


def test_ukf_bank_affine_routes_to_kf_bank():
    """UKF bank on an affine model: the UT linearization is exact, so
    the routed shared-Riccati result must equal vmap(ukf loglik)."""
    ukf = llpf.make_ukf(
        lambda x, u, p, t: A @ x + B @ u + 0.01,
        lambda x, u, p, t: C @ x - 0.02,
        R1, R2, ny=2, nu=1,
        d0=llpf.MvNormal(jnp.zeros(2), jnp.eye(2)))
    us, ys = _data()
    ll = llpf.ukf_bank_loglik(ukf, us, ys)
    want = jax.vmap(lambda u, y: llpf.loglik(ukf, u, y))(us, ys)
    np.testing.assert_allclose(np.asarray(ll), np.asarray(want),
                               rtol=1e-6, atol=1e-8)


def test_ukf_bank_nonlinear_falls_back_to_vmap():
    ukf = llpf.make_ukf(
        lambda x, u, p, t: A @ x + 0.05 * jnp.sin(x) + B @ u,
        lambda x, u, p, t: C @ x,
        R1, R2, ny=2, nu=1,
        d0=llpf.MvNormal(jnp.zeros(2), jnp.eye(2)))
    us, ys = _data()
    ll = llpf.ukf_bank_loglik(ukf, us, ys)
    want = jax.vmap(lambda u, y: llpf.loglik(ukf, u, y))(us, ys)
    np.testing.assert_allclose(np.asarray(ll), np.asarray(want),
                               rtol=1e-10)


def test_ekf_bank_affine_alias():
    ekf = llpf.make_ekf(
        lambda x, u, p, t: A @ x + B @ u,
        lambda x, u, p, t: C @ x,
        R1, R2, nu=1, ny=2,
        d0=llpf.MvNormal(jnp.zeros(2), jnp.eye(2)))
    us, ys = _data()
    ll = llpf.ekf_bank_loglik(ekf, us, ys)
    want = jax.vmap(lambda u, y: llpf.loglik(ekf, u, y))(us, ys)
    np.testing.assert_allclose(np.asarray(ll), np.asarray(want),
                               rtol=1e-6, atol=1e-8)
