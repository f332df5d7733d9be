"""Parameter (`p`) threading tests, mirroring
/root/reference/test/test_parameters.jl: the SciML-style parameter object
stored on the filter flows into every dynamics/measurement call, and a
per-call override replaces it consistently through simulate /
forward_trajectory / loglik — plus the TPU-native extra: `p` is a pytree
leaf you can differentiate and vmap over.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lowlevelparticlefilters_jl_tpu as llpf

A = jnp.array([[0.99, 0.1], [0.0, 0.2]])
B = jnp.array([[0.3, -0.7], [0.9, 0.2]])


def dyn(x, u, p, t):
    return A @ x + B @ u + p


def meas(x, u, p, t):
    return x


@pytest.fixture(scope="module")
def filt():
    return llpf.make_ukf(dyn, meas, 0.01 * jnp.eye(2), jnp.eye(2),
                         d0=llpf.MvNormal(jnp.zeros(2), jnp.eye(2)),
                         nu=2, ny=2, p=1.0)


def test_stored_p_and_override(filt):
    """Filtering data generated with p=-1 only works when the override is
    passed (test_parameters.jl:27-33)."""
    us = jax.random.normal(jax.random.PRNGKey(0), (20, 2))
    x1, u1, y1 = llpf.simulate(filt, us, jax.random.PRNGKey(1))          # p=1
    x2, u2, y2 = llpf.simulate(filt, us, jax.random.PRNGKey(1), p=-1.0)  # p=-1
    # trajectories actually differ with the parameter
    assert float(jnp.max(jnp.abs(x1 - x2))) > 0.5

    ll_matched1 = float(llpf.loglik(filt, u1, y1))
    ll_matched2 = float(llpf.loglik(filt, u2, y2, p=-1.0))
    ll_mismatched = float(llpf.loglik(filt, u2, y2))  # wrong stored p=1
    assert ll_matched1 > -100
    assert ll_matched2 > -100
    assert ll_mismatched < ll_matched2  # fails if p isn't adjusted


def test_p_as_pytree(filt):
    """`p` may be an arbitrary pytree (dict) consumed by the callbacks."""
    def dyn_d(x, u, p, t):
        return A @ x + B @ u + p["bias"]

    ukf = llpf.make_ukf(dyn_d, meas, 0.01 * jnp.eye(2), jnp.eye(2),
                        d0=llpf.MvNormal(jnp.zeros(2), jnp.eye(2)),
                        nu=2, ny=2, p={"bias": jnp.array([0.5, -0.5])})
    us = jnp.zeros((15, 2))
    _, _, ys = llpf.simulate(ukf, us, jax.random.PRNGKey(2))
    sol = llpf.forward_trajectory(ukf, us, ys)
    assert np.isfinite(float(sol.ll))


def test_grad_wrt_p(filt):
    """Differentiate the loglik w.r.t. the parameter — the gradient-based
    parameter-estimation path the reference reaches via ForwardDiff."""
    us = jax.random.normal(jax.random.PRNGKey(3), (20, 2))
    _, u1, y1 = llpf.simulate(filt, us, jax.random.PRNGKey(4), p=0.3)

    nll = lambda p: -llpf.loglik(filt, u1, y1, p=p)
    g = jax.grad(nll)(0.0)
    assert np.isfinite(float(g))
    # the minimizer is near the generating value 0.3: gradient points down
    assert float(nll(0.3)) < float(nll(0.0))


def test_vmap_over_p(filt):
    """A bank of parameter hypotheses evaluated in one batched pass —
    the TPU-native replacement for parameter sweeps."""
    us = jax.random.normal(jax.random.PRNGKey(5), (15, 2))
    _, u1, y1 = llpf.simulate(filt, us, jax.random.PRNGKey(6), p=0.5)
    ps = jnp.linspace(-1.0, 1.5, 11)
    lls = jax.vmap(lambda p: llpf.loglik(filt, u1, y1, p=p))(ps)
    best = float(ps[jnp.argmax(lls)])
    assert abs(best - 0.5) <= 0.25  # grid resolution


def test_pytree_inputs():
    """Control inputs may be arbitrary pytrees (the reference allows any
    per-step u object, test_ukf.jl custom-u): `lax.scan` slices pytree xs
    natively, so dict-valued u flows through forward_trajectory/loglik."""
    def dyn_u(x, u, p, t):
        return A @ x + u["force"] * u["gain"]

    ukf = llpf.make_ukf(dyn_u, meas, 0.01 * jnp.eye(2), jnp.eye(2),
                        d0=llpf.MvNormal(jnp.zeros(2), jnp.eye(2)),
                        nu=2, ny=2)
    T = 15
    u_tree = {
        "force": jax.random.normal(jax.random.PRNGKey(7), (T, 2)),
        "gain": jnp.ones((T,)) * 0.5,
    }
    # matched flat-u filter as oracle
    def dyn_flat(x, u, p, t):
        return A @ x + 0.5 * u

    ukf_flat = llpf.make_ukf(dyn_flat, meas, 0.01 * jnp.eye(2), jnp.eye(2),
                             d0=llpf.MvNormal(jnp.zeros(2), jnp.eye(2)),
                             nu=2, ny=2)
    ys = jax.random.normal(jax.random.PRNGKey(8), (T, 2)) * 0.5
    sol_tree = llpf.forward_trajectory(ukf, u_tree, ys)
    sol_flat = llpf.forward_trajectory(ukf_flat, u_tree["force"], ys)
    np.testing.assert_allclose(
        np.asarray(sol_tree.xt), np.asarray(sol_flat.xt), atol=1e-10
    )
    ll = llpf.loglik(ukf, u_tree, ys)
    np.testing.assert_allclose(float(ll), float(sol_flat.ll), rtol=1e-10)
