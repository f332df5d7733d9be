"""Fused FFBS backward-pass kernel (ops/pallas/ffbs_kernel.py).

Off-TPU the kernel runs in interpret mode where the hardware PRNG is
stubbed to zero bits — the Gumbel perturbation becomes a constant, so
the kernel reduces to exact MAP (argmax) backward selection.  That makes
the selection math (whitened-centered weights, tie-break, one-hot
gather) deterministically testable against an XLA oracle; the
distributional behaviour of the hardware draws is covered by the
on-TPU statistical checks in the perf harness.
"""
import jax
import jax.numpy as jnp
import numpy as np

from lowlevelparticlefilters_jl_tpu.ops.pallas.ffbs_kernel import (
    ffbs_backward_pallas,
)


def _oracle_map(xpred, wf, xf, xb_T, L, mu):
    """Argmax backward selection with exact (f64-capable) arithmetic."""
    Tm1, N, nx = xpred.shape
    M = xb_T.shape[0]
    Sinv = np.linalg.inv(np.asarray(L) @ np.asarray(L).T)
    xb = [None] * (Tm1 + 1)
    xb[Tm1] = np.asarray(xb_T)
    for t in range(Tm1 - 1, -1, -1):
        d = (xb[t + 1][:, None, :] - np.asarray(mu)[None, None, :]
             - np.asarray(xpred[t])[None, :, :])          # [M, N, nx]
        quad = np.einsum("mni,ij,mnj->mn", d, Sinv, d)
        wb = np.asarray(wf[t])[None, :] - 0.5 * quad
        i = np.argmax(wb, axis=1)
        xb[t] = np.asarray(xf[t])[i]
    return np.stack(xb)


def test_interpret_map_selection_matches_oracle():
    T, N, M, nx = 12, 128, 64, 2
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    # particle clouds far from the origin — exercises the centering
    xf = 50.0 + jax.random.normal(k1, (T - 1, N, nx))
    xpred = 0.97 * xf + 0.1 * jax.random.normal(k2, (T - 1, N, nx))
    wf = jax.random.normal(k3, (T - 1, N))
    xb_T = 50.0 + jax.random.normal(k4, (M, nx))
    L = jnp.linalg.cholesky(jnp.array([[0.04, 0.01], [0.01, 0.09]]))
    mu = jnp.array([0.05, -0.02])

    out = np.asarray(ffbs_backward_pallas(
        xpred.astype(jnp.float32), wf.astype(jnp.float32),
        xf.astype(jnp.float32), xb_T.astype(jnp.float32), L, mu, 7))
    ref = _oracle_map(np.asarray(xpred), np.asarray(wf), np.asarray(xf),
                      np.asarray(xb_T, dtype=np.float32),
                      np.asarray(L), np.asarray(mu))
    assert out.shape == (T, M, nx)
    # terminal states pass through untouched
    np.testing.assert_array_equal(out[-1], np.asarray(xb_T, np.float32))
    # MAP selections are exact particle copies — require row-wise equality
    # for ≥99% of (t, m); the remainder must be near-ties of the argmax
    # (f32 whitened weights vs the f64 oracle).
    match = np.all(out[:-1] == ref[:-1].astype(np.float32), axis=-1)
    assert match.mean() > 0.99, match.mean()


def test_selected_rows_are_forward_particles():
    """Every backward state must be an exact copy of some forward
    particle at its step (the one-hot sum is a true gather)."""
    T, N, M, nx = 6, 128, 32, 3
    key = jax.random.PRNGKey(5)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    xf = jax.random.normal(k1, (T - 1, N, nx))
    xpred = xf + 0.05 * jax.random.normal(k2, (T - 1, N, nx))
    wf = 0.1 * jax.random.normal(k3, (T - 1, N))
    xb_T = jax.random.normal(k4, (M, nx))
    L = 0.3 * jnp.eye(nx)
    out = np.asarray(ffbs_backward_pallas(
        xpred.astype(jnp.float32), wf.astype(jnp.float32),
        xf.astype(jnp.float32), xb_T.astype(jnp.float32), L,
        jnp.zeros(nx), 3))
    for t in range(T - 1):
        cloud = np.asarray(xf[t], np.float32)
        for m in range(M):
            assert (out[t, m] == cloud).all(axis=-1).any(), (t, m)
