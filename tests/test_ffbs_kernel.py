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


def _oracle_map_chunked(xpred, wf, xf, xb_T, L, mu, nchunk=16):
    """N-chunked f64 MAP oracle (the [M, N] matrix would not fit at
    N=65536 in one piece)."""
    Tm1, N, nx = xpred.shape
    M = xb_T.shape[0]
    Linv = np.linalg.inv(np.asarray(L, np.float64))
    xb = [None] * (Tm1 + 1)
    xb[Tm1] = np.asarray(xb_T, np.float64)
    NC = -(-N // nchunk)
    for t in range(Tm1 - 1, -1, -1):
        zb = (xb[t + 1] - np.asarray(mu)) @ Linv.T        # [M, nx]
        best = np.full((M,), -np.inf)
        bi = np.zeros((M,), np.int64)
        for c in range(nchunk):
            sl = slice(c * NC, min((c + 1) * NC, N))
            zp = np.asarray(xpred[t][sl], np.float64) @ Linv.T
            wb = (np.asarray(wf[t][sl], np.float64)[None, :]
                  - 0.5 * (zp * zp).sum(-1)[None, :]
                  + zb @ zp.T - 0.5 * (zb * zb).sum(-1)[:, None])
            am = wb.argmax(axis=1)
            mx = wb[np.arange(M), am]
            upd = mx > best
            best = np.where(upd, mx, best)
            bi = np.where(upd, am + sl.start, bi)
        xb[t] = np.asarray(xf[t], np.float64)[bi]
    return np.stack(xb)


def test_chunked_sweep_matches_oracle():
    """M=1000, N=65536 forces the NC < Npad running-max chunk sweep
    (Mpad*Npad = 6.6e7 >> 2^22) — the SURVEY §5 cloud size (VERDICT r2
    missing #2).  MAP selections must match an f64 chunked oracle."""
    T, N, M, nx = 3, 65536, 1000, 2
    key = jax.random.PRNGKey(11)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    xf = 10.0 + jax.random.normal(k1, (T - 1, N, nx), jnp.float32)
    xpred = 0.97 * xf + 0.1 * jax.random.normal(k2, (T - 1, N, nx),
                                                jnp.float32)
    wf = jax.random.normal(k3, (T - 1, N), jnp.float32)
    xb_T = 10.0 + jax.random.normal(k4, (M, nx), jnp.float32)
    L = jnp.linalg.cholesky(jnp.array([[0.04, 0.01], [0.01, 0.09]],
                                      jnp.float32))
    mu = jnp.array([0.05, -0.02], jnp.float32)

    out = np.asarray(ffbs_backward_pallas(xpred, wf, xf, xb_T, L, mu, 13))
    ref = _oracle_map_chunked(np.asarray(xpred), np.asarray(wf),
                              np.asarray(xf), np.asarray(xb_T),
                              np.asarray(L), np.asarray(mu))
    assert out.shape == (T, M, nx)
    np.testing.assert_array_equal(out[-1], np.asarray(xb_T, np.float32))
    match = np.all(out[:-1] == ref[:-1].astype(np.float32), axis=-1)
    assert match.mean() > 0.99, match.mean()
    # every selection is an exact forward-particle copy
    cloud = np.asarray(xf[0], np.float32)
    sel = (out[0][:, None, :] == cloud[None, :, :]).all(-1).any(-1)
    assert sel.all()
