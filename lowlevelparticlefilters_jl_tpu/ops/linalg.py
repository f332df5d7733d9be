"""Small dense linear-algebra helpers shared by all filters.

These mirror the reference's numeric kernels: `symmetrize`
(/root/reference/src/filtering.jl:76-87), Cholesky-based innovation solves
(filtering.jl:118-126), and PSD repair (`symmetrize_psd`, kalman.jl:218-224).
All are rank-polymorphic over leading batch axes so `vmap` over particles /
sigma points / filter banks is free.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def symmetrize(X: jax.Array) -> jax.Array:
    """0.5 (X + X^T) over the trailing two axes (filtering.jl:76-87)."""
    return 0.5 * (X + jnp.swapaxes(X, -1, -2))


def symmetrize_psd(X: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Symmetrize and clip tiny negative eigenvalues (kalman.jl:218-224)."""
    S = symmetrize(X)
    vals, vecs = jnp.linalg.eigh(S)
    vals = jnp.maximum(vals, eps)
    return (vecs * vals[..., None, :]) @ jnp.swapaxes(vecs, -1, -2)


def chol_lower(S: jax.Array) -> jax.Array:
    """Lower Cholesky factor of a symmetric matrix.

    Under jit we cannot raise like the reference does on factorization
    failure (filtering.jl:113); failure produces NaNs that propagate into
    the solution's validity (see `KalmanFilteringSolution.ok`).
    """
    return jnp.linalg.cholesky(symmetrize(S))


def chol_solve(L: jax.Array, B: jax.Array) -> jax.Array:
    """Solve (L L^T) X = B given lower Cholesky factor L."""
    y = jax.scipy.linalg.solve_triangular(L, B, lower=True)
    return jax.scipy.linalg.solve_triangular(L.mT if hasattr(L, "mT") else jnp.swapaxes(L, -1, -2), y, lower=False)


def rdiv_chol(B: jax.Array, L: jax.Array) -> jax.Array:
    """Compute B (L L^T)^{-1} — the reference's `B / Schol` idiom."""
    return jnp.swapaxes(chol_solve(L, jnp.swapaxes(B, -1, -2)), -1, -2)


def logdet_chol(L: jax.Array) -> jax.Array:
    """log det(L L^T) = 2 sum(log diag L)."""
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)


def positive_qr_r(X: jax.Array) -> jax.Array:
    """Upper-triangular R of a QR factorization with positive diagonal.

    The square-root Kalman filter stores covariance as an upper-triangular
    Cholesky factor obtained by QR (sq_kalman.jl:104-159); the reference's
    `signdet!` (sq_kalman.jl:161-177) enforces a positive diagonal so that
    downstream logdets are well defined. Here we flip row signs of R.
    """
    R = jnp.linalg.qr(X, mode="r")
    d = jnp.sign(jnp.diagonal(R, axis1=-2, axis2=-1))
    d = jnp.where(d == 0, 1.0, d)
    return R * d[..., :, None]


def blkdiag(*mats: jax.Array) -> jax.Array:
    """Block-diagonal concatenation (used by augmented sigma points)."""
    n = sum(m.shape[-1] for m in mats)
    dtype = jnp.result_type(*mats)
    out = jnp.zeros((*mats[0].shape[:-2], n, n), dtype=dtype)
    i = 0
    for m in mats:
        k = m.shape[-1]
        out = out.at[..., i : i + k, i : i + k].set(m)
        i += k
    return out
