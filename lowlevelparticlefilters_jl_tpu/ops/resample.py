"""Particle resampling — systematic / stratified / residual / multinomial.

TPU-native re-design of /root/reference/src/resample.jl.  The reference walks
the CDF with a sequential two-pointer loop (resample.jl:17-36); on TPU the
same algorithm is a parallel prefix-sum (`jnp.cumsum`, which XLA lowers to a
log-depth scan) followed by a vectorized `searchsorted` binary search — both
map onto the VPU with no sequential dependence on N.  A fused Pallas kernel
for the N >= 1e5 regime lives in ``ops/pallas/resample_kernel.py``.

All resamplers are shape-static and `lax.cond`/`scan`-compatible: they take a
PRNG key and return an int32 index vector ``j`` of length M.
"""
from __future__ import annotations

from typing import Literal

import jax
import jax.numpy as jnp

ResamplingStrategy = Literal["systematic", "stratified", "residual", "multinomial"]


def resample_systematic(we: jax.Array, key: jax.Array, M: int | None = None) -> jax.Array:
    """Systematic resampling (resample.jl:17-36).

    One shared uniform offset; ``u_i = (r + i) / M`` swept across the
    normalized CDF.  Matches the reference's convention ``r ~ U(0, 1/M)``
    scaled by the total weight.
    """
    N = we.shape[-1]
    M = N if M is None else M
    bins = jnp.cumsum(we, axis=-1)
    total = bins[..., -1]
    r = jax.random.uniform(key, (), dtype=we.dtype)
    u = (r + jnp.arange(M, dtype=we.dtype)) / M * total
    j = jnp.searchsorted(bins, u, side="right")
    return jnp.clip(j, 0, N - 1).astype(jnp.int32)


def resample_stratified(we: jax.Array, key: jax.Array, M: int | None = None) -> jax.Array:
    """Stratified resampling (resample.jl:38-61): one uniform per stratum."""
    N = we.shape[-1]
    M = N if M is None else M
    bins = jnp.cumsum(we, axis=-1)
    total = bins[..., -1]
    r = jax.random.uniform(key, (M,), dtype=we.dtype)
    u = (jnp.arange(M, dtype=we.dtype) + r) / M * total
    j = jnp.searchsorted(bins, u, side="right")
    return jnp.clip(j, 0, N - 1).astype(jnp.int32)


def resample_multinomial(we: jax.Array, key: jax.Array, M: int | None = None) -> jax.Array:
    """i.i.d. categorical draws (the `draw_one_categorical` analogue)."""
    N = we.shape[-1]
    M = N if M is None else M
    logw = jnp.log(jnp.maximum(we, jnp.finfo(we.dtype).tiny))
    return jax.random.categorical(key, logw, shape=(M,)).astype(jnp.int32)


def resample_residual(we: jax.Array, key: jax.Array, M: int | None = None) -> jax.Array:
    """Residual resampling (resample.jl:63-117), shape-static formulation.

    Deterministic copies ``floor(M * we_i)`` are emitted via a prefix-sum +
    searchsorted (instead of the reference's sequential fill loop); the
    remaining slots are multinomial draws from the residual weights.  Slot
    selection between the two parts is a `where` on the slot index, keeping
    every shape static for XLA.
    """
    N = we.shape[-1]
    M = N if M is None else M
    wsum = jnp.sum(we, axis=-1)
    nw = we / wsum * M
    cnt = jnp.floor(nw)
    resid = nw - cnt
    num_det = jnp.sum(cnt).astype(jnp.int32)

    # Deterministic part: slot m (< num_det) gets the particle whose
    # cumulative count first exceeds m.
    ccnt = jnp.cumsum(cnt, axis=-1)
    slots = jnp.arange(M, dtype=ccnt.dtype)
    j_det = jnp.searchsorted(ccnt, slots, side="right")

    # Residual part: categorical draws from normalized residuals.
    rsum = jnp.sum(resid, axis=-1)
    rbins = jnp.cumsum(resid / jnp.maximum(rsum, jnp.finfo(we.dtype).tiny), axis=-1)
    u = jax.random.uniform(key, (M,), dtype=we.dtype)
    j_res = jnp.searchsorted(rbins, u, side="right")

    j = jnp.where(slots < num_det, j_det, j_res)
    return jnp.clip(j, 0, N - 1).astype(jnp.int32)


_RESAMPLERS = {
    "systematic": resample_systematic,
    "stratified": resample_stratified,
    "residual": resample_residual,
    "multinomial": resample_multinomial,
}


def resample(we: jax.Array, key: jax.Array, M: int | None = None,
             strategy: ResamplingStrategy = "systematic") -> jax.Array:
    """Dispatch on the (static) strategy name (resample.jl:12-15)."""
    try:
        fn = _RESAMPLERS[strategy]
    except KeyError:
        raise ValueError(f"unknown resampling strategy {strategy!r}") from None
    return fn(we, key, M)


def draw_one_categorical(key: jax.Array, logw: jax.Array) -> jax.Array:
    """Single categorical draw from log-weights (resample.jl:128-152)."""
    return jax.random.categorical(key, logw)
