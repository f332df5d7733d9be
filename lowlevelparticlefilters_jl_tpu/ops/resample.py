"""Particle resampling — systematic / stratified / residual / multinomial.

TPU-native re-design of /root/reference/src/resample.jl.  The reference walks
the CDF with a sequential two-pointer loop (resample.jl:17-36); on TPU the
same algorithm is a parallel prefix-sum (`jnp.cumsum`, which XLA lowers to a
log-depth scan) followed by a vectorized `searchsorted` binary search — both
map onto the VPU with no sequential dependence on N.  The production fused
kernel for the N >= 32768 regime is ``ops/pallas/resample_v2.py`` (index +
gather in one pallas call, ~224 µs at N=1e5 on v5e, bitwise exact), with
``ops/pallas/resample_route.py`` extending admission past its VMEM envelope.

All resamplers are shape-static and `lax.cond`/`scan`-compatible: they take a
PRNG key and return an int32 index vector ``j`` of length M.
"""
from __future__ import annotations

from typing import Literal

import jax
import jax.numpy as jnp

ResamplingStrategy = Literal["systematic", "stratified", "residual", "multinomial"]


def _systematic_slots(we: jax.Array, key: jax.Array, M: int) -> jax.Array:
    """Per-particle first output slot for systematic resampling.

    With query points ``u_k = (r + k)/M * total`` (resample.jl:26-28),
    particle i's offspring occupy output slots ``[K_{i-1}, K_i)`` where
    ``K_i = ceil(cdf_i * M / total - r)``.  Everything downstream
    (indices, fused gather) derives from K with *no binary search* —
    `jnp.searchsorted` lowers to an O(log N) gather loop that costs
    ~10 ms at N=1e5 on TPU, while this closed form is a cumsum + a
    scatter (~1 µs).  Ties at CDF boundaries may resolve one index off
    from a literal searchsorted (fp rounding); both are valid samplers.

    K is forced non-decreasing with a running max: XLA's log-depth f32
    cumsum is NOT monotone under rounding (adjacent prefixes use
    different tree groupings), and with heavily skewed weights at
    N >= 1e4 the raw K dips by 1 in places.  Every downstream
    formulation (count matmul, scatter histogram, the pallas
    routing/window kernels) assumes sorted K — a dip silently breaks
    their mutual bitwise equality (measured: ~10 mismatched slots at
    N=1e5, we ~ U^20).  The cummax repairs the artifact; the
    exact-arithmetic sampler is unchanged.
    """
    bins = jnp.cumsum(we, axis=-1)
    total = bins[..., -1]
    r = jax.random.uniform(key, (), dtype=we.dtype)
    K = jnp.ceil(bins * M / total - r).astype(jnp.int32)
    K = jax.lax.cummax(K, axis=K.ndim - 1)
    return jnp.clip(K, 0, M)


_L = 128  # lane-width block for the two-level matmul formulation


def _systematic_j_exact(we: jax.Array, key: jax.Array, M: int) -> jax.Array:
    """Counting-sort via scatter histogram + prefix sum (exact for any
    weight profile / any M; ~880 us at N=1e5 — TPU scatters serialize at
    ~8.8 ns per update element, so this is the any-M fallback, not the
    hot path)."""
    N = we.shape[-1]
    K = _systematic_slots(we, key, M)
    hist = jnp.zeros((M + 1,), jnp.int32).at[K].add(1)
    j = jnp.cumsum(hist)[:-1]
    return jnp.clip(j, 0, N - 1).astype(jnp.int32)


def _systematic_j_matmul(we: jax.Array, key: jax.Array) -> jax.Array:
    """Systematic-resampling indices as one MXU matmul (M == N).

    ``j_k = #{i : K_i <= k}`` decomposes over slot blocks ``k = b*L + l``:

        j[b, l] = #{i : q_i < b}  +  Σ_i 1[q_i == b] · 1[r_i <= l],

    with ``q_i = K_i // L``, ``r_i = K_i mod L``.  The second term is a
    [NB, N] × [N, L] matmul of a block one-hot against remainder step
    functions — dense MXU work with NO skew assumption, no scatter, no
    searchsorted, no sort.  Honest v5e cost at N=1e5 (T-slope): ~355 us
    vs ~880 us for the scatter histogram and 2.2+ ms for searchsorted.
    Exactness: 0/1 and small-count values are exact in bf16.
    """
    N = we.shape[-1]
    NB = (N + _L - 1) // _L
    K = _systematic_slots(we, key, N)  # [N] sorted slot boundaries in [0, N]
    q = K // _L
    r = K - q * _L
    oh = (q[:, None] == jax.lax.broadcasted_iota(jnp.int32, (N, NB + 1), 1)
          ).astype(jnp.bfloat16)
    st = (r[:, None] <= jax.lax.broadcasted_iota(jnp.int32, (N, _L), 1)
          ).astype(jnp.bfloat16)
    inner = jax.lax.dot_general(
        oh, st, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [NB+1, L] — counts ≤ N, exact in f32 accumulation
    blockcnt = jnp.sum(oh, axis=0, dtype=jnp.float32)  # [NB+1]
    CC = jnp.cumsum(blockcnt) - blockcnt                # exclusive prefix
    j = (CC[:NB, None] + inner[:NB]).reshape(NB * _L)[:N]
    return jnp.clip(j.astype(jnp.int32), 0, N - 1)


def resample_systematic(we: jax.Array, key: jax.Array, M: int | None = None) -> jax.Array:
    """Systematic resampling (resample.jl:17-36), TPU-native.

    M == N (the filtering hot path) uses the two-level matmul formulation
    (:func:`_systematic_j_matmul`); other M fall back to the counting
    sort.  Both derive indices from the same ``K`` slot boundaries, so
    they sample the identical systematic stream.
    """
    N = we.shape[-1]
    M = N if M is None else M
    # The matmul path materializes an [N, N/128] one-hot (O(N^2/128)
    # bytes) — a win up to a few 1e5 particles; beyond that the linear
    # scatter path is the lesser evil.
    if M == N and N <= (1 << 18):
        return _systematic_j_matmul(we, key)
    return _systematic_j_exact(we, key, M)


_KERNEL_MIN_N = 1 << 15  # below this the XLA path wins (kernel pads to 8192)
_KERNEL_VMEM_BUDGET = 12 << 20  # bytes of VMEM for the kernel's scratch


def _kernel_fits(N: int, nx: int) -> bool:
    """Perf + VMEM admission for the fused kernel.

    Perf: the kernel's gather work scales LINEARLY in nx (9 masked MXU
    dots per dimension per window) while XLA's row gather amortizes row
    width, so the kernel only wins for narrow states.  v5e T-slope
    measurements (2026-08, this repo): nx=2 → 2.7×/2.1× faster
    (N=1e5/32768), nx=4 → 1.5×, nx=6 → 0.96×, nx=8 → 0.84×/0.51×.
    Crossover ≈ nx 5; admit nx ≤ 4.

    VMEM: persistent scratch ``(nx+1)×Rpad×128`` f32 (acc + inner) +
    output blocks + streamed inputs + ~2.5 MB of mask intermediates must
    stay under the scoped budget — a Mosaic overflow is a hard compile
    error, not a fallback (bounds N ≲ 3e5 at nx=4)."""
    if nx > 4:
        return False
    from .pallas.resample_v2 import CHUNK, W

    Rout = -(-N // 128)
    Rout_pad = -(-Rout // 128) * 128
    Rpad = Rout_pad + ((W + 127) // 128 + 1) * 128
    scratch = (nx + 1) * Rpad * 128 * 4
    outblk = (nx + 1) * Rout_pad * 128 * 4
    inblk = 2 * nx * 8 * CHUNK * 4
    return scratch + outblk + inblk + (5 << 19) <= _KERNEL_VMEM_BUDGET


def resample_systematic_gather(x: jax.Array, we: jax.Array, key: jax.Array) -> jax.Array:
    """Fused systematic resample + particle gather: ``x[resample(we)]``.

    On TPU at N >= 32768 (nx <= 4) this runs as ONE pallas kernel —
    preferred: the monotone log-shift routing kernel
    (ops/pallas/resample_route.py, ~150 µs at N=1e5/nx=2 on v5e with
    skewed weights) — vs ~610 µs for the XLA formulation (index matmul
    ~260-360 µs + row gather ~240-330 µs, which serializes); the
    windowed-MXU kernel (ops/pallas/resample_v2.py, ~360 µs) remains as
    the fallback where routing exceeds its VMEM envelope.  Everywhere
    else: matmul-formulated indices (:func:`_systematic_j_matmul`) +
    one row take.  ALL paths are exact and bitwise IDENTICAL to
    ``x[resample_systematic(we)]`` — same K slot boundaries, and the
    kernels select (never approximate) particle values.
    """
    N = we.shape[-1]
    # The kernels compute in f32 (v2's bf16 hi/mid/lo splits cover a
    # 24-bit mantissa); f64 particles under jax x64 would silently lose
    # precision, so the bitwise contract gates admission on f32.
    if x.ndim == 2 and x.dtype == jnp.float32 and N >= _KERNEL_MIN_N:
        from .pallas.noise import _on_tpu

        # PREFERRED: the monotone log-shift routing kernel — after the
        # r4 packed-stage + dynamic-trip-count rework it beats the
        # windowed-MXU v2 kernel at every measured admitted config
        # (v5e, skewed weights: N=1e5 nx=2 150 vs 361 us, nx=4 317 vs
        # 366; N=32768 nx=2 32 vs 177, nx=4 14 vs 47).  Cost is linear
        # in nx (payload planes), so nx <= 4 stays the admission edge
        # vs the XLA matmul-index + row-take fallback.
        from .pallas.resample_route import (
            fused_systematic_gather_route, route_kernel_fits)

        if (_on_tpu() and x.shape[1] <= 4
                and route_kernel_fits(N, x.shape[1])):
            return fused_systematic_gather_route(x, we, key)
        if _on_tpu() and _kernel_fits(N, x.shape[1]):
            from .pallas.resample_v2 import fused_systematic_gather

            out, _ = fused_systematic_gather(x, we, key)
            return out.astype(x.dtype)
    j = resample_systematic(we, key)
    return jnp.take(x, j, axis=0)


def resample_stratified(we: jax.Array, key: jax.Array, M: int | None = None) -> jax.Array:
    """Stratified resampling (resample.jl:38-61): one uniform per stratum."""
    N = we.shape[-1]
    M = N if M is None else M
    bins = jnp.cumsum(we, axis=-1)
    total = bins[..., -1]
    r = jax.random.uniform(key, (M,), dtype=we.dtype)
    u = (jnp.arange(M, dtype=we.dtype) + r) / M * total
    j = jnp.searchsorted(bins, u, side="right", method="sort")
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
    j_det = jnp.searchsorted(ccnt, slots, side="right", method="sort")

    # Residual part: categorical draws from normalized residuals.
    rsum = jnp.sum(resid, axis=-1)
    rbins = jnp.cumsum(resid / jnp.maximum(rsum, jnp.finfo(we.dtype).tiny), axis=-1)
    u = jax.random.uniform(key, (M,), dtype=we.dtype)
    j_res = jnp.searchsorted(rbins, u, side="right", method="sort")

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
