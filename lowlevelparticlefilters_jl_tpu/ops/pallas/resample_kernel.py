"""Pallas TPU kernel: fully in-VMEM systematic resampling.

XLA's gather/scatter lowerings dominate the particle-filter step at
N >= 1e5 (~1 ms per executed resample on v5e, see docs/performance.md).
This kernel performs the whole systematic resample - weight CDF, slot
boundaries, and the monotone permutation - inside one `pallas_call`, with
no gather/scatter instructions at all.

Mosaic constraints shape the implementation: no dynamic_slice on values,
no lane-changing reshapes, no 1-D concatenates.  Everything therefore
lives in blocked 2-D form - the flat particle index ``i`` maps to
``(row, lane) = (i // 128, i % 128)`` of an ``[R, 128]`` array, and the
particle matrix is passed transposed-blocked as ``[nx, R, 128]``:

1. weight CDF: within-row inclusive prefix via a triangular MXU matmul,
   row/group offsets via two more matmuls (N padded to a multiple of
   128*128 so every level stays lane-aligned),
2. slot boundaries ``K_i = ceil(cdf_i*N - r)``; the output index function
   ``j_k = #{i : K_i <= k}`` is nondecreasing,
3. per output tile of 1024 slots, ``j`` is accumulated by comparing the
   tile's slot positions against K *chunks* ([8,128] at a time, as
   [8,128,128] broadcast compares); since K is sorted, a `while_loop`
   visits only the chunks that overlap the tile (amortized ~1 per tile),
4. the row movement ``out[k] = x[j_k]`` is a masked sum over source
   chunks: ``out_d = sum_lane (j == i_vals) * x_d`` - again [8,128,128]
   broadcasts, again amortized ~1 chunk per tile by monotonicity.

Ties: the tree-structured f32 CDF differs from a sequential cumsum by
rounding, so a few slots per 1e4 may resolve to the neighboring particle
versus the XLA reference - statistically immaterial (both are valid
systematic resamples of an eps-perturbed CDF).

STATUS (2026-08-16, v5e, round 2): compiles and runs on hardware but is
SUPERSEDED twice over — first by the pure-XLA matmul-index formulation in
`ops/resample.py` (`_systematic_j_matmul`, ~355 us + one ~200 us row take
at N=1e5 vs this kernel's ~2.0 ms — its [8,128,128] broadcast compares
are VPU-bound), then by the production v2 kernel
(`ops/pallas/resample_v2.py`: windowed MXU one-hot contractions, ~224 us
at N=1e5, bitwise exact, auto-selected by `resample_systematic_gather`).
Kept for its in-VMEM prefix-sum CDF machinery and as a negative result.
Round-2 honest measurements (T-slope; the round-1 numbers cited below
were polluted by the ~27 ms relay RPC): XLA scatter-histogram path
~880 us, searchsorted 2.2+ ms.  NOT wired into any filter:
`pallas_resample_gather` takes the XLA path unless ``force_kernel=True``.
Kept as validated Mosaic groundwork; the lessons (precision=HIGHEST on
exactness-sensitive matmuls, no dynamic lane indexing, rank-2-only loop
carries) are baked into the production `ops/pallas/ukf_scan.py` kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .noise import _on_tpu

TILE = 1024          # output slots per tile (8 sublanes x 128 lanes)
ALIGN = 128 * 128    # padding unit keeping the 2-level prefix lane-aligned


def _write_slot_boundaries(we_ref, k_scratch, r, N, Ntrue):
    """Compute the CDF and write K = clip(ceil(cdf*Ntrue/total - r)) into
    ``k_scratch`` ([R,128]).  Processes the weights in static groups of
    128 rows; within a group the prefix structure is pure 2-D matmuls:
    lane-prefix from the right (upper-triangular ones), row-offsets from
    the left (strictly-lower ones) - no transposes or reshapes, which
    Mosaic's layout inference cannot handle across the lane axis.
    """
    R = N // 128
    G = R // 128
    ones_u = jnp.triu(jnp.ones((128, 128), jnp.float32))
    ones_sl = jnp.tril(jnp.ones((128, 128), jnp.float32), k=-1)
    # group totals first (for the global normalizer)
    total = jnp.asarray(0.0, jnp.float32)
    for g in range(G):
        wg = we_ref[pl.ds(g * 128, 128), :]
        total = total + jnp.sum(wg)
    scale = float(Ntrue) / total
    g_off = jnp.asarray(0.0, jnp.float32)
    for g in range(G):
        wg = we_ref[pl.ds(g * 128, 128), :]
        rp = jax.lax.dot_general(
            wg, ones_u, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [128,128] lane-inclusive prefix per row
        rsums = jax.lax.slice(rp, (0, 127), (128, 128))  # [128,1]
        row_off = jax.lax.dot_general(
            ones_sl, rsums, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [128,1] exclusive prefix over the group's rows
        cdf_g = rp + row_off + g_off
        k_scratch[pl.ds(g * 128, 128), :] = jnp.clip(
            jnp.ceil(cdf_g * scale - r), 0.0, float(Ntrue)
        )
        g_off = g_off + jnp.sum(wg)


def _resample_kernel(r_ref, xt_ref, we_ref, out_ref, k_scratch, *, N, Ntrue,
                     nx, n_tiles):
    """``N`` padded (multiple of 16384); ``Ntrue`` real particles/slots.
    ``xt_ref``/``out_ref``: [nx, R, 128] transposed-blocked particles;
    ``we_ref``/``k_scratch``: [R, 128]."""
    r = r_ref[0]
    _write_slot_boundaries(we_ref, k_scratch, r, N, Ntrue)

    lane_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    within = (row_i * 128 + lane_i).astype(jnp.float32)  # [8,128] 0..1023

    def tile_body(t, carry):
        a_prev = carry  # chunk index where the previous tile's scan stopped
        start_f = (t * TILE).astype(jnp.float32)
        pos = start_f + within  # [8,128] slot positions of this tile

        # ---- count pass: j = #{K_i <= pos} ------------------------------
        def count_cond(st):
            c, j, done = st
            return jnp.logical_and(c < n_tiles, jnp.logical_not(done))

        last_pos = start_f + float(TILE - 1)

        def count_step(st):
            c, j, done = st
            Ks = k_scratch[pl.ds(c * 8, 8), :]  # [8,128] chunk of K
            contrib = jnp.zeros((8, 128), jnp.float32)
            for s in range(8):
                Krow = jax.lax.slice(Ks, (s, 0), (s + 1, 128))  # [1,128]
                Krow3 = jax.lax.broadcast_in_dim(Krow, (1, 1, 128), (0, 2))
                cmp = (Krow3 <= pos[:, :, None]).astype(jnp.float32)
                contrib = contrib + jnp.sum(cmp, axis=2)
            j = j + contrib
            done = jnp.min(Ks) > last_pos
            return (c + 1, j, done)

        j0 = jnp.full((8, 128), a_prev.astype(jnp.float32) * float(TILE))
        c_end, j, _ = jax.lax.while_loop(
            count_cond, count_step, (a_prev, j0, jnp.asarray(False))
        )
        j = jnp.clip(j, 0.0, float(Ntrue - 1))
        a_next = jnp.maximum(a_prev, c_end - 2)

        # ---- gather pass: out[slot] = x[j] via masked sums ---------------
        jmin = jnp.min(j)
        jmax = jnp.max(j)
        b0 = jmin.astype(jnp.int32) // TILE

        def gather_cond(st):
            b, acc, done = st
            return jnp.logical_and(b < n_tiles, jnp.logical_not(done))

        def gather_step(st):
            b, acc, done = st
            base_f = (b * TILE).astype(jnp.float32)
            new_acc = []
            for d in range(nx):
                xs = xt_ref[d, pl.ds(b * 8, 8), :]  # [8,128] dim-d values
                acc_d = acc[d]
                for s in range(8):
                    ivals = base_f + float(s * 128) + jax.lax.broadcasted_iota(
                        jnp.int32, (1, 1, 128), 2
                    ).astype(jnp.float32)
                    mask = (j[:, :, None] == ivals).astype(jnp.float32)
                    xrow = jax.lax.slice(xs, (s, 0), (s + 1, 128))
                    xrow3 = jax.lax.broadcast_in_dim(xrow, (1, 1, 128), (0, 2))
                    acc_d = acc_d + jnp.sum(mask * xrow3, axis=2)
                new_acc.append(acc_d)
            done = base_f + float(TILE) > jmax
            return (b + 1, tuple(new_acc), done)

        acc0 = tuple(jnp.zeros((8, 128), jnp.float32) for _ in range(nx))
        _, out, _ = jax.lax.while_loop(
            gather_cond, gather_step, (b0, acc0, jnp.asarray(False))
        )
        for d in range(nx):
            out_ref[d, pl.ds(t * 8, 8), :] = out[d]
        return a_next

    jax.lax.fori_loop(0, n_tiles, tile_body, jnp.asarray(0, jnp.int32))


def pallas_resample_gather(x: jax.Array, we: jax.Array, r,
                           force_kernel: bool = False) -> jax.Array:
    """``x[systematic_resample(we, r)]`` fully inside one TPU kernel.

    - ``x``: [N, nx] particles,
    - ``we``: normalized weights [N],
    - ``r``: scalar uniform in [0, 1) (the shared systematic offset).

    Off-TPU (without ``force_kernel``) falls back to the XLA counting-sort
    formulation so semantics stay testable on CPU.
    """
    N, nx = x.shape
    if not force_kernel:  # see STATUS in the module docstring
        return _xla_reference(x, we, r)
    Np = -(-N // ALIGN) * ALIGN
    R = Np // 128
    xp = jnp.asarray(x, jnp.float32)
    wep = jnp.asarray(we, jnp.float32)
    if Np != N:
        xp = jnp.concatenate([xp, jnp.zeros((Np - N, nx), jnp.float32)])
        wep = jnp.concatenate([wep, jnp.zeros((Np - N,), jnp.float32)])
    xt = xp.T.reshape(nx, R, 128)   # transposed-blocked layout (host side)
    we2 = wep.reshape(R, 128)
    n_tiles = Np // TILE
    kern = functools.partial(
        _resample_kernel, N=Np, Ntrue=N, nx=nx, n_tiles=n_tiles
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((nx, R, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((R, 128), jnp.float32)],
        interpret=pltpu.InterpretParams() if not _on_tpu() else False,
    )(jnp.asarray(r, jnp.float32).reshape(1), xt, we2)
    return out.reshape(nx, Np).T[:N]


def _xla_reference(x, we, r):
    """Same math in plain XLA (used off-TPU and in tests)."""
    N = we.shape[-1]
    bins = jnp.cumsum(we)
    K = jnp.clip(jnp.ceil(bins * N / bins[-1] - r).astype(jnp.int32), 0, N)
    hist = jnp.zeros((N + 1,), jnp.int32).at[K].add(1)
    j = jnp.clip(jnp.cumsum(hist)[:-1], 0, N - 1)
    return x[j]
