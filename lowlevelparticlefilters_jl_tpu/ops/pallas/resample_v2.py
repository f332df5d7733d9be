"""Pallas TPU kernel v2: fused systematic-resample index + particle gather.

Replaces the two dominant XLA ops of a systematic resample at N>=1e5 on
v5e — the [N, N/128] one-hot index matmul (~260-360 us) and the row
gather ``x[j]`` (~240-330 us; XLA TPU gathers serialize) — with ONE
kernel built from small windowed MXU contractions.

Algorithm (reference: /root/reference/src/resample.jl:17-36, re-derived
for parallel hardware):

- Outside the kernel, XLA computes the slot boundaries
  ``K_i = ceil(cdf_i * N / total - r)`` (ops/resample.py::_systematic_slots,
  the same values the XLA path uses — so this kernel is BITWISE equal to
  ``x[resample_systematic(we)]``), plus the shifted ``K_{i-1}``.
- Particle i's offspring occupy output slots ``[K_{i-1}, K_i)``.  For an
  output slot k = 128*b + l:

  - index:  ``j_k = #{i : K_i <= k} = CC[b] + #{i: q_i == b, r_i <= l}``
    with ``q = K // 128``, ``r = K mod 128`` and CC the exclusive prefix
    of per-block boundary counts,
  - gather: ``out[k] = sum_i x_i * 1[K_{i-1} <= k < K_i]``.  The
    indicator factorizes over (block, lane) into FOUR mutually
    exclusive terms (qp = K_{i-1}//128, rp = K_{i-1} mod 128):

        span:   1[qp < b] * 1[q > b]                     (whole block)
        enter:  1[qp < b] * 1[q == b] * 1[l <  r]
        exit:   1[qp == b] * 1[q > b] * 1[l >= rp]
        inside: 1[qp == b] * 1[q == b] * 1[rp <= l < r]

    each a (blocks x particles) 0/1 coefficient times an exact 0/1
    lane-step matrix — dense MXU work.  Exclusivity matters: exactly
    ONE product is nonzero per output slot, so f32 accumulation is
    bitwise EXACT.  (A 3-term telescoping form ``+start − end`` sums
    every open run in the block before cancelling — ±ulp errors, the
    same O(sqrt(n)·eps) disease as the round-1 float-scatter.)

- Chunks of ``CHUNK`` particles arrive one per sequential grid step
  (the pallas pipeline overlaps the HBM→VMEM copies with compute).
  Because K is sorted, a chunk touches only a narrow window of output
  blocks; contributions accumulate into persistent VMEM scratch at a
  per-chunk 8-aligned sublane offset precomputed in XLA (SMEM input —
  Mosaic rejects unaligned dynamic vector indexing).  Chunks owning
  more weight than ``~W*128/N`` of the total take extra sweep
  iterations (dynamic trip count), so the result stays exact for ANY
  weight profile at cost proportional to the actual slot extent.

Mosaic rules honored (CLAUDE.md + ops/pallas lessons): int-only iota,
rank-2 values, no lane-changing reshapes (all reshapes happen in XLA
where they are free row-major views), dynamic ref indexing only at
8-aligned sublane offsets, scalars via SMEM, and exact bf16 dots
(0/1 masks; f32 values via an exact bf16 hi/mid/lo triple split).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .noise import _on_tpu

CHUNK = 1024   # particles per grid step
W = 32         # output-block window per sweep iteration (8-aligned)
_HI = jax.lax.Precision.HIGHEST


def _kernel(b0_ref, nwin_ref, kr_ref, kp_ref, x_ref, j_ref, out_ref,
            inner, acc, *, T8, nx, Rpad):
    """One grid step = 8 chunks (block sublane dims must divide by 8).
    Refs (per-step blocks): b0/nwin: SMEM [8*T8] int32; kr/kp:
    [8, CHUNK] f32; x: [nx, 8, CHUNK]; j: [Rout_pad, 128] int32
    (constant block); out: [nx, Rout_pad, 128]; scratch (persistent):
    inner [Rpad, 128] f32, acc [nx, Rpad, 128]."""
    t8 = pl.program_id(0)

    @pl.when(t8 == 0)
    def _init():
        inner[...] = jnp.zeros((Rpad, 128), jnp.float32)
        for d in range(nx):
            acc[d, ...] = jnp.zeros((Rpad, 128), jnp.float32)

    K8 = kr_ref[...]                   # [8, CHUNK]
    Kp8 = kp_ref[...]
    X8 = x_ref[...]                    # [nx, 8, CHUNK]
    lio = jax.lax.broadcasted_iota(
        jnp.int32, (128, CHUNK), 0).astype(jnp.float32)

    for s in range(8):
        K = jax.lax.slice(K8, (s, 0), (s + 1, CHUNK))     # [1, CHUNK]
        Kp = jax.lax.slice(Kp8, (s, 0), (s + 1, CHUNK))
        q = jnp.floor(K * (1.0 / 128.0))
        r = K - 128.0 * q
        qp = jnp.floor(Kp * (1.0 / 128.0))
        rp = Kp - 128.0 * qp

        b0 = b0_ref[t8 * 8 + s]        # 8-aligned window base (int32)
        nwin = nwin_ref[t8 * 8 + s]   # windows covering this chunk's runs

        SP = (lio >= rp).astype(jnp.bfloat16)   # exit step
        SR = (lio >= r).astype(jnp.bfloat16)    # count step: r <= l
        SLT = (lio < r).astype(jnp.bfloat16)    # enter step
        SIN = ((lio >= rp) & (lio < r)).astype(jnp.bfloat16)  # inside band

        def _accumulate(bio, nb, dyn_lo, q=q, r=r, qp=qp, rp=rp, s=s,
                        SP=SP, SR=SR, SLT=SLT, SIN=SIN):
            """Count + gather contributions for block ids ``bio``
            ([nb, CHUNK]) into scratch rows [dyn_lo, dyn_lo + nb).

            All dots run as plain bf16 MXU passes with f32 accumulation:
            the 0/1 masks are exact in bf16, counts stay < 2^24, and the
            f32 particle values enter via an exact bf16 triple split
            (hi/mid/lo, 24 = 3x8 mantissa bits) — one bf16 pass per
            component instead of HIGHEST's 6+ (which benchmarked SLOWER
            than the XLA gather it replaces)."""
            oh = (q == bio).astype(jnp.bfloat16)
            cnt = jax.lax.dot_general(
                oh, SR, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            inner[pl.ds(dyn_lo, nb), :] = inner[pl.ds(dyn_lo, nb), :] + cnt

            c_span = (qp < bio) & (q > bio)
            c_ent = ((qp < bio) & (q == bio)).astype(jnp.bfloat16)
            c_exit = ((qp == bio) & (q > bio)).astype(jnp.bfloat16)
            c_in = ((qp == bio) & (q == bio)).astype(jnp.bfloat16)
            for d in range(nx):
                xd = jax.lax.slice(X8, (d, s, 0), (d + 1, s + 1, CHUNK))
                xd = jax.lax.squeeze(xd, (0,))            # [1, CHUNK] f32
                g = jnp.sum(c_span * xd, axis=1, keepdims=True)
                g = jax.lax.broadcast_in_dim(g, (nb, 128), (0, 1))
                hi = xd.astype(jnp.bfloat16)
                e1 = xd - hi.astype(jnp.float32)
                mid = e1.astype(jnp.bfloat16)
                lo = (e1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
                for cmat, smat in ((c_ent, SLT), (c_exit, SP), (c_in, SIN)):
                    for comp in (hi, mid, lo):
                        g = g + jax.lax.dot_general(
                            cmat * comp, smat, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
                acc[d, pl.ds(dyn_lo, nb), :] = (
                    acc[d, pl.ds(dyn_lo, nb), :] + g)

        # Sweep the chunk's touched block range one W-window at a time —
        # dynamic trip count, so the cost is proportional to the chunk's
        # actual slot extent (1 window in the common case; heavy-weight
        # chunks take more, staying exact for any weight profile).  A
        # single [Rpad, CHUNK] pass would blow the 16M scoped-VMEM limit.
        wio = jax.lax.broadcasted_iota(
            jnp.int32, (W, CHUNK), 0).astype(jnp.float32)

        def grp(g, c, b0=b0, wio=wio, __acc=_accumulate):
            lo = b0 + g * W
            __acc(wio + lo.astype(jnp.float32), W, lo)
            return c

        jax.lax.fori_loop(0, nwin, grp, 0)

    @pl.when(t8 == T8 - 1)
    def _epilogue():
        # exclusive block prefix CC over boundary counts, then j = CC + inner
        blockcnt = inner[:, 127:128]                   # [Rpad, 1]
        ones_sl = jnp.tril(jnp.ones((128, 128), jnp.float32), k=-1)
        carry = jnp.zeros((1, 1), jnp.float32)
        Rout_pad = j_ref.shape[0]
        for g in range(Rpad // 128):
            col = jax.lax.slice(blockcnt, (g * 128, 0), ((g + 1) * 128, 1))
            pref = jax.lax.dot_general(
                ones_sl, col, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_HI)
            lo = g * 128
            if lo < Rout_pad:
                cc_g = pref + jax.lax.broadcast_in_dim(carry, (128, 1), (0, 1))
                cc_g = jax.lax.broadcast_in_dim(cc_g, (128, 128), (0, 1))
                j_ref[pl.ds(lo, 128), :] = (
                    cc_g + inner[pl.ds(lo, 128), :]).astype(jnp.int32)
                for d in range(nx):
                    out_ref[d, pl.ds(lo, 128), :] = acc[d, pl.ds(lo, 128), :]
            carry = carry + jnp.sum(col, keepdims=True)


def _pallas_systematic_index_gather(x, K, nx, N):
    """Run the kernel: K [N] int32 slot boundaries, x [N, nx] f32.
    Returns (j [N] int32, out [N, nx] f32)."""
    T8 = -(-N // (8 * CHUNK))
    T = 8 * T8
    Np = T * CHUNK
    Rout = -(-N // 128)
    Rout_pad = -(-Rout // 128) * 128
    Rpad = Rout_pad + ((W + 127) // 128 + 1) * 128

    Kf = K.astype(jnp.float32)
    Kp = jnp.concatenate([jnp.zeros((1,), jnp.float32), Kf[:-1]])
    padK = jnp.full((Np - N,), float(N), jnp.float32)
    Kr = jnp.concatenate([Kf, padK]).reshape(T, CHUNK)
    Kpr = jnp.concatenate([Kp, padK]).reshape(T, CHUNK)
    xT = jnp.concatenate(
        [x.astype(jnp.float32).T, jnp.zeros((nx, Np - N), jnp.float32)], axis=1
    ).reshape(nx, T, CHUNK)

    # per-chunk 8-aligned window base + number of W-windows covering the
    # chunk's slot extent (scalar prefetch; almost always 1)
    qp0 = (Kpr[:, 0].astype(jnp.int32) // 128)
    b0 = jnp.minimum((qp0 // 8) * 8, Rpad - W).astype(jnp.int32)
    qlast = (Kr[:, -1].astype(jnp.int32) // 128)
    nwin = ((qlast - b0) // W + 1).astype(jnp.int32)

    kernel = functools.partial(_kernel, T8=T8, nx=nx, Rpad=Rpad)
    j2, out2 = pl.pallas_call(
        kernel,
        grid=(T8,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, CHUNK), lambda t: (t, 0)),
            pl.BlockSpec((8, CHUNK), lambda t: (t, 0)),
            pl.BlockSpec((nx, 8, CHUNK), lambda t: (0, t, 0)),
        ],
        out_specs=[
            pl.BlockSpec((Rout_pad, 128), lambda t: (0, 0)),
            pl.BlockSpec((nx, Rout_pad, 128), lambda t: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Rout_pad, 128), jnp.int32),
            jax.ShapeDtypeStruct((nx, Rout_pad, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Rpad, 128), jnp.float32),
            pltpu.VMEM((nx, Rpad, 128), jnp.float32),
        ],
        interpret=not _on_tpu(),
    )(b0, nwin, Kr, Kpr, xT)
    j = j2.reshape(Rout_pad * 128)[:N]
    out = jnp.moveaxis(out2, 0, -1).reshape(Rout_pad * 128, nx)[:N]
    return jnp.clip(j, 0, N - 1), out


def fused_systematic_gather(x: jax.Array, we: jax.Array, key: jax.Array):
    """Systematic resample + gather, bitwise equal to
    ``x[resample_systematic(we, key)]`` (same K slot boundaries, exact
    0/1-mask contractions).  Returns ``(x_resampled, j)``.

    Falls back to interpret mode off-TPU (slow — tests use small N).
    """
    from ..resample import _systematic_slots

    N, nx = x.shape
    K = _systematic_slots(we, key, N)
    j, out = _pallas_systematic_index_gather(x, K, nx, N)
    return out, j
