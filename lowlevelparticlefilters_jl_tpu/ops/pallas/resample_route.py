"""Pallas TPU kernel v3: systematic resample + gather as monotone routing.

Replaces the windowed-MXU formulation (ops/pallas/resample_v2.py) with a
VPU-only algorithm built from log-shift butterfly routing — no scatter,
no searchsorted, no one-hot contractions, and value movement is EXACT
(pure copies, any dtype width, no bf16 splits).

Algorithm (reference math: /root/reference/src/resample.jl:17-36; the
slot boundaries ``K_i = ceil(cdf_i * N / total - r)`` are shared with
ops/resample.py::_systematic_slots, so the output is bitwise equal to
``x[resample_systematic(we)]``):

Particle i owns output run ``[K_{i-1}, K_i)``; survivors are particles
with offspring count ``c_i = K_i - K_{i-1} >= 1``.  The output vector is
"each survivor repeated c_i times, in order" — produced in three
log-depth phases, each a sequence of static power-of-two shifts:

1. **Compact** survivors left to positions ``pos_i = #{j<i: alive_j}``
   (displacement ``i - pos_i``, non-decreasing).
2. **Spread** compacted survivor m right to its run start ``K_{m-1}``
   (displacement ``Kp_m - m``, non-decreasing since consecutive
   survivors' run starts differ by >= 1).
3. **Forward-fill** the holes between run starts (hold-last-valid).

Phases 1-2 are 1-to-1 monotone routings: items move by their
displacement decomposed into powers of two.  The bit schedule makes the
routing collision-free (proved by the distinct-intermediate-position
argument; verified exhaustively against the oracle in
tests/test_resample_kernel.py):

- left moves with non-decreasing displacement: LSB-first,
- right moves with non-decreasing displacement: MSB-first.

(The mirror schedules DO collide — e.g. compaction MSB-first fails for
``dest_i=0, rem_i=3`` vs ``dest_j=3, rem_j=4`` at bit 2.)

Cost: O(N log N) VPU work — ~log2(N) stages x (nx+3) planes x
(roll + select).  No MXU involvement, so the cost is linear (not
9-dots-per-dim) in nx, and f32/int32 payloads route bit-exactly.

Layout: planes of shape [8, NL] with particle index ``i = l*8 + s``
(sublane-fastest), so a shift by 2^b is a single lane roll for b >= 3
and a sublane roll + lane-carry fixup for b in {0,1,2}.  All shifts are
static; Mosaic rules honored (int-only 2-D iota, rank-2 values, no
lane-changing reshapes — the [N] <-> [8, NL] relayouts happen in XLA).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .noise import _on_tpu


def _layout_dims(N: int) -> tuple[int, int]:
    """NL (lanes) and Npad for the [8, NL] plane layout."""
    NL = 128 * (-(-N // 1024))
    return NL, 8 * NL


def _iota_index(NL: int) -> jax.Array:
    """Global particle index plane: idx[s, l] = l*8 + s."""
    sio = jax.lax.broadcasted_iota(jnp.int32, (8, NL), 0)
    lio = jax.lax.broadcasted_iota(jnp.int32, (8, NL), 1)
    return lio * 8 + sio


def _shift(plane: jax.Array, delta: int, right: bool):
    """Logical shift of the i = l*8 + s stream by ``delta`` (a power of
    two) positions.  Returns the shifted plane; positions with no
    in-range source carry wrapped garbage — callers mask with
    :func:`_shift_ok`."""
    NL = plane.shape[1]
    s_sub, s_lane = delta % 8, delta // 8
    out = plane
    if s_sub != 0:
        roll_sub = s_sub if right else 8 - s_sub
        a = pltpu.roll(out, roll_sub, axis=0)
        # rows that wrapped through the sublane roll need the lane carry
        b = pltpu.roll(a, 1 if right else NL - 1, axis=1)
        sio = jax.lax.broadcasted_iota(jnp.int32, plane.shape, 0)
        wrapped = sio < s_sub if right else sio >= 8 - s_sub
        out = jnp.where(wrapped, b, a)
    if s_lane != 0:
        out = pltpu.roll(out, s_lane if right else NL - s_lane, axis=1)
    return out


def _shift_ok(NL: int, delta: int, right: bool) -> jax.Array:
    """Mask of positions whose shift source is in-range (no wraparound)."""
    idx = _iota_index(NL)
    return idx >= delta if right else idx < 8 * NL - delta


def _shift_dyn(plane: jax.Array, lanes, right: bool):
    """Lane shift by a TRACED lane count (the b >= 3 stages: delta =
    8*lanes positions).  Lowers to `tpu.dynamic_rotate` — keeping the
    stage loop a `fori_loop` instead of a fully unrolled program (a
    17-stage unroll compiled in ~8 minutes on v5e; this form compiles in
    seconds)."""
    NL = plane.shape[1]
    sh = lanes if right else NL - lanes
    return pltpu.roll(plane, sh, axis=1)


_VBIT = 1 << 24  # packed valid flag above the 24-bit rem field


def _route_stage(payloads, P, dd, shift_fn, ok):
    """One routing stage on the PACKED state plane ``P = valid·2^24 +
    rem``: items with bit ``dd`` of rem set move by dd.  Packing makes
    ONE shifted plane serve as move mask, validity and remaining
    displacement at once — the unpacked form shifted ``move`` and
    ``rem`` separately and updated ``valid`` arithmetically (4 more
    full-plane ops per stage ≈ 0.5 µs at N=1e5, ~17 µs per firing
    across the ~34 lane stages)."""
    zero = jnp.int32(0)
    mark = jnp.int32(_VBIT) + dd      # valid AND current bit set
    sp = jnp.where(ok, shift_fn(P), zero)
    im = (sp & mark) == mark          # slot receives an item
    here = (P & mark) == mark         # slot's item departs
    payloads = tuple(jnp.where(im, shift_fn(p), p) for p in payloads)
    # departure clears the slot; arrival installs the shifted state with
    # the current bit retired.  A slot never both receives and keeps
    # (collision-freedom), so the two writes compose.
    P = jnp.where(here, zero, P)
    P = jnp.where(im, sp - dd, P)
    return payloads, P


def _nbits(v, NB: int):
    """Exact bit length of a non-negative int32 scalar (floor(log2)+1,
    0 for v == 0) via NB scalar compares — Mosaic-safe (no clz, and no
    f32 log2 whose rounding could silently DROP a needed routing stage).
    """
    n = jnp.int32(0)
    for b in range(NB):
        n = n + jnp.where(v >= (jnp.int32(1) << b), jnp.int32(1),
                          jnp.int32(0))
    return n


def _route(payloads, valid, rem, right: bool, NB: int, NL: int):
    """Move valid item at position i by ``rem[i]`` positions (all moves
    in one direction).  Requirements for collision-freedom: the map is
    1-to-1 on valid items, source and destination orders agree, and
    ``rem`` is non-decreasing over valid items in position order.

    Bit schedule: LSB-first for left moves, MSB-first for right moves
    (the mirror schedules collide — see module docstring).

    ``valid`` is an int32 0/1 plane — Mosaic cannot rotate i1 vectors
    ("Rotate with non-32-bit data"), so every SHIFTED mask stays 32-bit.
    Stages b in {0,1,2} are sublane rolls (static, unrolled); stages
    b >= 3 are dynamic lane rotates inside one `fori_loop`.

    The lane-stage trip count is DYNAMIC: no rem has a bit at or above
    ``bit_length(max(rem))``, so those stages are provable no-ops and
    are skipped (a well-mixed cloud moves particles locally — measured
    displacements are typically orders of magnitude below the worst
    case N, and each skipped stage saves ~(len(payloads)+4) full-plane
    passes).  Worst-case trip count (degenerate weights) is unchanged.
    """
    assert NB <= 24, "packed rem field is 24 bits (N <= 16M)"
    idx = _iota_index(NL)
    # rem is zero on invalid positions (callers mask), so max(rem) bounds
    # every displacement
    nb = _nbits(jnp.max(rem), NB)
    n_lane = max(0, NB - 3)
    n_lane_dyn = jnp.clip(nb - 3, 0, n_lane)

    def sub_stage(state, b):
        payloads, P = state
        d = 1 << b
        return _route_stage(payloads, P, jnp.int32(d),
                            lambda p: _shift(p, d, right),
                            _shift_ok(NL, d, right))

    def lane_body(k, state):
        payloads, P = state
        # MSB-first from the top SET bit (not the static top NB - 1)
        b = nb - 1 - k if right else 3 + k
        dd = jnp.int32(1) << b
        ok = idx >= dd if right else idx < jnp.int32(8 * NL) - dd
        return _route_stage(
            payloads, P, dd,
            lambda p: _shift_dyn(p, jnp.int32(1) << (b - 3), right), ok)

    state = (tuple(payloads), valid * jnp.int32(_VBIT) + rem)
    if right:  # MSB-first: lane stages first, then sublane stages
        state = jax.lax.fori_loop(0, n_lane_dyn, lane_body, state)
        for b in (2, 1, 0):
            state = sub_stage(state, b)
    else:      # LSB-first: sublane stages first, then lane stages
        for b in (0, 1, 2):
            state = sub_stage(state, b)
        state = jax.lax.fori_loop(0, n_lane_dyn, lane_body, state)
    payloads, P = state
    return list(payloads), jax.lax.shift_right_logical(
        P, jnp.int32(24))


def _forward_fill(payloads, valid, NB: int, NL: int, max_gap=None):
    """Hold-last-valid fill (log-doubling, ascending strides).
    ``valid``: int32 0/1.

    ``max_gap`` (traced scalar, optional): upper bound on the distance
    from any position that MUST be filled to its preceding valid
    position.  After the stages 1, 2, ..., 2^m every gap < 2^(m+1) is
    filled, so lane stages beyond ``bit_length(max_gap)`` are skipped.
    Positions further than max_gap from a run start (only the padded
    tail, whose weights are masked) may keep their pre-fill values —
    finite copies of real particles, same contract as the wrapped
    values the full fill would give them."""
    zero = jnp.int32(0)
    idx = _iota_index(NL)

    def stage(state, shift_fn, ok):
        payloads, valid = state
        cand = jnp.where(ok, shift_fn(valid), zero)
        take = (valid == 0) & (cand == 1)
        payloads = tuple(jnp.where(take, shift_fn(p), p) for p in payloads)
        return payloads, jnp.maximum(valid, cand)

    state = (tuple(payloads), valid)
    for b in (0, 1, 2):
        d = 1 << b
        state = stage(state, lambda p, d=d: _shift(p, d, True),
                      _shift_ok(NL, d, True))

    def lane_body(k, state):
        dd = jnp.int32(1) << (3 + k)
        return stage(state, lambda p: _shift_dyn(p, jnp.int32(1) << k, True),
                     idx >= dd)

    n_lane = max(0, NB - 3)
    if max_gap is None:
        n_lane_dyn = n_lane
    else:
        n_lane_dyn = jnp.clip(_nbits(max_gap, NB) - 3, 0, n_lane)
    state = jax.lax.fori_loop(0, n_lane_dyn, lane_body, state)
    return list(state[0])


def hs_cumsum(plane: jax.Array, NB: int, NL: int) -> jax.Array:
    """Inclusive Hillis-Steele cumsum over the i = l*8 + s stream.
    Exact for int32; fp-associativity-level differences from
    ``jnp.cumsum`` for f32."""
    zero = jnp.zeros((), plane.dtype)
    idx = _iota_index(NL)
    for b in (0, 1, 2):
        d = 1 << b
        ok = _shift_ok(NL, d, right=True)
        plane = plane + jnp.where(ok, _shift(plane, d, right=True), zero)

    def lane_body(k, plane):
        dd = jnp.int32(1) << (3 + k)
        shifted = _shift_dyn(plane, jnp.int32(1) << k, True)
        return plane + jnp.where(idx >= dd, shifted, zero)

    return jax.lax.fori_loop(0, max(0, NB - 3), lane_body, plane)


# NOTE: a 17-stage hs_cummax (running max over the particle stream) used
# to live here, repairing slot boundaries derived from a non-monotone
# f32 cumsum.  The fused-PF kernel now builds boundaries from an exact
# INTEGER hs_cumsum (pf_scan.py) whose f32 image is monotone by
# construction, and the XLA path keeps its own running max in
# ops/resample.py — the repair scan is gone (ADVICE r4).


def route_systematic(payloads, K, N: int, NL: int):
    """In-kernel systematic resample of ``payloads`` (list of [8, NL]
    planes) given slot boundaries ``K`` ([8, NL] int32, non-decreasing
    along i = l*8 + s, clipped to [0, N]; padded tail must equal N).

    Returns the resampled payload planes: plane'[slot k] =
    plane[particle j_k] with ``j_k = #{i: K_i <= k}`` — exactly the
    systematic-resampling gather.
    """
    NB = max(1, (8 * NL - 1).bit_length())
    idx = _iota_index(NL)
    Kp = jnp.where(idx == 0, jnp.int32(0), _shift(K, 1, right=True))
    c = K - Kp
    alive = jnp.where(c > 0, jnp.int32(1), jnp.int32(0))
    # compacted destination: exclusive cumsum of alive
    pos = hs_cumsum(alive, NB, NL) - alive
    remA = jnp.where(alive == 1, idx - pos, 0)
    routedA, validA = _route(payloads + [Kp], alive, remA, False, NB, NL)
    KpC = routedA[-1]
    remB = jnp.where(validA == 1, KpC - idx, 0)
    routedB, validB = _route(routedA[:-1], validA, remB, True, NB, NL)
    # every in-range hole sits < c_max positions after its run start
    return _forward_fill(routedB, validB, NB, NL,
                         max_gap=jnp.max(c) - 1)


def _standalone_kernel(K_ref, x_ref, out_ref, *, nx, N, NL):
    payloads = [x_ref[d] for d in range(nx)]
    out = route_systematic(payloads, K_ref[...], N, NL)
    for d in range(nx):
        out_ref[d] = out[d]


def _to_planes(a: jax.Array, N: int, NL: int) -> jax.Array:
    """[N] -> [8, NL] with i = l*8 + s (XLA-side, free relayout)."""
    pad = 8 * NL - N
    ap = jnp.pad(a, ((0, pad),), constant_values=0) if pad else a
    return ap.reshape(NL, 8).T


def _from_planes(a: jax.Array, N: int) -> jax.Array:
    return a.T.reshape(-1)[:N]


# VMEM admission: ~(nx + 7)*2 live planes during routing (payloads,
# masks, rem, shift temporaries).  The default 16M scoped-vmem limit
# OOMs at N=262144/nx=2 (measured: 19.5M needed), so the kernel raises
# `vmem_limit_bytes`; v5e has 128M of VMEM — budget 100M, which admits
# the N=1e6 regime SURVEY §5 names (plane = 4 MB, ~20 live planes).
_VMEM_BUDGET = 100 << 20


def _vmem_need(N: int, nx: int) -> int:
    _, Npad = _layout_dims(N)
    return (nx + 7) * 2 * Npad * 4


def route_kernel_fits(N: int, nx: int) -> bool:
    return _vmem_need(N, nx) <= _VMEM_BUDGET


def fused_systematic_gather_route(x: jax.Array, we: jax.Array,
                                  key: jax.Array):
    """Fused systematic resample + gather: ``x[resample_systematic(we)]``,
    bitwise exact (slot boundaries from ops/resample.py::_systematic_slots
    computed in XLA; the kernel routes exact value copies).

    Returns the resampled [N, nx] array.  Off-TPU runs in interpret mode
    (slow — tests use small N).
    """
    from ..resample import _systematic_slots

    N, nx = x.shape
    NL, Npad = _layout_dims(N)
    K = _systematic_slots(we, key, N)  # [N] int32 in [0, N]
    Kpl = _to_planes(K, N, NL)
    # padded tail: boundaries at N (zero offspring)
    if Npad > N:
        idx = _iota_index(NL)
        Kpl = jnp.where(idx >= N, jnp.int32(N), Kpl)
    xp = jnp.stack([_to_planes(x[:, d].astype(jnp.float32), N, NL)
                    for d in range(nx)])
    kernel = functools.partial(_standalone_kernel, nx=nx, N=N, NL=NL)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nx, 8, NL), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(_VMEM_BUDGET + (8 << 20),
                                 max(32 << 20, _vmem_need(N, nx) + (8 << 20)))),
        interpret=pltpu.InterpretParams() if not _on_tpu() else False,
    )(Kpl, xp)
    cols = [_from_planes(out[d], N) for d in range(nx)]
    return jnp.stack(cols, axis=1).astype(x.dtype)
