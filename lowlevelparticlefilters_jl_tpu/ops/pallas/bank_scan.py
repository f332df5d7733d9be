"""Whole-scan Mosaic kernel for the shared-Riccati KF *bank* loglik.

The bank path (filters/bank.py) evaluates ``B`` independent datasets
through one shared ``KalmanFilter`` — the ``log_likelihood_fun`` sweep
objective of /root/reference/src/smoothing.jl:227-282 — with the
covariance/gain recursion computed once.  Its round-3 formulation
prefix-composes the bank mean recursion ``x⁺ = M_t x + d_t`` with an
``associative_scan`` over ``[T, B]`` planes; at B = 8192 that moves
~0.5 GB of HBM per sweep (log₂T passes over nx+ny plane leaves) and the
row runs at ~0.19 of HBM peak (BENCH_r04 ``kf_bank8192``).

This kernel runs the *sequential* recursion instead, with the whole
bank resident in VMEM:

- bank members live on (sublane, lane): every per-member quantity is a
  ``[8, L]`` tile (``L = Bpad/8`` lanes), so nx state components are
  ``nx·L/128`` vregs and each per-step update is a handful of
  scalar×plane FMAs;
- the per-step *scalar* pipeline (M_t, A·K, W2, Linv, input drives) is
  precomputed by XLA from the shared Riccati pass and read from one
  packed ``[T, S]`` SMEM array — the scalar unit runs it in parallel
  with the VPU chain;
- data channels stream as ``[T, 8, L]`` VMEM refs (y, and u when the
  bank has per-member inputs), read once;
- the step-invariant ``Σ_t cst_t`` normalization is added outside.

Per step that is ~20 vreg-ops at B = 8192 (8 vregs per plane) — issue-
bound instead of bandwidth-bound.  The dependency chain through the
state is only ``nx`` chained FMAs, hidden by the 8-way block ILP.

Exactness: identical algebra to ``filters/bank.py::_bank_scan``'s
sequential array path (same whitening — ll via ``Z = Linv(y − Cx − Du)``
accumulated in f32), certified against it in tests and on hardware by
``bench.py::certify_kernels``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG2PI = 1.8378770664093453


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - no backend at all
        return False


def _route_on_tpu() -> bool:
    """Routing-decision alias of :func:`_on_tpu` — tests monkeypatch
    THIS to force the bank-kernel route on CPU (where the kernel then
    runs in interpret mode via the un-patched `_on_tpu`)."""
    return _on_tpu()


# VMEM budget for the streamed data channels + state/accumulator, with
# the same pin policy as pf_scan (ADVICE r4 medium): tiny configs keep
# the default 16 MiB scoped limit, anything estimated past 8 MiB pins
# the physical 127 MiB (see `_bank_kernel_call`).  Beyond the budget the
# caller chunks over bank members and time segments (state planes
# carried between segment calls).
_CHUNK_BYTES = 96 << 20
# per-segment scalar rows live in SMEM; v5e SMEM is scarce
_TSEG = 2048
# segment×bank-chunk kernel calls are inlined in one jaxpr — bound it
_MAX_CALLS = 64


def bank_kernel_supported(T: int, B: int, nx: int, ny: int, nu: int,
                          dtype) -> bool:
    """Hard admission gate for :func:`bank_loglik_kernel` — what the
    kernel CAN run (``method='kernel'`` honors exactly this)."""
    if dtype != jnp.float32:
        return False
    if nx > 4 or ny > 4 or nu > 4:
        return False
    nseg = -(-T // _TSEG)
    per8 = (ny + nu) * min(T, _TSEG) * 4 * 8
    bcap = max(1024, min(65536, (_CHUNK_BYTES // max(per8, 1)) * 8))
    if nseg * -(-B // bcap) > _MAX_CALLS:
        return False
    return True


def bank_kernel_profitable(T: int, B: int, nx: int, ny: int, nu: int,
                           dtype) -> bool:
    """Auto-routing gate: supported AND worth it.  Below 256 members the
    bank pads to a mostly-empty 1024-lane tile and the plane path's
    prefix compose is already cheap — keep auto on the plane path."""
    return B >= 256 and bank_kernel_supported(T, B, nx, ny, nu, dtype)


def _pack_channels(a, Bpad):
    """[B, T, k] data → k channel arrays [T, 8, L] (member m at
    (sublane m // L, lane m % L))."""
    B, T, k = a.shape
    L = Bpad // 8
    ap = jnp.pad(a, ((0, Bpad - B), (0, 0), (0, 0)))
    return [ap[:, :, c].T.reshape(T, 8, L) for c in range(k)]


def _bank_kernel_body(T, Tpad, nx, ny, nu, S,
                      sm_ref, xin_ref, *rest):
    nch = ny + nu
    y_refs = rest[:ny]
    u_refs = rest[ny:nch]
    ll_ref, xout_ref = rest[nch], rest[nch + 1]
    shape = y_refs[0].shape[1:]  # [8, L]

    # packed scalar row offsets: M | AK | Linv | W2 | BmAKD | LD.
    # Layout is [S, T]: an SMEM window pads every ROW to 512 bytes, so
    # the natural [T, S] layout would cost T*512 B (1 MiB at T=2048 —
    # measured compile-OOM on v5e); [S, T] costs the true S*T*4.
    oM = 0
    oAK = oM + nx * nx
    oLi = oAK + nx * ny
    oW2 = oLi + ny * ny
    oBD = oW2 + nx * ny
    oLD = oBD + nx * nu

    def step(t, carry):
        xs, ll = carry
        static = isinstance(t, int)
        if static and t >= T:
            return carry
        yv = [y_refs[y][t] for y in range(ny)]
        uv = [u_refs[u][t] for u in range(nu)]
        sc = lambda k: sm_ref[k, t]

        # whitened innovation Z_z = Σ_y Linv_zy·y − Σ_u LD_zu·u − Σ_i W2_iz·x
        Z = []
        for z in range(ny):
            acc = sc(oLi + z * ny + 0) * yv[0]
            for y in range(1, ny):
                acc += sc(oLi + z * ny + y) * yv[y]
            for u in range(nu):
                acc -= sc(oLD + z * nu + u) * uv[u]
            for i in range(nx):
                acc -= sc(oW2 + i * ny + z) * xs[i]
            Z.append(acc)
        dll = -0.5 * (Z[0] * Z[0])
        for z in range(1, ny):
            dll = dll - 0.5 * Z[z] * Z[z]

        # x⁺_i = Σ_j M_ij·x_j + Σ_y AK_iy·y + Σ_u BmAKD_iu·u
        xn = []
        for i in range(nx):
            acc = sc(oM + i * nx + 0) * xs[0]
            for j in range(1, nx):
                acc += sc(oM + i * nx + j) * xs[j]
            for y in range(ny):
                acc += sc(oAK + i * ny + y) * yv[y]
            for u in range(nu):
                acc += sc(oBD + i * nu + u) * uv[u]
            xn.append(acc)
        if static:  # tail steps were handled above; this one is live
            return tuple(xn), ll + dll
        valid = t < T  # traced index: mask the Tpad tail
        return (tuple(jnp.where(valid, xn_i, xs_i)
                      for xn_i, xs_i in zip(xn, xs)),
                ll + jnp.where(valid, dll, 0.0))

    init = (tuple(xin_ref[i] for i in range(nx)),
            jnp.zeros(shape, jnp.float32))
    if T <= _FULL_UNROLL:
        # short segment: every step index is a
        # literal — SMEM loads become immediates and the VLIW scheduler
        # interleaves the ll chain of step t with the state chain of
        # step t+1
        carry = init
        for s in range(T):
            carry = step(s, carry)
    else:
        # long segment: 128-step fully-unrolled blocks inside a rolled
        # outer loop (the akf-kernel pattern; a plain unroll=1 fori_loop
        # measured ~8× slower per step on v5e — the scheduler cannot
        # overlap anything across rolled iterations)
        def block(b, carry):
            return jax.lax.fori_loop(
                0, _UNROLL, lambda s, c: step(b * _UNROLL + s, c), carry,
                unroll=_UNROLL)

        carry = jax.lax.fori_loop(0, Tpad // _UNROLL, block, init)
    xf, ll = carry
    ll_ref[:, :] = ll
    for i in range(nx):
        xout_ref[i] = xf[i]


_UNROLL = 128       # block-unroll width of the rolled long-segment loop
_FULL_UNROLL = 512  # segments up to this length unroll completely


def _bank_kernel_call(scal, xin, chans, T, Tpad, nx, ny, nu, L, interpret):
    S = scal.shape[0]
    kernel = functools.partial(_bank_kernel_body, T, Tpad, nx, ny, nu, S)
    est = ((ny + nu) * Tpad + nx) * 8 * L * 4
    params = {}
    # default scoped-vmem limit is 16 MiB (measured OOM at est=25 MiB on
    # v5e with no pin); pin the physical 127 MiB for anything near it —
    # Mosaic's reported stack need grows with the limit itself, so
    # estimate-sized mid-band limits are never issued (ADVICE r4)
    if est > (8 << 20):
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=(127 << 20))
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((8, L), jnp.float32),
                   jax.ShapeDtypeStruct((nx, 8, L), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + len(chans)),
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=pltpu.InterpretParams() if interpret else False,
        **params,
    )(scal, xin, *chans)


def bank_loglik_kernel(kf, us, ys, Schol, K, A, Bm, C, D):
    """Bank log-likelihood ``[B]`` via the whole-scan kernel.

    Inputs follow ``filters/bank.py::_bank_scan``: ``ys [B, T, ny]``,
    ``us [B, T, nu]``, and the shared-recursion outputs stacked
    ``[T, ...]``.  Off TPU the kernel runs in interpret mode (tests;
    production routing gates on `_route_on_tpu`)."""
    B, T, ny = ys.shape
    nx = kf.nx
    nu = us.shape[-1]
    interpret = not _on_tpu()

    f32 = functools.partial(jnp.asarray, dtype=jnp.float32)
    hp = jax.lax.Precision.HIGHEST
    em = lambda s, *xs: jnp.einsum(s, *xs, precision=hp)
    eye = jnp.eye(ny, dtype=jnp.float32)
    Linv = jax.vmap(lambda Lc: jax.scipy.linalg.solve_triangular(
        Lc, eye, lower=True))(f32(Schol))                 # [T, ny, ny]
    A, K, C = f32(A), f32(K), f32(C)
    AK = em("tij,tjk->tik", A, K)
    M = A - em("tij,tjk->tik", AK, C)
    W2 = em("tji,tkj->tik", C, Linv)                       # [T, nx, ny]
    cst_sum = (-0.5 * ny * _LOG2PI * T
               + jnp.sum(jnp.log(jnp.abs(
                   jnp.diagonal(Linv, axis1=-2, axis2=-1)))))

    cols = [M.reshape(T, nx * nx), AK.reshape(T, nx * ny),
            Linv.reshape(T, ny * ny), W2.reshape(T, nx * ny)]
    if nu:
        Bm, D = f32(Bm), f32(D)
        BmAKD = Bm - em("tij,tju->tiu", AK, D)
        LD = em("tzy,tyu->tzu", Linv, D)
        cols += [BmAKD.reshape(T, nx * nu), LD.reshape(T, ny * nu)]
    scal = jnp.concatenate(cols, axis=1).T  # [S, T] (SMEM row padding)
    x0v = f32(kf.d0.mean)

    # chunk over bank members (VMEM envelope) and time segments (SMEM
    # scalar rows + channel VMEM for long T; state planes carried
    # between segment calls); every chunk is one kernel instance inside
    # the same jitted program
    Tseg = min(T, _TSEG)
    per8 = (ny + nu) * Tseg * 4 * 8  # channel bytes per 8-member set
    Bcap = max(1024, min(65536, (_CHUNK_BYTES // max(per8, 1)) * 8))
    lls = []
    for b0 in range(0, B, Bcap):
        yc = ys[b0:b0 + Bcap]
        Bc = yc.shape[0]
        Bpad = -(-Bc // 1024) * 1024
        L = Bpad // 8
        xin = jnp.broadcast_to(x0v[:, None, None], (nx, 8, L))
        llc = jnp.zeros((8, L), jnp.float32)
        for t0 in range(0, T, Tseg):
            Ts = min(Tseg, T - t0)
            # short segments unroll completely; long ones run in
            # 128-step unrolled blocks, so pad the step axis (padded
            # steps are masked inside the kernel)
            Tp = Ts if Ts <= _FULL_UNROLL else -(-Ts // _UNROLL) * _UNROLL
            tpad = ((0, 0), (0, Tp - Ts), (0, 0))
            chans = _pack_channels(
                jnp.pad(f32(yc[:, t0:t0 + Ts]), tpad), Bpad)
            if nu:
                chans += _pack_channels(
                    jnp.pad(f32(us[b0:b0 + Bcap, t0:t0 + Ts]), tpad), Bpad)
            ll8, xin = _bank_kernel_call(
                jnp.pad(scal[:, t0:t0 + Ts], ((0, 0), (0, Tp - Ts))),
                xin, chans, Ts, Tp, nx, ny, nu, L, interpret)
            llc = llc + ll8
        lls.append(llc.reshape(Bpad)[:Bc])
    return jnp.concatenate(lls) + cst_sum
