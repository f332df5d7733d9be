"""Pallas TPU kernel: the ENTIRE sequential UKF trajectory in one kernel.

Why: the XLA scan body of a small-state UKF compiles to ~10-15 separate
fusions per step (~19-22 µs/step at nx=4 on v5e — measured by bisect,
round 2), while the arithmetic itself is a few hundred FLOPs.  Single-
stream sequential filtering is therefore fusion-launch-bound, not
compute-bound, and `unroll` does not help.  Running the whole T-step
recursion inside ONE Mosaic kernel removes the per-step launch overhead:
everything (state, covariance, sigma points) lives in registers/VMEM and
each iteration is straight-line VPU/MXU code.

Scope (v1): additive-noise UKF (`AUGD=AUGM=False`), pure-jnp dynamics /
measurement callbacks (traced into the kernel), no input sequence or a
stacked input sequence, any `UTParams` scheme, diagonal or full constant
R1/R2.  Everything else falls back to the XLA scan
(`trajectory.loglik`), as does any non-TPU backend.

Numerics: all matmuls trace under `jax.default_matmul_precision
('highest')` — the v5e MXU defaults to bf16 passes, which perturbs
covariance products (the CLAUDE.md gotcha, confirmed on hardware for the
resample kernel).

Reference for the math: /root/reference/src/ukf.jl:468-541 (predict),
:633-671 (correct); step order correct-then-predict matches
filtering.jl:293-315.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.sigmapoints import ukf_weights
from ...ops.linalg import symmetrize, chol_lower
from .noise import _on_tpu

_LOG2PI = 1.8378770664093453


def _wcol(W, S, dtype):
    """Column of covariance weights [S, 1] built via iota (a 2-D-born
    value; the 1-D concat form works standalone but rank-1 values feeding
    loop-carried math trip Mosaic's implicit-dim layout pass)."""
    i0 = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    return jnp.where(i0 == 0, jnp.asarray(W.wc, dtype), jnp.asarray(W.wci, dtype))


def _wrow_mean(W, S, dtype):
    """Row of mean weights [1, S]."""
    i1 = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    return jnp.where(i1 == 0, jnp.asarray(W.wm, dtype), jnp.asarray(W.wmi, dtype))


def _wcov(xs, m2, ys, ym2, W):
    """Weighted (cross-)covariance as one plain 2-D dot — Mosaic cannot
    lower the library's three-operand einsum (empty-contracting-dim dot).
    ``m2``/``ym2`` are [1, n] rows."""
    dx = xs - m2
    dy = ys - ym2
    return (dx * _wcol(W, xs.shape[0], xs.dtype)).T @ dy


def _tri_solve_scalar(L, B, lower=True):
    """Unrolled triangular solve with scalar-broadcast row substitution —
    no dot_general at all (the library's unrolled tri_solve emits 1-D dots
    Mosaic rejects); rows stay rank-2 throughout.  B: [n, m]."""
    n = L.shape[0]
    rows = [None] * n
    order = range(n) if lower else range(n - 1, -1, -1)
    for i in order:
        acc = B[i:i + 1, :]
        ks = range(i) if lower else range(i + 1, n)
        for k in ks:
            acc = acc - L[i, k] * rows[k]
        rows[i] = acc / L[i, i]
    return jnp.concatenate(rows, axis=0)


def _supported(ukf, mm) -> bool:
    from ...models.measurement_models import UKFMeasurementModel

    return (
        not getattr(ukf, "augmented_dynamics", False)
        and isinstance(mm, UKFMeasurementModel)
        and not mm.augmented
        and mm.innovation is None
        and mm.mean is None
        and mm.cov is None
        and mm.cross_cov is None
        and isinstance(getattr(ukf, "R1"), jax.Array)
        and isinstance(mm.R2, jax.Array)
        and getattr(ukf, "cholesky_fn", None) is None
        and getattr(ukf, "reject", None) is None
    )


def ukf_loglik_fused(ukf, ys, us: Optional[jax.Array] = None,
                     force_kernel: bool = False):
    """Total log-likelihood of ``ys`` under ``ukf`` — one fused kernel.

    Falls back to the XLA scan when the filter configuration is outside
    the kernel's scope or when not running on TPU.  Semantics match
    ``trajectory.loglik(ukf, us, ys)`` exactly (same correct-then-predict
    order, same Ts time stamps).
    """
    from ...trajectory import loglik as xla_loglik

    mm = ukf.measurement_model
    if not _supported(ukf, mm) or (not _on_tpu() and not force_kernel):
        return xla_loglik(ukf, us, ys)

    ys = jnp.asarray(ys, jnp.float32)
    T, ny = ys.shape
    nx = ukf.nx
    wp = ukf.weight_params
    W = ukf_weights(wp, nx)
    Ts = float(ukf.Ts)
    p = ukf.p
    f = ukf.dynamics
    g = mm.measurement
    R1 = jnp.asarray(ukf.R1, jnp.float32)
    R2 = jnp.asarray(mm.R2, jnp.float32)
    x0 = jnp.asarray(ukf.d0.mean, jnp.float32).reshape(1, nx)
    P0 = jnp.asarray(ukf.d0.cov, jnp.float32)

    # Time axis blocked into 128-step lane tiles: Mosaic cannot index the
    # lane dimension at a dynamic (non-128-aligned) position, so the outer
    # loop walks blocks (dynamic leading-dim reads are fine) and the inner
    # 128-step loop extracts each step's scalars via an iota-mask
    # reduction — no dynamic lane indexing at all.
    LB = 128
    TB = -(-T // LB)
    Tpad = TB * LB

    def _blocked(a, n):  # [T, n] -> [TB, n, 128]
        ap = jnp.pad(a, ((0, Tpad - T), (0, 0)))
        return ap.T.reshape(n, TB, LB).transpose(1, 0, 2)

    ysb = _blocked(ys, ny)
    if us is None:
        usb = jnp.zeros((TB, 1, LB), jnp.float32)
        nu = 0
    else:
        us = jnp.asarray(us, jnp.float32)
        nu = us.shape[1]
        usb = _blocked(us, nu) if nu > 0 else jnp.zeros((TB, 1, LB), jnp.float32)

    # Pallas kernels may not capture array constants (e.g. the system
    # matrices closed over by the user callbacks) — hoist both literal
    # jaxpr consts and closed-over tracers into kernel inputs, exactly
    # like ops/pallas/noise.py::propagate_gaussian.
    x_ex = jnp.zeros((nx,), jnp.float32)
    t_ex = jnp.float32(0.0)

    def _flatten(fn):
        # nu == 0: never let a zero-sized u value appear inside the kernel
        # (zero-sized arrays crash the Mosaic compile helper); close over an
        # empty constant at trace time instead — DCE'd when unused.
        if nu > 0:
            u_ex = jnp.zeros((nu,), jnp.float32)
            args_ex = (x_ex, u_ex, t_ex)
            wrap = lambda x, u, tk: fn(x, u, p, tk)
        else:
            args_ex = (x_ex, t_ex)
            wrap = lambda x, tk: fn(
                x, jnp.zeros((0,), jnp.float32), p, tk
            )
        cc, tracer_consts = jax.closure_convert(wrap, *args_ex)
        closed = jax.make_jaxpr(cc)(*args_ex, *tracer_consts)
        lits = [jnp.asarray(c) for c in closed.consts]
        consts = [*lits, *tracer_consts]
        n_lit = len(lits)

        def flat(x, u, tk, *cs):
            args = (x, u, tk) if nu > 0 else (x, tk)
            (out,) = jax.core.eval_jaxpr(
                closed.jaxpr, cs[:n_lit], *args, *cs[n_lit:]
            )
            return out

        return flat, consts

    f_flat, f_consts = _flatten(f)
    g_flat, g_consts = _flatten(g)
    nf, ng = len(f_consts), len(g_consts)

    def kernel(ysb_ref, usb_ref, x0_ref, P0_ref, R1_ref, R2_ref,
               *rest):
        const_refs = rest[: nf + ng]
        ll_ref, xout_ref, Rout_ref = rest[nf + ng:]
        fcs = [c[:] for c in const_refs[:nf]]
        gcs = [c[:] for c in const_refs[nf:]]
        R1k = R1_ref[:, :]
        R2k = R2_ref[:, :]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LB), 1)

        NS = 2 * nx + 1
        wrow = _wrow_mean(W, NS, jnp.float32)
        Wsc = jnp.float32(W.W)

        def _sigma(x2, R):
            # sigma points from the [1, nx] state row — everything rank-2
            # (squeezing state to 1-D and unsqueezing back into the loop
            # carry trips Mosaic's implicit-dim layout pass).
            L = chol_lower(symmetrize(Wsc * R))
            dev = L.T
            return jnp.concatenate([x2, x2 + dev, x2 - dev], axis=0)

        def step_in_block(yblk, ublk, t, carry):
            # NOTE: carry leaves must ALL be rank-2 — a mixed-rank
            # (1-D + 2-D) carry through nested fori_loops crashes the
            # Mosaic layout pass (layout.h Check failed; probed on v5e).
            x2, R, ll2 = carry
            s = t % LB
            tk = t.astype(jnp.float32) * Ts
            maskf = (lane == s).astype(jnp.float32)  # [1, LB]
            y2 = (yblk @ maskf.T).T  # [1, ny]
            u = (ublk @ maskf.T)[:, 0] if nu > 0 else None

            # ---- correct (ukf.jl:633-671) ----------------------------
            xs = _sigma(x2, R)
            ysig = jax.vmap(lambda sp: g_flat(sp, u, tk, *gcs))(xs)
            ym2 = wrow @ ysig  # [1, ny]
            S = symmetrize(_wcov(ysig, ym2, ysig, ym2, W)) + R2k
            Cxy = _wcov(xs, x2, ysig, ym2, W)
            Schol = chol_lower(S)
            e2 = y2 - ym2  # [1, ny]
            # K = Cxy S^{-1} via two unrolled triangular solves
            Z = _tri_solve_scalar(Schol, Cxy.T, lower=True)
            Kt = _tri_solve_scalar(Schol.T, Z, lower=False)  # [ny, nx]
            x2 = x2 + e2 @ Kt
            R = symmetrize(R - Kt.T @ S @ Kt)
            w2 = _tri_solve_scalar(Schol, e2.T, lower=True)  # [ny, 1]
            llk = -0.5 * (
                jnp.sum(w2 * w2)
                + 2.0 * jnp.sum(jnp.log(jnp.diagonal(Schol)))
                + ny * _LOG2PI
            )

            # ---- predict (ukf.jl:468-541) ----------------------------
            xs2 = _sigma(x2, R)
            prop = jax.vmap(lambda sp: f_flat(sp, u, tk, *fcs))(xs2)
            xn2 = wrow @ prop  # [1, nx]
            Rn = symmetrize(_wcov(prop, xn2, prop, xn2, W)) + R1k
            # freeze state/ll on padding steps beyond the true T
            valid = t < T
            pick = lambda a, b: jnp.where(valid, a, b)
            return (
                pick(xn2, x2),
                pick(Rn, R),
                ll2 + jnp.where(valid, llk, 0.0),
            )

        def block(b, carry):
            yblk = ysb_ref[b]
            ublk = usb_ref[b]

            def inner(s, c):
                return step_in_block(yblk, ublk, b * LB + s, c)

            return jax.lax.fori_loop(0, LB, inner, carry)

        xf2, Rf, ll2 = jax.lax.fori_loop(
            0, TB, block,
            (x0_ref[:, :], P0_ref[:, :], jnp.zeros((1, 1), jnp.float32)),
        )
        ll_ref[0, 0] = ll2[0, 0]
        xout_ref[0, :] = xf2[0, :]
        Rout_ref[:, :] = Rf

    consts = [jnp.asarray(c, jnp.float32) if jnp.issubdtype(
        jnp.asarray(c).dtype, jnp.floating) else jnp.asarray(c)
        for c in [*f_consts, *g_consts]]
    with jax.default_matmul_precision("highest"):
        ll, xf, Rf = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((1, 1), jnp.float32),
                jax.ShapeDtypeStruct((1, nx), jnp.float32),
                jax.ShapeDtypeStruct((nx, nx), jnp.float32),
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (6 + len(consts)),
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            interpret=pltpu.InterpretParams() if not _on_tpu() else False,
        )(ysb, usb, x0, P0, R1, R2, *consts)
    return ll[0, 0]


def _ekf_supported(ekf, mm) -> bool:
    from ...models.measurement_models import EKFMeasurementModel

    return (
        type(mm) is EKFMeasurementModel
        and mm.R12 is None
        and isinstance(getattr(ekf, "R1"), jax.Array)
        and isinstance(mm.R2, jax.Array)
        and not callable(getattr(ekf, "alpha", 1.0))
    )


def ekf_loglik_fused(ekf, ys, us: Optional[jax.Array] = None,
                     force_kernel: bool = False):
    """EKF counterpart of :func:`ukf_loglik_fused` — the whole linearized
    recursion (ekf.jl:136-190) in one Mosaic kernel, with `jax.jacfwd`
    of the traced user callbacks evaluated in-kernel.

    Scope: plain `EKFMeasurementModel` without R12, constant R1/R2,
    scalar alpha; falls back to the XLA scan otherwise or off-TPU.
    """
    from ...trajectory import loglik as xla_loglik

    mm = ekf.measurement_model
    if not _ekf_supported(ekf, mm) or (not _on_tpu() and not force_kernel):
        return xla_loglik(ekf, us, ys)

    ys = jnp.asarray(ys, jnp.float32)
    T, ny = ys.shape
    nx = ekf.nx
    Ts = float(ekf.Ts)
    p = ekf.p
    f = ekf.dynamics
    g = mm.measurement
    alpha = float(ekf.alpha)
    Ajac_user = ekf.Ajac
    Cjac_user = mm.Cjac
    R1 = jnp.asarray(ekf.R1, jnp.float32)
    R2 = jnp.asarray(mm.R2, jnp.float32)
    x0 = jnp.asarray(ekf.d0.mean, jnp.float32).reshape(1, nx)
    P0 = jnp.asarray(ekf.d0.cov, jnp.float32)

    LB = 128
    TB = -(-T // LB)
    Tpad = TB * LB

    def _blocked(a, n):
        ap = jnp.pad(a, ((0, Tpad - T), (0, 0)))
        return ap.T.reshape(n, TB, LB).transpose(1, 0, 2)

    ysb = _blocked(ys, ny)
    if us is None:
        usb = jnp.zeros((TB, 1, LB), jnp.float32)
        nu = 0
    else:
        us = jnp.asarray(us, jnp.float32)
        nu = us.shape[1]
        usb = _blocked(us, nu) if nu > 0 else jnp.zeros((TB, 1, LB), jnp.float32)

    x_ex = jnp.zeros((nx,), jnp.float32)
    t_ex = jnp.float32(0.0)

    def _flatten(fn):
        if nu > 0:
            u_ex = jnp.zeros((nu,), jnp.float32)
            args_ex = (x_ex, u_ex, t_ex)
            wrap = lambda x, u, tk: fn(x, u, p, tk)
        else:
            args_ex = (x_ex, t_ex)
            wrap = lambda x, tk: fn(x, jnp.zeros((0,), jnp.float32), p, tk)
        cc, tracer_consts = jax.closure_convert(wrap, *args_ex)
        closed = jax.make_jaxpr(cc)(*args_ex, *tracer_consts)
        lits = [jnp.asarray(c) for c in closed.consts]
        consts = [*lits, *tracer_consts]
        n_lit = len(lits)

        def flat(x, u, tk, *cs):
            args = (x, u, tk) if nu > 0 else (x, tk)
            (out,) = jax.core.eval_jaxpr(
                closed.jaxpr, cs[:n_lit], *args, *cs[n_lit:]
            )
            return out

        return flat, consts

    f_flat, f_consts = _flatten(f)
    g_flat, g_consts = _flatten(g)
    # user-supplied Jacobians (or jacfwd of the flattened callbacks)
    fj = _flatten(Ajac_user)if Ajac_user is not None else None
    gj = _flatten(Cjac_user) if Cjac_user is not None else None
    fj_flat, fj_consts = fj if fj else (None, [])
    gj_flat, gj_consts = gj if gj else (None, [])
    counts = [len(f_consts), len(g_consts), len(fj_consts), len(gj_consts)]

    def kernel(ysb_ref, usb_ref, x0_ref, P0_ref, R1_ref, R2_ref, *rest):
        ncs = sum(counts)
        const_refs = rest[:ncs]
        ll_ref, xout_ref, Rout_ref = rest[ncs:]
        o = 0
        groups = []
        for c in counts:
            groups.append([r[:] for r in const_refs[o:o + c]])
            o += c
        fcs, gcs, fjcs, gjcs = groups
        R1k = R1_ref[:, :]
        R2k = R2_ref[:, :]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LB), 1)

        def step_in_block(yblk, ublk, t, carry):
            x2, R, ll2 = carry
            s = t % LB
            tk = t.astype(jnp.float32) * Ts
            maskf = (lane == s).astype(jnp.float32)
            y2 = (yblk @ maskf.T).T
            u = (ublk @ maskf.T)[:, 0] if nu > 0 else None

            # ---- correct (ekf.jl:159-190) ----------------------------
            gx = jax.vmap(lambda xx: g_flat(xx, u, tk, *gcs))(x2)  # [1, ny]
            if gj_flat is not None:
                Cj = gj_flat(x2[0], u, tk, *gjcs)
            else:
                Cj = jax.jacfwd(lambda xx: g_flat(xx, u, tk, *gcs))(x2[0])
            S = symmetrize(Cj @ R @ Cj.T) + R2k
            Schol = chol_lower(S)
            e2 = y2 - gx
            Z = _tri_solve_scalar(Schol, Cj @ R, lower=True)       # [ny, nx]
            Kt = _tri_solve_scalar(Schol.T, Z, lower=False)        # [ny, nx]
            x2 = x2 + e2 @ Kt
            R = symmetrize(R - Kt.T @ (Cj @ R))
            w2 = _tri_solve_scalar(Schol, e2.T, lower=True)
            llk = -0.5 * (
                jnp.sum(w2 * w2)
                + 2.0 * jnp.sum(jnp.log(jnp.diagonal(Schol)))
                + ny * _LOG2PI
            )

            # ---- predict (ekf.jl:136-152) ----------------------------
            if fj_flat is not None:
                Aj = fj_flat(x2[0], u, tk, *fjcs)
            else:
                Aj = jax.jacfwd(lambda xx: f_flat(xx, u, tk, *fcs))(x2[0])
            xn2 = jax.vmap(lambda xx: f_flat(xx, u, tk, *fcs))(x2)
            Rn = alpha * symmetrize(Aj @ R @ Aj.T) + R1k
            valid = t < T
            pick = lambda a, b: jnp.where(valid, a, b)
            return (
                pick(xn2, x2),
                pick(Rn, R),
                ll2 + jnp.where(valid, llk, 0.0),
            )

        def block(b, carry):
            yblk = ysb_ref[b]
            ublk = usb_ref[b]

            def inner(s, c):
                return step_in_block(yblk, ublk, b * LB + s, c)

            return jax.lax.fori_loop(0, LB, inner, carry)

        xf2, Rf, ll2 = jax.lax.fori_loop(
            0, TB, block,
            (x0_ref[:, :], P0_ref[:, :], jnp.zeros((1, 1), jnp.float32)),
        )
        ll_ref[0, 0] = ll2[0, 0]
        xout_ref[0, :] = xf2[0, :]
        Rout_ref[:, :] = Rf

    consts = [jnp.asarray(c) for c in
              [*f_consts, *g_consts, *fj_consts, *gj_consts]]
    with jax.default_matmul_precision("highest"):
        ll, xf, Rf = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((1, 1), jnp.float32),
                jax.ShapeDtypeStruct((1, nx), jnp.float32),
                jax.ShapeDtypeStruct((nx, nx), jnp.float32),
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (6 + len(consts)),
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            interpret=pltpu.InterpretParams() if not _on_tpu() else False,
        )(ysb, usb, x0, P0, R1, R2, *consts)
    return ll[0, 0]
