"""Pallas TPU kernel: the ENTIRE bootstrap particle-filter scan in one
Mosaic kernel.

Why: the XLA PF step costs ~23 µs at N=1e5 on v5e (propagate+noise
12.5 µs, weight+normalize 10 µs — round-2 measurements) even though it
moves only ~2-3 MB of HBM, i.e. it is fusion-launch-bound ~6x off the
memory roofline; and the Neff-triggered resample adds an amortized
~35 µs/step through a separate kernel.  Running the whole T-step
recursion inside ONE kernel keeps the [N, nx] cloud and the log-weights
resident in VMEM for the entire trajectory — per-step HBM traffic drops
to the measurement row.

What runs per step (reference math: /root/reference/src/PFtypes.jl:107-139
propagation/weighting, src/filtering.jl:140-174 correct/predict order,
src/resample.jl:5-36 Neff trigger + systematic resampling):

- propagate: traced user dynamics (vmap'd over lanes, per sublane row)
  + additive Gaussian noise from the hardware PRNG (Box-Muller, exactly
  the ops/pallas/noise.py construction),
- weight: traced user measurement, whitened Gaussian log-density,
  missing-measurement (NaN) skip,
- normalize: fused max/exp/sum log-sum-exp with the reference's
  bookkeeping (ops/logsumexp.py::logsumexp_normalize),
- Neff trigger + systematic resampling via monotone log-shift routing
  (ops/pallas/resample_route.py) under `lax.cond` — the routing cost is
  paid only on steps that fire.

Particle layout: one [8, NL] f32 plane per state dimension with index
``i = l*8 + s`` (the routing layout).  The weight vector is one more
plane.  VMEM high-water ~ (nx + ~6) planes.

Draw streams: noise, the resampling offset r, and the slot boundaries'
cumsum associativity all differ from the XLA path (hardware PRNG,
Hillis-Steele prefix sum), so results differ draw-for-draw while being
distributionally identical — the same contract as
``noise_backend='pallas'`` (see smoothing.py FFBS notes).  Off-TPU the
kernel runs in interpret mode (tests); production falls back to the XLA
scan via the `pf_scan_supported` gate.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .noise import _cos_sin_2pi, _on_tpu
from .resample_route import (
    _iota_index, _layout_dims, _vmem_need, hs_cumsum,
    route_systematic)

_LOG2PI = 1.8378770664093453
_NEG = -1.0e30
_TWO_PI = 6.283185307179586


def _pf_vmem_est(N: int, nx: int) -> int:
    """Compile-time VMEM high-water estimate for the fused PF kernel:
    the in-kernel routing stage's live planes (resample_route._vmem_need)
    plus the persistent cloud/log-weight scratch planes, plus margin for
    blocked inputs and Mosaic temporaries.  Calibrated on hardware: at
    N=1e6/nx=2 the compiler reports a 93.81 MiB stack vs the routing
    term's 68.7 MiB — the old `routing + 16 MiB` estimate under-set
    `vmem_limit_bytes` and the compile OOM'd even though the admission
    gate had said yes.  NOTE the reported stack need scales with the
    limit itself (measured: limit 84.7 -> need 93.8, limit 96.1 ->
    need 103.5, limit 127 -> fits and runs), so in the large-cloud
    regime the call-site pins the limit at the physical 127 MiB
    instead of chasing the estimate."""
    _, Npad = _layout_dims(N)
    return _vmem_need(N, nx) + (nx + 1) * Npad * 4 + (16 << 20)


# v5e VMEM is 128 MiB; leave headroom for the compiler's own buffers.
_PF_VMEM_BUDGET = 108 << 20


def _flatten(fn, nx, nu, p):
    """Hoist closed-over tracers and literal consts of a user callback
    into explicit arguments (the ukf_scan.py / noise.py pattern)."""
    x_ex = jnp.zeros((nx,), jnp.float32)
    t_ex = jnp.float32(0.0)
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
    # 0-D consts (scalar parameters captured in the callback closure)
    # can't live in VMEM refs read as c[:] — ship them as (1, 1) and
    # restore the scalar shape before jaxpr evaluation
    shapes = [jnp.shape(c) for c in consts]
    consts = [jnp.asarray(c).reshape(1, 1) if jnp.ndim(c) == 0
              else jnp.asarray(c) for c in consts]

    aff = _jaxpr_affine_in_x(closed.jaxpr)
    ew = _jaxpr_elementwise_ok(closed.jaxpr)
    # dots on tiny operands unroll to mul/sum (-> elementwise path: one
    # double-vmapped dispatch instead of 8 row dispatches); skip for
    # affine callbacks, whose fast path is cheaper still
    unroll = (not aff and not ew
              and _jaxpr_ew_after_unroll(closed.jaxpr))
    evaljx = _eval_jaxpr_unroll if unroll else (
        lambda jx, cs, *a: jax.core.eval_jaxpr(jx, cs, *a))

    def flat(x, u, tk, *cs):
        cs = [c.reshape(s) if s == () else c for c, s in zip(cs, shapes)]
        args = (x, u, tk) if nu > 0 else (x, tk)
        (out,) = evaljx(closed.jaxpr, cs[:n_lit], *args, *cs[n_lit:])
        return out

    return flat, consts, aff, ew or unroll


# Primitives through which x-dependence may flow while preserving
# affinity in x.  `mul`/`div`/`dot_general` additionally require the
# OTHER operand to be x-free (checked below); everything else here is
# linear in each argument.
_AFFINE_OK = frozenset([
    "add", "sub", "neg", "add_any", "mul", "div", "dot_general",
    "broadcast_in_dim", "reshape", "transpose", "squeeze", "slice",
    "concatenate", "convert_element_type", "reduce_sum", "expand_dims",
    "select_n", "pad", "rev", "gather", "dynamic_slice", "copy",
])


def _jaxpr_affine_in_x(jaxpr) -> bool:
    """Static soundness check: is the callback AFFINE in its state
    argument x (invar 0)?  Walks the jaxpr tracking x-dependent vars;
    any x-dependent value entering a nonlinear primitive (exp, sin,
    x*x, ...) fails the check.  Conservative: unknown primitives and
    sub-jaxpr calls (cond/scan/custom_jvp...) fail closed.

    The affine fast path this gates evaluates the callback per scan
    step as scalar-x-plane combinations with M_t/c_t precomputed in
    XLA — full-vreg VPU work instead of 8 sublane-row MXU dispatches
    (measured 37 µs -> ~1 µs per step at N=1e5 on v5e)."""
    xdep = {jaxpr.invars[0]}

    from jax.extend.core import Literal

    def dep(v):
        return (not isinstance(v, Literal)) and v in xdep

    for eqn in jaxpr.eqns:
        in_dep = [dep(v) for v in eqn.invars]
        if not any(in_dep):
            continue
        name = eqn.primitive.name
        if name not in _AFFINE_OK:
            return False
        if name in ("mul", "div", "dot_general") and all(in_dep[:2]):
            return False  # x * x — quadratic
        if name == "div" and in_dep[1]:
            return False  # c / x — nonlinear in x
        if name == "select_n" and in_dep[0]:
            return False  # x-dependent predicate — piecewise, not affine
        if name in ("gather", "dynamic_slice") and any(in_dep[1:]):
            return False  # x-dependent indices — nonlinear
        for v in eqn.outvars:
            xdep.add(v)
    return True


# Primitives whose vmap batching rules stay rank-preserving/elementwise —
# safe to evaluate double-vmapped over BOTH plane axes ([nx, 8, NL]) in one
# Mosaic dispatch.  The bisected Mosaic crash behind the per-sublane-row
# dispatch (see the step_in_block comment) is specific to rank-3 batched
# dot_general; elementwise math, leading-axis shape ops and leading-axis
# reductions compile fine at every size.  Conservative: anything not
# listed (dots, dynamic indexing, sub-jaxpr calls, sorts) falls back to
# the row path.
_EW_OK = frozenset([
    "add", "sub", "neg", "add_any", "mul", "div", "rem", "pow",
    "integer_pow", "sqrt", "rsqrt", "cbrt", "exp", "log", "expm1",
    "log1p", "sin", "cos", "tan", "asin", "acos", "atan", "atan2",
    "sinh", "cosh", "tanh", "logistic", "abs", "sign", "floor", "ceil",
    "round", "max", "min", "clamp", "select_n", "eq", "ne", "lt", "le",
    "gt", "ge", "and", "or", "xor", "not", "is_finite", "square",
    "erf", "erfc", "broadcast_in_dim", "reshape", "transpose", "squeeze",
    "slice", "concatenate", "convert_element_type", "expand_dims", "pad",
    "rev", "copy", "reduce_sum", "reduce_max", "reduce_min", "reduce_prod",
    "reduce_and", "reduce_or", "stop_gradient",
])


def _jaxpr_elementwise_ok(jaxpr) -> bool:
    """Static check: every primitive in the callback jaxpr batches to
    rank-preserving plane ops under a double vmap (no dot_general, no
    dynamic indexing, no control flow)."""
    return all(eqn.primitive.name in _EW_OK for eqn in jaxpr.eqns)


# ---- small-dot unrolling: admit dot-containing callbacks to the ----
# ---- elementwise plane path ----------------------------------------
#
# The Mosaic crash behind the per-sublane-row dispatch is specific to
# rank-3 BATCHED dot_general (see the step_in_block comment).  A
# callback like ``A @ x + sin(x)`` is not affine (fails the fast path)
# and contains a dot (fails _jaxpr_elementwise_ok), so it paid the 8-row
# dispatch (~72 us/step at N=1e5) even though its dots act on tiny
# [nx, nx] x [nx] operands.  Rewriting those dots as broadcast-mul +
# reduce_sum (pure _EW_OK primitives; on [nx]-sized values the MXU
# gains nothing anyway) makes the whole jaxpr elementwise-safe and the
# callback runs as ONE double-vmapped dispatch on the [nx, 8, NL] cloud.
#
# Gate: every dot operand AND the mul-expanded intermediate
# (free_l x free_r x contract elements, i.e. intermediate PLANES after
# the double vmap) stay <= _DOT_UNROLL_MAX — bounds VMEM/vreg pressure.
_DOT_UNROLL_MAX = 64


def _dot_small(eqn) -> bool:
    if eqn.primitive.name != "dot_general":
        return False
    lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    import math

    contract = math.prod(lhs.shape[d] for d in lc) if lc else 1
    batch = math.prod(lhs.shape[d] for d in lb) if lb else 1
    free_l = max(1, lhs.size // max(1, contract * batch))
    free_r = max(1, rhs.size // max(1, contract * batch))
    inter = batch * free_l * free_r * contract
    return (lhs.size <= _DOT_UNROLL_MAX and rhs.size <= _DOT_UNROLL_MAX
            and inter <= _DOT_UNROLL_MAX)


def _jaxpr_ew_after_unroll(jaxpr) -> bool:
    """True when the jaxpr is elementwise-safe EXCEPT for small dots
    that :func:`_dot_as_mulsum` can unroll."""
    return all(eqn.primitive.name in _EW_OK or _dot_small(eqn)
               for eqn in jaxpr.eqns)


def _dot_as_mulsum(a, b, dimension_numbers):
    """dot_general on tiny operands as transpose + broadcast-mul +
    reduce_sum (all _EW_OK primitives, vmap-batchable to plane ops)."""
    (lc, rc), (lb, rb) = dimension_numbers
    la = [d for d in range(a.ndim) if d not in lc and d not in lb]
    ra = [d for d in range(b.ndim) if d not in rc and d not in rb]
    at = jnp.transpose(a, (*lb, *la, *lc))
    bt = jnp.transpose(b, (*rb, *ra, *rc))
    nb, nl, nr, nc = len(lb), len(la), len(ra), len(lc)
    for _ in range(nr):                       # [*B, *L, 1..,*C]
        at = jnp.expand_dims(at, nb + nl)
    for _ in range(nl):                       # [*B, 1.., *R, *C]
        bt = jnp.expand_dims(bt, nb)
    out = at * bt
    if nc:
        out = jnp.sum(out, axis=tuple(range(nb + nl + nr,
                                            nb + nl + nr + nc)))
    return out


def _eval_jaxpr_unroll(jaxpr, consts, *args):
    """eval_jaxpr with every small dot_general routed through
    :func:`_dot_as_mulsum` (other primitives bind unchanged)."""
    from jax.extend.core import Literal

    env = {}

    def read(v):
        return v.val if isinstance(v, Literal) else env[v]

    for v, c in zip(jaxpr.constvars, consts):
        env[v] = c
    for v, a in zip(jaxpr.invars, args):
        env[v] = a
    for eqn in jaxpr.eqns:
        invals = [read(v) for v in eqn.invars]
        if _dot_small(eqn):
            pet = eqn.params.get("preferred_element_type")
            out = _dot_as_mulsum(invals[0], invals[1],
                                 eqn.params["dimension_numbers"])
            if pet is not None:
                out = out.astype(pet)
            outs = [out]
        else:
            outs = eqn.primitive.bind(*invals, **eqn.params)
            if not eqn.primitive.multiple_results:
                outs = [outs]
        for v, o in zip(eqn.outvars, outs):
            env[v] = o
    return [read(v) for v in jaxpr.outvars]


def _meas_density_kernel_ok(d) -> bool:
    """Measurement densities the kernel can trace in-kernel beyond the
    Gaussian fast path: the scalar families of ops/distributions.py
    (and TupleProducts thereof), restricted to *Python-scalar*
    parameters so every constant folds at trace time (e.g. StudentT's
    ``gammaln(df)`` must fold — Mosaic cannot lower ``lgamma``)."""
    from ...ops import distributions as dist

    if isinstance(d, dist.TupleProduct):
        return all(_meas_density_kernel_ok(c) for c in d.dists)
    scal = lambda *vs: all(isinstance(v, (int, float)) for v in vs)
    if isinstance(d, dist.Normal):
        return scal(d.mu, d.sigma)
    if isinstance(d, dist.Laplace):
        return scal(d.mu, d.b)
    if isinstance(d, dist.StudentT):
        return scal(d.df, d.mu, d.sigma)
    if isinstance(d, dist.Uniform):
        return scal(d.lo, d.hi)
    if isinstance(d, dist.Binary):
        return scal(d.a, d.b, d.pa)
    if isinstance(d, dist.MixtureNormal):
        return scal(d.p1, d.mu1, d.sigma1, d.mu2, d.sigma2)
    return False


def _flatten_density(d, ny):
    """Trace ``e -> logpdf(e)`` (e: [ny] innovation) into a const-free
    flat callable for in-kernel weight evaluation."""
    e_ex = jnp.zeros((ny,), jnp.float32)
    wrap = lambda e: jnp.asarray(d.logpdf(e), jnp.float32).reshape(1)
    cc, tracer_consts = jax.closure_convert(wrap, e_ex)
    closed = jax.make_jaxpr(cc)(e_ex, *tracer_consts)
    lits = [jnp.asarray(c) for c in closed.consts]
    consts = [*lits, *tracer_consts]
    n_lit = len(lits)
    shapes = [jnp.shape(c) for c in consts]
    consts = [jnp.asarray(c).reshape(1, 1) if jnp.ndim(c) == 0
              else jnp.asarray(c) for c in consts]

    ew = _jaxpr_elementwise_ok(closed.jaxpr)
    unroll = not ew and _jaxpr_ew_after_unroll(closed.jaxpr)
    evaljx = _eval_jaxpr_unroll if unroll else (
        lambda jx, cs, *a: jax.core.eval_jaxpr(jx, cs, *a))

    def flat(e, *cs):
        cs = [c.reshape(s) if s == () else c for c, s in zip(cs, shapes)]
        (out,) = evaljx(closed.jaxpr, cs[:n_lit], e, *cs[n_lit:])
        return out

    return flat, consts, ew or unroll


def pf_scan_supported(pf) -> bool:
    """Static admission: bootstrap ParticleFilter, Gaussian dynamics/
    initial densities, Gaussian OR scalar-family measurement density
    (``_meas_density_kernel_ok``), systematic resampling, small state/
    measurement dims, cloud planes inside the VMEM envelope."""
    from ...filters.particle import ParticleFilter
    from ...ops.mvnormal import MvNormal

    if type(pf) is not ParticleFilter:
        return False
    if pf.resampling_strategy != "systematic":
        return False
    for d in (pf.dynamics_density, pf.initial_density):
        if not isinstance(d, MvNormal):
            return False
    if not (isinstance(pf.measurement_density, MvNormal)
            or _meas_density_kernel_ok(pf.measurement_density)):
        return False
    nx = pf.nx
    # routing high-water plus the persistent cloud/weight planes and the
    # blocked input sequences; v5e VMEM is 128M (see resample_route.py).
    # Admits N=1e6 at nx<=2 (measured stack 93.8 MiB, compiles under the
    # 108 MiB budget); larger clouds fall back to the XLA path.
    return nx <= 8 and _pf_vmem_est(pf.N, nx) <= _PF_VMEM_BUDGET


def pf_loglik_fused(pf, u, y, seed, x0: Optional[jax.Array] = None,
                    force_kernel: bool = False,
                    _debug_no_resample: bool = False):
    """Total bootstrap-PF log-likelihood of ``y`` — one fused kernel.

    Semantics match ``pf.loglik(u, y, key=...)`` distributionally (same
    correct-then-predict order, same Neff-trigger rule, systematic
    resampling) with hardware-PRNG draw streams.  ``seed``: int32 scalar.
    ``x0``: optional pre-drawn initial particles [N, nx] (default: drawn
    in-kernel from ``d0``).

    Returns ``(ll, n_resamples)``.  Off-TPU falls back to the XLA scan
    unless ``force_kernel`` (tests) — interpret mode has no hardware
    PRNG, so forced runs use zero noise / r=0.5 (exact MAP semantics the
    CPU tests compare against a zero-noise XLA oracle).
    """
    out = _pf_scan_fused(pf, u, y, seed, x0, force_kernel,
                         _debug_no_resample, want_means=False)
    return out[0], out[1]


def pf_mean_fused(pf, u, y, seed, x0: Optional[jax.Array] = None,
                  force_kernel: bool = False):
    """Filtered (posterior-weighted) mean trajectory ``[T, nx]`` plus
    ``(ll, n_resamples)`` from the same fused whole-scan kernel as
    :func:`pf_loglik_fused` — the state-tracking counterpart of
    ``forward_trajectory`` + ``weighted_mean`` (filtering.jl:282-327,
    PFtypes.jl weighted_mean) at in-VMEM scan speed.  Per step the
    kernel reduces ``Σ wᵉ·x`` per state dim into a one-hot lane
    accumulator, so the only extra HBM traffic is the [T, nx] output.
    """
    means, ll, nres = _pf_scan_fused(pf, u, y, seed, x0, force_kernel,
                                     False, want_means=True)
    return means, ll, nres


def pf_stats_fused(pf, u, y, seed, x0: Optional[jax.Array] = None,
                   force_kernel: bool = False):
    """Filtered mean ``[T, nx]`` AND covariance ``[T, nx, nx]``
    trajectories plus ``(ll, n_resamples)`` from the fused whole-scan
    kernel — the `weighted_mean` + `weighted_cov` recipe
    (PFtypes.jl weighted_mean/weighted_cov) at in-VMEM scan speed; the
    mean/ribbon bands most PF users plot without materializing the
    [T, N, nx] cloud.  The kernel accumulates the raw second moments
    ``Σ wᵉ·x_d·x_e`` per (d ≤ e) pair next to the means; the central
    covariance ``E[xxᵀ] − m mᵀ`` is formed in XLA afterwards."""
    means, covs, ll, nres = _pf_scan_fused(pf, u, y, seed, x0,
                                           force_kernel, False,
                                           want_means=True, want_cov=True)
    return means, covs, ll, nres


def pf_segment_fused(pf, u, y, seed, x0, w0, force_kernel: bool = False):
    """One resampling-free PF segment — the per-device building block of
    the mesh-sharded fused PF (parallel/sharded.py::sharded_pf_loglik_fused).

    Runs ``T`` correct/predict steps of the bootstrap recursion on the
    local sub-cloud ``x0 [Nloc, nx]`` starting from log-weights ``w0
    [Nloc]``, with NO resampling and NO global normalization — those
    happen at segment boundaries with cross-device collectives.  Per step
    the weights are normalized *locally* for f32 stability and the
    subtracted constants accumulate into ``ll_local``, so the
    unnormalized carried weights are recoverable as ``w_fin + ll_local``
    (the PF per-step ll telescopes between resampling events:
    Σ_t ll_t = lse(w_end) − lse(w_start), smoothing.jl:227-230 algebra).

    Returns ``(ll_local, x_fin [Nloc, nx], w_fin [Nloc])``.  On TPU this
    is the whole-segment Mosaic kernel (cloud resident in VMEM);
    elsewhere an equivalent XLA scan.
    """
    x0 = jnp.asarray(x0, jnp.float32)
    w0 = jnp.asarray(w0, jnp.float32)
    if not _on_tpu() and not force_kernel:
        return _pf_segment_xla(pf, u, y, seed, x0, w0)
    return _pf_kernel_run(pf, u, y, seed, x0, _debug_no_resample=True,
                          want_means=False, w0=w0, want_final=True,
                          N_override=x0.shape[0])


def _pf_segment_xla(pf, u, y, seed, x0, w0):
    """XLA-scan equivalent of :func:`pf_segment_fused` (identical
    contract: local per-step normalization, accumulated ll, no
    resampling; threefry draws instead of the hardware PRNG)."""
    y = jnp.asarray(y, jnp.float32)
    T = y.shape[0]
    Nloc = x0.shape[0]
    p = pf.p
    Ts = float(pf.Ts)
    u_seq = (jnp.zeros((T, 0), jnp.float32) if u is None
             else jnp.broadcast_to(jnp.asarray(u, jnp.float32),
                                   (T,) + jnp.shape(u)[1:]))
    key = jax.random.PRNGKey(jnp.asarray(seed, jnp.uint32))
    keys = jax.random.split(key, T)
    tvec = jnp.arange(T, dtype=jnp.float32) * Ts

    g = pf.measurement
    f = pf.dynamics
    dmeas = pf.measurement_density
    ddyn = pf.dynamics_density

    def step(carry, inp):
        x, w, ll = carry
        uk, yk, tk, kk = inp
        yh = jax.vmap(lambda xi: g(xi, uk, p, tk))(x)
        logp = jax.vmap(dmeas.logpdf)(yk[None, :] - yh)
        missing = jnp.any(jnp.isnan(yk))
        w1 = w + jnp.where(missing, 0.0, logp)
        m = jnp.max(w1)
        lse = m + jnp.log(jnp.sum(jnp.exp(w1 - m)))
        ll_t = jnp.where(missing, 0.0, lse)
        w2 = w1 - ll_t  # subtract exactly the ll contribution (see kernel)
        xn = jax.vmap(lambda xi: f(xi, uk, p, tk))(x)
        xn = xn + ddyn.sample(kk, (Nloc,)).astype(xn.dtype)
        return (xn, w2, ll + ll_t), None

    (x_fin, w_fin, ll), _ = jax.lax.scan(
        step, (x0, w0, jnp.float32(0.0)), (u_seq, y, tvec, keys))
    return ll, x_fin, w_fin


def _pf_xla_path(pf, u, y, seed, want_means, want_cov=False):
    """The XLA-scan equivalent of the fused kernel (same estimator, same
    return structure) — the off-TPU fallback AND the autodiff route."""
    key = jax.random.PRNGKey(jnp.asarray(seed, jnp.uint32))
    if want_means:
        sol = pf.forward_trajectory(u, y, key=key)
        means = jnp.einsum("tn,tnd->td", sol.we, sol.x)
        if want_cov:
            d = sol.x - means[:, None, :]
            covs = jnp.einsum("tn,tnd,tne->tde", sol.we, d, d)
            return means, covs, sol.ll, jnp.float32(jnp.nan)
        return means, sol.ll, jnp.float32(jnp.nan)
    # method="sequential": this IS the fallback — re-entering the routed
    # verb would recurse back into the fused path at trace time
    return (pf.loglik(u, y, key=key, method="sequential"),
            jnp.float32(jnp.nan))


def _pf_scan_fused(pf, u, y, seed, x0, force_kernel, _debug_no_resample,
                   want_means: bool, want_cov: bool = False):
    if not pf_scan_supported(pf):
        raise ValueError("pf_loglik_fused: unsupported filter config "
                         "(see pf_scan_supported)")
    if not _on_tpu() and not force_kernel:
        return _pf_xla_path(pf, u, y, seed, want_means, want_cov)

    # custom_jvp routing (adroute.py): jax.grad of a fused loglik follows
    # the XLA scan — closure-captured parameter tracers included.  x0 is
    # kernel-internal (sharded composition) and stays out of the AD args.
    from .adroute import route_ad

    seed_arr = jnp.asarray(seed, jnp.int32)
    if u is None:
        return route_ad(
            lambda y_, s_: _pf_kernel_run(pf, None, y_, s_, x0,
                                          _debug_no_resample, want_means,
                                          want_cov),
            lambda y_, s_: _pf_xla_path(pf, None, y_, s_, want_means,
                                        want_cov),
            jnp.asarray(y, jnp.float32), seed_arr)
    return route_ad(
        lambda u_, y_, s_: _pf_kernel_run(pf, u_, y_, s_, x0,
                                          _debug_no_resample, want_means,
                                          want_cov),
        lambda u_, y_, s_: _pf_xla_path(pf, u_, y_, s_, want_means,
                                        want_cov),
        jnp.asarray(u, jnp.float32), jnp.asarray(y, jnp.float32), seed_arr)


def _pf_kernel_run(pf, u, y, seed, x0, _debug_no_resample,
                   want_means: bool, want_cov: bool = False,
                   w0=None, want_final: bool = False, N_override=None):
    import os

    dbg = os.environ.get("PF_SCAN_DEBUG", "")
    y = jnp.asarray(y, jnp.float32)
    T, ny = y.shape
    N, nx = (N_override or pf.N), pf.nx
    NL, Npad = _layout_dims(N)
    NB = max(1, (Npad - 1).bit_length())
    Ts = float(pf.Ts)
    thresh = float(pf.resample_threshold)

    from ...ops.mvnormal import MvNormal

    L1 = jnp.asarray(pf.dynamics_density.chol(), jnp.float32)
    mu1 = jnp.asarray(pf.dynamics_density.mean, jnp.float32).reshape(1, nx)
    gauss_meas = isinstance(pf.measurement_density, MvNormal)
    if gauss_meas:
        R2 = jnp.asarray(pf.measurement_density.cov, jnp.float32)
        L2 = jnp.linalg.cholesky(R2)
        L2inv = jax.scipy.linalg.solve_triangular(
            L2, jnp.eye(ny, dtype=jnp.float32), lower=True)
        mu2 = jnp.asarray(pf.measurement_density.mean,
                          jnp.float32).reshape(1, ny)
        w_flat, w_consts, w_ew = None, [], True
    else:
        # traced user density: weight = logpdf(y - yhat) per lane
        L2inv = jnp.eye(ny, dtype=jnp.float32)   # placeholder input
        mu2 = jnp.zeros((1, ny), jnp.float32)    # placeholder input
        w_flat, w_consts, w_ew = _flatten_density(pf.measurement_density,
                                                  ny)
    nw = len(w_consts)
    L0 = jnp.asarray(pf.initial_density.chol(), jnp.float32)
    mu0 = jnp.asarray(pf.initial_density.mean, jnp.float32).reshape(1, nx)

    # time-blocked inputs (ukf_scan.py pattern): [TB, n, 128]
    LB = 128
    TB = -(-T // LB)
    Tpad = TB * LB

    def _blocked(a, n):
        ap = jnp.pad(a, ((0, Tpad - T), (0, 0)))
        return ap.T.reshape(n, TB, LB).transpose(1, 0, 2)

    ysb = _blocked(y, ny)
    if u is None:
        usb = jnp.zeros((TB, 1, LB), jnp.float32)
        nu = 0
        us_full = jnp.zeros((T, 0), jnp.float32)
    else:
        us = jnp.asarray(u, jnp.float32)
        us = jnp.broadcast_to(us, (T,) + us.shape[1:]) if us.ndim == 2 \
            else jnp.tile(us.reshape(1, -1), (T, 1))
        nu = us.shape[1]
        us_full = us
        usb = _blocked(us, nu) if nu > 0 else jnp.zeros((TB, 1, LB),
                                                        jnp.float32)

    f_flat, f_consts, f_aff, f_ew = _flatten(pf.dynamics, nx, nu, pf.p)
    g_flat, g_consts, g_aff, g_ew = _flatten(pf.measurement, nx, nu, pf.p)
    nf, ng = len(f_consts), len(g_consts)
    # Elementwise plane path: a dot-free callback evaluates double-
    # vmapped over BOTH plane axes in ONE dispatch ([nx, 8, NL] ->
    # [k, 8, NL]) instead of 8 per-sublane-row dispatches (the rank-3
    # Mosaic crash is specific to batched dots, which
    # _jaxpr_elementwise_ok excludes); per-callback, like the affine
    # flags below.
    w_ew = w_ew and "norowv" not in dbg

    # Affine fast path, PER CALLBACK: when a callback is affine in x
    # (static jaxpr check), precompute its per-step matrices (M_t/c_t
    # for dynamics, H_t/d_t for measurement) in XLA and evaluate the
    # step as scalar-x-plane combinations on full [8, NL] planes — no
    # in-kernel dots, no sublane-row loops (measured 37 us -> ~1 us of
    # callback cost per step at N=1e5 on v5e).  The flags are
    # independent so e.g. a linear-dynamics model with a nonlinear
    # (dot-free) sensor takes the affine path for f and the
    # double-vmapped elementwise plane path for g.
    f_affine = f_aff and "noaffine" not in dbg
    g_affine = g_aff and "noaffine" not in dbg
    if f_affine or g_affine:
        zx = jnp.zeros((nx,), jnp.float32)
        tks = jnp.arange(T, dtype=jnp.float32) * Ts

        def mats(u_, tk):
            out = []
            if f_affine:
                ff = lambda xx: f_flat(xx, u_, tk, *f_consts)
                out += [jax.jacfwd(ff)(zx).reshape(nx * nx), ff(zx)]
            if g_affine:
                gg = lambda xx: g_flat(xx, u_, tk, *g_consts)
                out += [jax.jacfwd(gg)(zx).reshape(ny * nx), gg(zx)]
            return jnp.concatenate(out)

        coef = jax.vmap(mats)(us_full, tks)
        ab = _blocked(coef, coef.shape[1])
    else:
        ab = jnp.zeros((TB, 1, LB), jnp.float32)

    if x0 is None:
        x0p = jnp.zeros((nx, 8, NL), jnp.float32)
        has_x0 = False
    else:
        from .resample_route import _to_planes

        x0 = jnp.asarray(x0, jnp.float32)
        x0p = jnp.stack([_to_planes(x0[:, d], N, NL) for d in range(nx)])
        has_x0 = True

    if w0 is None:
        w0p = jnp.zeros((8, NL), jnp.float32)
        has_w0 = False
    else:
        from .resample_route import _to_planes

        w0p = _to_planes(jnp.asarray(w0, jnp.float32), N, NL)
        has_w0 = True

    kernel = functools.partial(
        _pf_kernel, T=T, TB=TB, LB=LB, N=N, NL=NL, NB=NB, nx=nx, ny=ny,
        nu=nu, Ts=Ts, thresh=thresh, nf=nf, ng=ng, nw=nw, f_flat=f_flat,
        g_flat=g_flat, w_flat=w_flat, gauss_meas=gauss_meas,
        use_prng=_on_tpu() and "noprng" not in dbg,
        has_x0=has_x0, no_resample=_debug_no_resample, dbg=dbg,
        f_affine=f_affine, g_affine=g_affine, want_means=want_means,
        want_cov=want_cov, has_w0=has_w0, want_final=want_final,
        f_ew=f_ew and "norowv" not in dbg,
        g_ew=g_ew and "norowv" not in dbg, w_ew=w_ew)
    nmom = nx + (nx * (nx + 1)) // 2 if want_cov else nx
    consts = [jnp.asarray(c) for c in [*f_consts, *g_consts, *w_consts]]
    out_shape = [
        jax.ShapeDtypeStruct((1, 1), jnp.float32),
        jax.ShapeDtypeStruct((1, 1), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    scratch = [
        pltpu.VMEM((nx, 8, NL), jnp.float32),   # cloud planes
        pltpu.VMEM((8, NL), jnp.float32),       # log-weights
        pltpu.SMEM((2,), jnp.float32),          # ll, n_resamples
    ]
    if want_means:
        out_shape.append(jax.ShapeDtypeStruct((TB, nmom, LB), jnp.float32))
        out_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        scratch.append(pltpu.VMEM((nmom, 8, LB), jnp.float32))  # moment acc
    if want_final:
        out_shape.append(jax.ShapeDtypeStruct((nx, 8, NL), jnp.float32))
        out_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((8, NL), jnp.float32))
        out_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    with jax.default_matmul_precision("highest"):
        outs = pl.pallas_call(
            kernel,
            out_shape=tuple(out_shape),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (11 + len(consts)),
            out_specs=tuple(out_specs),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                # small clouds: the tuned N<=1e5 configs compile at 32M;
                # anything past that pins the physical 127M — Mosaic's
                # reported stack need GROWS with the limit itself (84.7M
                # limit -> 93.8M need), so only the 32M and 127M
                # endpoints are calibrated; estimate-sized mid-band
                # limits are never issued (ADVICE r4 medium)
                vmem_limit_bytes=(127 << 20)
                if _pf_vmem_est(N, nx) > (32 << 20)
                else (32 << 20)),
            interpret=pltpu.InterpretParams() if not _on_tpu() else False,
        )(jnp.asarray(seed, jnp.int32).reshape(1), ysb, usb, L1, mu1,
          L2inv, mu2, L0, mu0, x0p, ab, w0p, *consts)
    ll, nresamp = outs[0], outs[1]
    if want_final:
        from .resample_route import _from_planes

        xfin_p, wfin_p = outs[-2], outs[-1]
        x_fin = jnp.stack(
            [_from_planes(xfin_p[d], N) for d in range(nx)], axis=-1)
        w_fin = _from_planes(wfin_p, N)
        return ll[0, 0], x_fin, w_fin
    if want_means:
        mom = outs[2].transpose(1, 0, 2).reshape(nmom, Tpad).T[:T]
        means = mom[:, :nx]
        if want_cov:
            raw = mom[:, nx:]  # central moments (centered in-kernel)
            covs = jnp.zeros((T, nx, nx), means.dtype)
            k = 0
            for d in range(nx):
                for e in range(d, nx):
                    covs = covs.at[:, d, e].set(raw[:, k])
                    if e != d:
                        covs = covs.at[:, e, d].set(raw[:, k])
                    k += 1
            return means, covs, ll[0, 0], nresamp[0, 0]
        return means, ll[0, 0], nresamp[0, 0]
    return ll[0, 0], nresamp[0, 0]


def _pf_kernel(seed_ref, ysb_ref, usb_ref, L1_ref, mu1_ref, L2i_ref,
               mu2_ref, L0_ref, mu0_ref, x0_ref, ab_ref, w0_ref, *rest,
               T, TB, LB, N, NL,
               NB, nx, ny, nu, Ts, thresh, nf, ng, nw, f_flat, g_flat,
               w_flat, gauss_meas, use_prng, has_x0, no_resample=False,
               dbg="", f_affine=False, g_affine=False, want_means=False,
               want_cov=False, has_w0=False, want_final=False,
               f_ew=False, g_ew=False, w_ew=False):
    nmom = nx + (nx * (nx + 1)) // 2 if want_cov else nx
    const_refs = rest[:nf + ng + nw]
    o = rest[nf + ng + nw:]
    i = 0
    ll_ref, nres_ref = o[0], o[1]
    i = 2
    mout_ref = None
    if want_means:
        mout_ref = o[i]
        i += 1
    if want_final:
        xfin_ref, wfin_ref = o[i], o[i + 1]
        i += 2
    xpl_ref, w_ref, acc_ref = o[i], o[i + 1], o[i + 2]
    i += 3
    if want_means:
        macc_ref = o[i]
    fcs = [c[:] for c in const_refs[:nf]]
    gcs = [c[:] for c in const_refs[nf:nf + ng]]
    wcs = [c[:] for c in const_refs[nf + ng:]]
    L1 = L1_ref[...]
    mu1 = mu1_ref[...]
    L2i = L2i_ref[...]
    mu2 = mu2_ref[...]
    L0 = L0_ref[...]
    mu0 = mu0_ref[...]
    cst = -0.5 * (ny * _LOG2PI) + jnp.sum(
        jnp.log(jnp.abs(jnp.diagonal(L2i))))
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LB), 1)
    idx = _iota_index(NL)
    pad = idx >= N
    logN = jnp.log(jnp.float32(N))

    def _uniform_scalar():
        if use_prng:
            b = pltpu.prng_random_bits((8, 128))
            u = (b.astype(jnp.float32) + 2147483648.0 + 1.0) / 4294967297.0
            return u[0, 0]
        return jnp.float32(0.5)

    def _normals_list(k):
        """k standard-normal [8, NL] planes; Box-Muller PAIRS (cos AND
        sin of each draw) so k planes cost ceil(k/2) bit-draw pairs."""
        if not use_prng:
            return [jnp.zeros((8, NL), jnp.float32) for _ in range(k)]
        outs = []
        while len(outs) < k:
            b1 = pltpu.prng_random_bits((8, NL))
            b2 = pltpu.prng_random_bits((8, NL))
            u1 = (b1.astype(jnp.float32) + 2147483648.0 + 1.0) / 4294967297.0
            u2 = (b2.astype(jnp.float32) + 2147483648.0) / 4294967296.0
            rr = jnp.sqrt(-2.0 * jnp.log(u1))
            # polynomial cos/sin pair: Mosaic's native jnp.cos/sin cost
            # ~2.5 us per [8, 12544] plane EACH (noise was 70% of the
            # resample-free step) — see noise._cos_sin_2pi
            cv, sv = _cos_sin_2pi(u2)
            outs.append(rr * cv)
            if len(outs) < k:
                outs.append(rr * sv)
        return outs

    # ---- init: x ~ d0 (filtering.jl:4-14), uniform weights ----------
    # The cloud/weights live in VMEM SCRATCH refs and every conditional
    # (resample trigger, t < T guard) is a `pl.when` REF MUTATION: a
    # `lax.cond` returning the [8, NL] plane tuple from both branches
    # made Mosaic's compile explode (>40 min at any size) — scf.if with
    # vector results is pathological, scf.if with memory effects (the
    # ffbs_kernel pattern) compiles in seconds.
    if has_x0:
        for d in range(nx):
            xpl_ref[d] = x0_ref[d]
    else:
        if use_prng:
            pltpu.prng_seed(seed_ref[0], -1)
        zs = _normals_list(nx)
        for d in range(nx):
            acc = jnp.zeros((8, NL), jnp.float32) + mu0[0, d]
            for e in range(nx):
                acc = acc + L0[d, e] * zs[e]
            xpl_ref[d] = acc
    if has_w0:
        # segment mode: resume from carried log-weights (sharded
        # composition — see pf_segment_fused)
        w_ref[...] = jnp.where(pad, _NEG, w0_ref[...])
    else:
        w_ref[...] = jnp.where(pad, _NEG, -logN)
    acc_ref[0] = 0.0   # ll
    acc_ref[1] = 0.0   # n_resamples

    def step_in_block(yblk, ublk, ablk, t):
        s = t % LB
        tk = t.astype(jnp.float32) * Ts
        maskf = (lane == s).astype(jnp.float32)
        y2 = (yblk @ maskf.T).T          # [1, ny]
        uvec = (ublk @ maskf.T)[:, 0] if nu > 0 else None
        if f_affine or g_affine:
            # per-step affine coefficients (f segment then g segment,
            # each present only when the matching flag is set)
            av = ablk @ maskf.T
            off_g = (nx * nx + nx) if f_affine else 0
            Mv = lambda d, e: av[d * nx + e, 0]
            cv = lambda d: av[nx * nx + d, 0]
            Hv = lambda e, j: av[off_g + e * nx + j, 0]
            dv = lambda e: av[off_g + ny * nx + e, 0]
        valid_t = t < T
        if use_prng:
            pltpu.prng_seed(seed_ref[0], t)

        # User callbacks with dots in their jaxpr are vmapped over LANES
        # only and looped over the 8 sublane rows: a double-vmap over
        # both plane axes turns every dot in the callback jaxpr into a
        # rank-3 batched dot_general, which CRASHES the Mosaic backend at
        # NL >= 8192 (bisected on v5e); rank-2 [nx, NL] dots compile at
        # every size.  Dot-free (elementwise) callbacks take the `ew`
        # plane path below: ONE double-vmapped dispatch on the full
        # [nx, 8, NL] cloud.
        Fv = jax.vmap(lambda xi: f_flat(xi, uvec, tk, *fcs),
                      in_axes=1, out_axes=1)
        Gv = jax.vmap(lambda xi: g_flat(xi, uvec, tk, *gcs),
                      in_axes=1, out_axes=1)
        Fv2 = jax.vmap(Fv, in_axes=1, out_axes=1)   # [nx,8,NL]->[nx,8,NL]
        Gv2 = jax.vmap(Gv, in_axes=1, out_axes=1)   # [nx,8,NL]->[ny,8,NL]

        def _rows(fn, out_dim):
            """Apply a [nx, NL] -> [out_dim, NL] map per sublane row."""
            rows = []
            for srow in range(8):
                xmat = jnp.concatenate(
                    [xpl_ref[d, srow:srow + 1, :] for d in range(nx)], 0)
                rows.append(fn(xmat))
            return rows

        # ---- correct: weight the CURRENT cloud (filtering.jl:164-174,
        # correct-then-predict order of filtering.jl:181-191) ----------
        Wv = (jax.vmap(lambda ev: w_flat(ev, *wcs), in_axes=1, out_axes=1)
              if not gauss_meas else None)
        Wv2 = (jax.vmap(Wv, in_axes=1, out_axes=1)   # [ny,8,NL]->[1,8,NL]
               if not gauss_meas else None)

        def _logp_planes(yh_planes):
            """logp [8, NL] from ŷ as ny full planes — Gaussian quad as
            scalar-plane combos, or the traced density in ONE
            double-vmapped dispatch (w_ew) / 8 row dispatches."""
            if gauss_meas:
                quad = jnp.zeros((8, NL), jnp.float32)
                for d in range(ny):
                    z = jnp.zeros((8, NL), jnp.float32)
                    for e in range(d + 1):                   # L2i lower-tri
                        z = z + L2i[d, e] * (
                            (y2[0, e] - mu2[0, e]) - yh_planes[e])
                    quad = quad + z * z
                return cst - 0.5 * quad                      # [8, NL]
            if w_ew:
                e_all = jnp.stack(
                    [y2[0, e] - yh_planes[e] for e in range(ny)])
                return Wv2(e_all)[0]                         # [8, NL]
            logp_rows = []
            for srow in range(8):
                e_row = jnp.concatenate(
                    [y2[0, e] - yh_planes[e][srow:srow + 1, :]
                     for e in range(ny)], 0)                 # [ny, NL]
                logp_rows.append(Wv(e_row))                  # [1, NL]
            return jnp.concatenate(logp_rows, axis=0)        # [8, NL]
        if g_affine:
            # y_hat[e] = sum_j H[e,j] x[j] + d[e] as scalar-x-plane
            # combos on the full [8, NL] planes — no row loop, no dots
            yhp = []
            for e in range(ny):
                acc = jnp.zeros((8, NL), jnp.float32) + dv(e)
                for j in range(nx):
                    acc = acc + Hv(e, j) * xpl_ref[j]
                yhp.append(acc)
            logp = _logp_planes(yhp)
        elif g_ew and "nocall" not in dbg:
            # elementwise plane path: ŷ for the whole cloud in ONE
            # double-vmapped dispatch
            yh_all = Gv2(xpl_ref[...])                       # [ny, 8, NL]
            logp = _logp_planes([yh_all[e] for e in range(ny)])
        else:
            gfn = (lambda xm: xm[:ny]) if "nocall" in dbg else Gv
            logp_rows = []
            for yh in _rows(gfn, ny):                        # [ny, NL] each
                if gauss_meas:
                    quad_r = jnp.zeros((1, NL), jnp.float32)
                    for d in range(ny):
                        zrow = jnp.zeros((1, NL), jnp.float32)
                        for e in range(d + 1):               # L2i lower-tri
                            zrow = zrow + L2i[d, e] * (
                                (y2[0, e] - mu2[0, e]) - yh[e:e + 1, :])
                        quad_r = quad_r + zrow * zrow
                    logp_rows.append(cst - 0.5 * quad_r)
                else:
                    e_row = jnp.concatenate(
                        [y2[0, e] - yh[e:e + 1, :] for e in range(ny)], 0)
                    logp_rows.append(Wv(e_row))
            logp = jnp.concatenate(logp_rows, axis=0)        # [8, NL]

        # missing measurement: skip the weight update (PFtypes.jl:109)
        missing = jnp.any(jnp.isnan(y2))
        w1 = jnp.where(pad, _NEG, w_ref[...]
                       + jnp.where(missing, 0.0, logp))

        # ---- normalize (ops/logsumexp.py bookkeeping) ---------------
        m = jnp.max(w1)
        weu = jnp.where(pad, 0.0, jnp.exp(w1 - m))
        ssum = jnp.sum(weu)
        ll_t = jnp.where(missing, 0.0, m + jnp.log(ssum))
        # subtract exactly the ll contribution: in segment mode (has_w0)
        # the carried unnormalized weights must stay recoverable as
        # w_fin + ll_acc even when a missing step opens the segment
        w2 = w1 - ll_t
        we = weu / ssum

        # ---- Neff trigger + systematic resample (resample.jl:5-36) --
        neff = 1.0 / jnp.sum(we * we)
        do = neff < jnp.float32(thresh * N) if thresh < 1.0 else (
            jnp.asarray(True))

        @pl.when(valid_t)
        def _commit_weights():
            w_ref[...] = w2
            acc_ref[0] = acc_ref[0] + ll_t

        if want_means:
            # filtered moments Σ wᵉ·x (and Σ wᵉ·x_d·x_e for the cov
            # pairs) accumulated into this block's one-hot lane slot
            # (flushed to mout_ref per block)
            @pl.when(valid_t)
            def _commit_means():
                mds = []
                for d in range(nx):
                    md = jnp.sum(we * xpl_ref[d])
                    mds.append(md)
                    macc_ref[d, 0:1, :] = macc_ref[d, 0:1, :] + md * maskf
                if want_cov:
                    # CENTRAL second moments Σ wᵉ(x_d−m_d)(x_e−m_e):
                    # the raw-moment form E[xx]−mmᵀ cancels catastroph-
                    # ically in f32 when |m| >> σ; the step mean is
                    # already in hand, so center before accumulating.
                    k = nx
                    for d in range(nx):
                        xd = xpl_ref[d] - mds[d]
                        for e in range(d, nx):
                            s2 = jnp.sum(we * xd * (xpl_ref[e] - mds[e]))
                            macc_ref[k, 0:1, :] = (macc_ref[k, 0:1, :]
                                                   + s2 * maskf)
                            k += 1

        if not no_resample:
            @pl.when(valid_t & do)
            def _resample():
                # INTEGER cumsum: weights quantized to 2^-24 granularity
                # (relative ~1e-7 — far below the f32 noise of the rest
                # of the recursion; weights below 2^-25 quantize to 0 and
                # can never be selected, which is statistically fine)
                # make the slot boundaries monotone BY CONSTRUCTION: the
                # int prefix sum is exact, and although the running total
                # can exceed 2^24 (round-half-up adds up to N/2 ulp-24s),
                # f32 rounding of a non-decreasing int sequence is
                # MONOTONE, and x -> ceil(x*s - r) preserves that — so
                # the hs_cummax repair scan the f32 formulation needed
                # (~6 us/firing, 17 roll stages) is dropped.  The draw
                # stream/boundaries differ from the XLA path either way
                # (kernel-internal contract).
                wi = jnp.floor(we * 16777216.0 + 0.5).astype(jnp.int32)
                Ci = hs_cumsum(wi, NB, NL)
                Cf = Ci.astype(jnp.float32)
                tot = jnp.max(Cf)
                r = _uniform_scalar()
                K = jnp.ceil(Cf * (jnp.float32(N) / tot) - r)
                K = jnp.clip(K, 0.0, jnp.float32(N)).astype(jnp.int32)
                K = jnp.where(pad, jnp.int32(N), K)
                routed = route_systematic(
                    [xpl_ref[d] for d in range(nx)], K, N, NL)
                for d in range(nx):
                    xpl_ref[d] = routed[d]
                w_ref[...] = jnp.where(pad, _NEG, -logN)
                acc_ref[1] = acc_ref[1] + 1.0

        # ---- predict: propagate + noise (PFtypes.jl:122-139) --------
        @pl.when(valid_t)
        def _predict():
            zs = _normals_list(nx)
            if f_affine:
                # x'[d] = sum_e M[d,e] x[e] + c[d] + mu1[d] + (L1 z)[d]
                olds = [xpl_ref[d] for d in range(nx)]  # read before write
                for d in range(nx):
                    acc = jnp.zeros((8, NL), jnp.float32) + (
                        cv(d) + mu1[0, d])
                    for e in range(nx):
                        acc = acc + Mv(d, e) * olds[e] + L1[d, e] * zs[e]
                    xpl_ref[d] = acc
            elif f_ew and "nocall" not in dbg:
                # elementwise plane path: propagate the whole cloud in
                # ONE double-vmapped dispatch, then add noise as
                # scalar-plane combos
                xn = Fv2(xpl_ref[...])                       # [nx, 8, NL]
                for d in range(nx):
                    acc = xn[d] + mu1[0, d]
                    for e in range(nx):
                        acc = acc + L1[d, e] * zs[e]
                    xpl_ref[d] = acc
            else:
                ffn = (lambda xm: xm) if "nocall" in dbg else Fv
                for srow in range(8):
                    xmat = jnp.concatenate(
                        [xpl_ref[d, srow:srow + 1, :] for d in range(nx)],
                        0)
                    xn = ffn(xmat)                           # [nx, NL]
                    # all dims of this row are read before any write
                    for d in range(nx):
                        acc = xn[d:d + 1, :] + mu1[0, d]
                        for e in range(nx):
                            acc = acc + L1[d, e] * zs[e][srow:srow + 1, :]
                        xpl_ref[d, srow:srow + 1, :] = acc

    def block(b, carry):
        yblk = ysb_ref[b]
        ublk = usb_ref[b]
        ablk = ab_ref[b]
        if want_means:
            for d in range(nmom):
                macc_ref[d] = jnp.zeros((8, LB), jnp.float32)

        def inner(s, c):
            step_in_block(yblk, ublk, ablk, b * LB + s)
            return c

        out = jax.lax.fori_loop(0, LB, inner, carry)
        if want_means:
            mout_ref[b] = jnp.concatenate(
                [macc_ref[d, 0:1, :] for d in range(nmom)], 0)
        return out

    jax.lax.fori_loop(0, TB, block, jnp.int32(0))
    if want_final:
        for d in range(nx):
            xfin_ref[d] = xpl_ref[d]
        wfin_ref[...] = w_ref[...]
    ll_ref[0, 0] = acc_ref[0]
    nres_ref[0, 0] = acc_ref[1]
