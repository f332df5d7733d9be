"""Benchmark harness — prints ONE JSON line for the driver.

Primary metric (BASELINE.md rebuild target): bootstrap-PF throughput in
particle-steps/s at N=1e5 on the 2-state linear-Gaussian model from the
reference's docs/src/benchmark.md, including systematic resampling every
step and the full scan loop.  Baseline: 7.37e6 particle-steps/s (single-
core Julia, docs/src/benchmark.md:48).

Extra sub-metrics mirror the other published numbers: batched KF passes @
1024 banks and the 4-state UKF 50k-step workload (docs/src/benchmark.md:158).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import lowlevelparticlefilters_jl_tpu as llpf

BASELINE_PF_PARTICLE_STEPS_PER_S = 7.37e6  # docs/src/benchmark.md:48
BASELINE_UKF_STEPS_PER_S = 50_000 / 0.01768  # docs/src/benchmark.md:158

# v5e peak MXU throughput (per chip): 197 TFLOP/s bf16 / 394 TOP/s int8.
# MFU fields below = (analytic model FLOPs / walltime) / PEAK_BF16 — an
# absolute utilization yardstick next to the Julia-relative ratios, so
# kernel-quality regressions are visible (VERDICT r01 weak #8).
PEAK_BF16_FLOPS = 197e12
# v5e HBM bandwidth per chip.  The filtering loops move bytes, not bf16
# macs, so *_bw_util = (analytic bytes-moved model / walltime) / PEAK_HBM
# is the honest roofline yardstick next to each MFU field (VERDICT r2
# weak #1): a number near 1 means the loop is at the memory roofline.
PEAK_HBM_BYTES = 819e9


def certify_kernels():
    """On-hardware exactness contracts, asserted BEFORE timing (VERDICT
    r2 missing #3): every fused pallas kernel's contract is exercised on
    the real Mosaic output, not interpret mode.  A deliberate numerics
    break flips the matching flag (and `kernels_verified`) to False."""
    from lowlevelparticlefilters_jl_tpu.ops.resample import resample_systematic
    from lowlevelparticlefilters_jl_tpu.ops.pallas.noise import (
        _on_tpu, pallas_normal)

    checks = {}
    if not _on_tpu():
        checks["kernels_verified"] = False
        checks["note"] = "no TPU backend; kernels not exercised"
        return checks

    rng = np.random.default_rng(0)
    N = 100_000
    x = jnp.asarray(rng.normal(size=(N, 2)), jnp.float32)
    we_np = rng.random(N).astype(np.float32) ** 12  # heavy skew: hard case
    we = jnp.asarray(we_np / we_np.sum())
    key = jax.random.PRNGKey(0)
    want = np.asarray(
        jax.device_get(jnp.take(x, resample_systematic(we, key), axis=0)))

    # windowed-MXU resample kernel: bitwise vs x[resample_systematic(we)]
    try:
        from lowlevelparticlefilters_jl_tpu.ops.pallas.resample_v2 import (
            fused_systematic_gather)

        got = np.asarray(jax.device_get(
            jax.jit(lambda x, w, k: fused_systematic_gather(x, w, k)[0])(
                x, we, key)))
        checks["resample_v2_bitwise"] = bool(np.array_equal(got, want))
    except Exception as e:
        checks["resample_v2_bitwise"] = False
        checks["resample_v2_error"] = repr(e)[:160]

    # monotone-routing resample kernel: same bitwise contract
    try:
        from lowlevelparticlefilters_jl_tpu.ops.pallas.resample_route import (
            fused_systematic_gather_route)

        got = np.asarray(jax.device_get(
            jax.jit(fused_systematic_gather_route)(x, we, key)))
        checks["resample_route_bitwise"] = bool(np.array_equal(got, want))
    except Exception as e:
        checks["resample_route_bitwise"] = False
        checks["resample_route_error"] = repr(e)[:160]

    # FFBS chunked sweep: every backward row is an exact forward-particle
    # copy (the one-hot select is a true gather), at the M=1000/N=65536
    # size the chunk loop serves
    try:
        from lowlevelparticlefilters_jl_tpu.ops.pallas.ffbs_kernel import (
            ffbs_backward_pallas)

        T, M, NN, nx = 9, 1000, 65536, 2
        ks = jax.random.split(jax.random.PRNGKey(1), 3)
        xf = jax.random.normal(ks[0], (T - 1, NN, nx), jnp.float32)
        wf = 0.1 * jax.random.normal(ks[1], (T - 1, NN), jnp.float32)
        xbT = jax.random.normal(ks[2], (M, nx), jnp.float32)
        L = jnp.linalg.cholesky(0.01 * jnp.eye(nx, dtype=jnp.float32))
        out = np.asarray(jax.device_get(ffbs_backward_pallas(
            0.97 * xf, wf, xf, xbT, L, jnp.zeros(nx, jnp.float32), 3)))
        xfn = np.asarray(jax.device_get(xf))
        ok = all(
            bool((out[t][:, None, :] == xfn[t][None, :, :])
                 .all(-1).any(-1).all())
            for t in (0, T // 2, T - 2))
        checks["ffbs_select_exact_copy"] = ok
    except Exception as e:
        checks["ffbs_select_exact_copy"] = False
        checks["ffbs_select_exact_error"] = repr(e)[:160]

    # hardware-PRNG noise kernel: moment sanity on 2^20 draws (kurtosis
    # included — the moment most sensitive to the polynomial cos/sin
    # pair that replaced Mosaic's ~2.5 us/plane native trig)
    try:
        z = np.asarray(jax.device_get(pallas_normal(7, (1 << 20,))))
        checks["noise_moments"] = bool(
            abs(float(z.mean())) < 0.01
            and abs(float(z.std()) - 1.0) < 0.01
            and abs(float((z ** 3).mean())) < 0.02
            and abs(float((z ** 4).mean()) - 3.0) < 0.06)
    except Exception as e:
        checks["noise_moments"] = False
        checks["noise_error"] = repr(e)[:160]

    # fused associative-scan kernel vs the HIGHEST-precision XLA oracle
    # (real Mosaic output; the default bf16 oracle passes drift ~1e-2).
    # nx=4 covers the wide-lane layout (L=512), nx=6 the narrow-lane
    # one (L=128) that the CPU interpret tests cannot afford to compile
    # (test_assoc_scan_kernel.py caps at nx=3); the nx=6 check also
    # exercises the smoother combine.
    def _assoc_cert(nxs, with_smooth):
        from lowlevelparticlefilters_jl_tpu.ops.pallas.assoc_scan import (
            filter_scan, smooth_scan)
        from lowlevelparticlefilters_jl_tpu.parallel.temporal import (
            _filter_combine, _smooth_combine)

        rng2 = np.random.default_rng(5 + nxs)
        T = 4096
        A = jnp.asarray(rng2.normal(size=(T, nxs, nxs)) * 0.3, jnp.float32)
        b = jnp.asarray(rng2.normal(size=(T, nxs)), jnp.float32)
        Ch = rng2.normal(size=(T, nxs, nxs)) * 0.3
        Cm = jnp.asarray(Ch @ np.swapaxes(Ch, -1, -2) + 0.1 * np.eye(nxs),
                         jnp.float32)
        eta = jnp.asarray(rng2.normal(size=(T, nxs)), jnp.float32)
        Jh = rng2.normal(size=(T, nxs, nxs)) * 0.3
        Jm = jnp.asarray(Jh @ np.swapaxes(Jh, -1, -2) + 0.1 * np.eye(nxs),
                         jnp.float32)
        with jax.default_matmul_precision("highest"):
            want = jax.jit(lambda *e: jax.lax.associative_scan(
                _filter_combine, e))(A, b, Cm, eta, Jm)
        xt, _ = jax.jit(lambda *e: filter_scan(*e))(A, b, Cm, eta, Jm)
        err = float(jnp.max(jnp.abs(xt - want[1]))
                    / (1e-6 + float(jnp.max(jnp.abs(want[1])))))
        ok = err < 1e-3
        if with_smooth:
            E = jnp.asarray(rng2.normal(size=(T, nxs, nxs)) * 0.4,
                            jnp.float32)
            g = jnp.asarray(rng2.normal(size=(T, nxs)), jnp.float32)
            Lh = rng2.normal(size=(T, nxs, nxs)) * 0.3
            Lm = jnp.asarray(Lh @ np.swapaxes(Lh, -1, -2), jnp.float32)
            with jax.default_matmul_precision("highest"):
                wantS = jax.jit(lambda *e: jax.lax.associative_scan(
                    lambda l, r: _smooth_combine(r, l), e,
                    reverse=True))(E, g, Lm)
            xT, _ = jax.jit(lambda *e: smooth_scan(*e))(E, g, Lm)
            errS = float(jnp.max(jnp.abs(xT - wantS[1]))
                         / (1e-6 + float(jnp.max(jnp.abs(wantS[1])))))
            ok = ok and errS < 1e-3
        return bool(ok)

    # record the exception repr alongside any False so a Mosaic crash on
    # the untested-in-CI nx>=4 hardware layouts is diagnosable from the
    # JSON artifact (ADVICE r3: interpret-mode CI caps at nx=3)
    try:
        checks["assoc_scan_vs_oracle"] = _assoc_cert(4, with_smooth=False)
    except Exception as e:
        checks["assoc_scan_vs_oracle"] = False
        checks["assoc_scan_error"] = repr(e)[:160]
    try:
        checks["assoc_scan_nx6_vs_oracle"] = _assoc_cert(6, with_smooth=True)
    except Exception as e:
        checks["assoc_scan_nx6_vs_oracle"] = False
        checks["assoc_scan_nx6_error"] = repr(e)[:160]

    # round-5 affine whole-scan KF kernel (steady-state Riccati freeze)
    # vs the HIGHEST-precision sequential oracle on the CV model
    try:
        dt_s = 0.1
        Acv = jnp.array([[1, 0, dt_s, 0], [0, 1, 0, dt_s], [0, 0, 1, 0],
                         [0, 0, 0, 1]], jnp.float32)
        Ccv = jnp.array([[1, 0, 0, 0], [0, 1, 0, 0]], jnp.float32)
        ukf_c = llpf.make_ukf(
            lambda x, u, p, t: Acv @ x, lambda x, u, p, t: Ccv @ x,
            0.1 * jnp.eye(4, dtype=jnp.float32),
            1.0 * jnp.eye(2, dtype=jnp.float32), ny=2, nu=0)
        ys_c = jax.random.normal(jax.random.PRNGKey(5), (4096, 2),
                                 jnp.float32)
        ll_k = float(jax.device_get(jax.jit(
            lambda y: llpf.ukf_loglik_fused(ukf_c, y))(ys_c)))
        with jax.default_matmul_precision("highest"):
            ll_o = float(jax.device_get(jax.jit(lambda y: llpf.loglik(
                ukf_c, None, y, method="sequential"))(ys_c)))
        checks["akf_kernel_vs_oracle"] = bool(
            abs(ll_k - ll_o) < 1e-3 * max(1.0, abs(ll_o)))
    except Exception as e:
        checks["akf_kernel_vs_oracle"] = False
        checks["akf_kernel_error"] = repr(e)[:160]

    # round-5 manifold hooks (custom innovation/mean) inside the fused
    # UKF kernel, angle-wrap filter vs the HIGHEST-precision oracle
    try:
        def _wrapa(a):
            return jnp.mod(a + jnp.pi, 2 * jnp.pi) - jnp.pi

        mm_a = llpf.UKFMeasurementModel(
            measurement=lambda x, u, p, t: x[:1],
            R2=0.05 * jnp.eye(1, dtype=jnp.float32), ny=1,
            innovation=lambda y_, yh: _wrapa(y_ - yh))
        ukf_a = llpf.UnscentedKalmanFilter(
            dynamics=lambda x, u, p, t: jnp.array(
                [_wrapa(x[0] + 0.1 * x[1]), 0.98 * x[1]], x.dtype),
            measurement_model=mm_a,
            R1=jnp.diag(jnp.array([0.01, 0.001], jnp.float32)), nu=0)
        angs = jnp.cumsum(0.12 * jnp.ones((4096,))) - 2.0
        ys_a = jnp.asarray(
            _wrapa(angs)[:, None] + 0.1 * jax.random.normal(
                jax.random.PRNGKey(6), (4096, 1)), jnp.float32)
        ll_k = float(jax.device_get(jax.jit(
            lambda y: llpf.ukf_loglik_fused(ukf_a, y))(ys_a)))
        with jax.default_matmul_precision("highest"):
            ll_o = float(jax.device_get(jax.jit(lambda y: llpf.loglik(
                ukf_a, None, y, method="sequential"))(ys_a)))
        checks["manifold_hooks_vs_oracle"] = bool(
            abs(ll_k - ll_o) < 1e-3 * max(1.0, abs(ll_o)))
    except Exception as e:
        checks["manifold_hooks_vs_oracle"] = False
        checks["manifold_hooks_error"] = repr(e)[:160]

    # round-5 whole-scan bank KF kernel (VMEM-resident bank) vs the
    # plane-path oracle — the two must agree to f32 tolerance on the
    # real Mosaic output
    try:
        Ab = jnp.array([[0.97043, -0.097368], [0.097368, 0.970437]],
                       jnp.float32)
        kfb = llpf.KalmanFilter(Ab, jnp.array([[0.1], [0.0]], jnp.float32),
                                jnp.eye(2, dtype=jnp.float32), 0,
                                0.01 * jnp.eye(2, dtype=jnp.float32),
                                0.1 * jnp.eye(2, dtype=jnp.float32))
        usb = 0.3 * jnp.ones((512, 100, 1), jnp.float32)
        ysb = jax.random.normal(jax.random.PRNGKey(9), (512, 100, 2),
                                jnp.float32)
        ll_k = np.asarray(jax.device_get(jax.jit(
            lambda u, y: llpf.kf_bank_loglik(kfb, u, y, method="kernel"))(
                usb, ysb)))
        ll_p = np.asarray(jax.device_get(jax.jit(
            lambda u, y: llpf.kf_bank_loglik(kfb, u, y, method="plane"))(
                usb, ysb)))
        checks["bank_kernel_vs_plane"] = bool(
            np.allclose(ll_k, ll_p, rtol=1e-4, atol=1e-3))
    except Exception as e:
        checks["bank_kernel_vs_plane"] = False
        checks["bank_kernel_error"] = repr(e)[:160]

    checks["kernels_verified"] = all(
        v for k, v in checks.items() if isinstance(v, bool))
    return checks


# v5e VPU: one (8, 128) vreg per ALU per cycle, 4 ALUs, 1.5 GHz (clock
# from 197e12 bf16 / (4 MXU · 128·128 · 2)).  The fused whole-scan
# kernels are VPU loops, so their roofline is ISSUE-bound, not MXU/HBM:
# bound = (vreg-ops per step) / (4 · 1.5e9).  Transcendentals (exp, log,
# sqrt, sin, cos) run on the slow path — weighted ×8 vreg-ops.
VPU_ALUS = 4
VPU_CLOCK = 1.5e9
TRANSC_W = 8


def _pf_scan_plane_passes(nx, ny):
    """Analytic per-step [8, NL]-plane passes of the fused PF kernel's
    AFFINE+Gaussian path (ops/pallas/pf_scan.py step_in_block), counting
    each full-plane arithmetic op as one pass; resample passes excluded
    (amortized by the Neff firing rate, reported separately)."""
    weight = ny * 2 * nx + ny * (ny + 1) + 2 * ny   # yhp + whitened quad
    w_update = 3                                     # w1 add/where/pad
    norm = 4 + TRANSC_W + 2                          # max,sub,sum,div + exp
    neff = 2                                         # we*we + reduce
    noise = nx * (2 + TRANSC_W * 2)                  # bits→u + log/sqrt/trig
    predict = nx * (1 + 2 * nx + 2 * nx)             # c + Mx + L1z fmas
    return weight + w_update + norm + neff + noise + predict


def _pf_scan_bound_us(N, nx, ny):
    NL = 128 * (-(-N // 1024))
    vregs = (8 * NL) // 1024
    passes = _pf_scan_plane_passes(nx, ny)
    return passes * vregs / (VPU_ALUS * VPU_CLOCK) * 1e6


def _assoc_combine_ops(nx):
    """Exact vreg-op count of one plane-form filter combine, by tracing
    its jaxpr (the combine runs on full (8, L) planes in the kernel —
    every eqn is one vreg-op per plane)."""
    from lowlevelparticlefilters_jl_tpu.parallel.temporal import (
        _filter_combine_soa)

    leaf = jnp.zeros((1,), jnp.float32)
    mat = tuple(tuple(leaf for _ in range(nx)) for _ in range(nx))
    vec = tuple(leaf for _ in range(nx))
    e = (mat, vec, mat, vec, mat)
    jaxpr = jax.make_jaxpr(_filter_combine_soa)(e, e)
    return len(jaxpr.jaxpr.eqns)


def _assoc_scan_bound_ns(nx, L=512):
    """Per-element issue bound of the fused assoc-scan kernel: each
    8L-element block runs ~(log2 L + 3 sublane + 2 full) combines, each
    combine = K vreg-ops on (8, L) planes = K·(8L/1024) vregs."""
    import math

    K = _assoc_combine_ops(nx)
    combines = math.log2(L) + 2          # sublane sweeps are [8,1] — free
    # block: combines · K plane-ops · (8L/1024) vregs, over 8L elements
    cycles_per_elem = K * combines / 1024
    return cycles_per_elem / (VPU_ALUS * VPU_CLOCK) * 1e9


def _ukf_step_ops(ukf, ys):
    """Proxy op count for one sequential UKF step: eqns of the XLA-step
    jaxpr (every op in the fused kernel is a single small vreg-op).  The
    step is a dependency CHAIN, so the bound uses 1 ALU — the resulting
    util measures how far per-op latency (not issue width) dominates."""
    state0 = ukf.init()
    jaxpr = jax.make_jaxpr(
        lambda s, y: ukf.update(s, None, y, None, 0.0))(state0, ys[0])
    return len(jaxpr.jaxpr.eqns)


def _timeit(fn, *args, repeats=3):
    jax.block_until_ready(fn(*args))  # compile + warm cache
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.device_get(fn(*args))  # full sync incl. device-to-host copy
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]  # median — robust to transport flakes


def _tslope(make, T1, T2, slopes=1):
    """Steady-state rate via the T-slope: time the same jitted workload at
    two trajectory lengths and divide the extra work by the extra time.
    The axon relay adds ~27 ms of per-dispatch RPC latency; any wall-time
    at T where compute ≲ 100 ms mis-reports throughput by up to ~6x.
    ``make(T) -> (fn, args, work_units)``.  Returns (units/s, dt(T1)).

    The denominator is floored at 1 ms (the relay's run-to-run jitter
    scale): when a workload's marginal cost shrinks below that, the
    reported rate degrades to an honest LOWER bound instead of a
    jitter-divided artifact — pick a larger T2 spread in that case.

    ``slopes > 1`` repeats the whole two-point measurement and takes
    the MEDIAN slope: the fastest fields' ~10 ms marginal windows
    sampled ±40% run-to-run through the relay (r5: the parallel-KF
    field ranged 0.3-4.2 ns/step across otherwise identical runs), and
    a median of 3 independent slopes is an honest variance reducer
    where min-of-slopes would bias low."""
    fn1, args1, w1 = make(T1)
    fn2, args2, w2 = make(T2)
    rates = []
    dt1 = None
    for _ in range(max(1, slopes)):
        d1 = _timeit(fn1, *args1)
        d2 = _timeit(fn2, *args2)
        dt1 = d1 if dt1 is None else min(dt1, d1)
        rates.append((w2 - w1) / max(d2 - d1, 1e-3))
    rates.sort()
    return rates[len(rates) // 2], dt1


def bench_pf(N=100_000, T=1_000, resample_threshold=0.1, method="auto"):
    """Bootstrap-PF throughput through the PLAIN VERB ``pf.loglik``.
    ``method="auto"`` measures what a migrating user gets (on TPU the
    routing layer dispatches to the fused whole-scan kernel — the
    VERDICT r3 ask #2 criterion); ``method="sequential"`` pins the XLA
    scan for the historical pf_xla field.  ``resample_threshold=0.1``
    matches the reference's constructor default (PFtypes.jl) and hence
    its published benchmark; 1.0 forces resampling every step."""
    A = jnp.array([[0.97043, -0.097368], [0.097368, 0.970437]], dtype=jnp.float32)
    B = jnp.array([[0.1], [0.0]], dtype=jnp.float32)
    C = jnp.eye(2, dtype=jnp.float32)
    R1 = 0.01 * jnp.eye(2, dtype=jnp.float32)
    R2 = 0.1 * jnp.eye(2, dtype=jnp.float32)
    pf = llpf.ParticleFilter(
        N=N,
        dynamics=lambda x, u, p, t: A @ x + B @ u,
        measurement=lambda x, u, p, t: C @ x,
        dynamics_density=R1,
        measurement_density=R2,
        initial_density=R1,
        resample_threshold=resample_threshold,
    )
    kf = llpf.KalmanFilter(A, B, C, 0, R1, R2)
    key = jax.random.PRNGKey(0)

    # rbg keys use the TPU's RngBitGenerator — ~100x cheaper bits than
    # threefry for the per-step process noise (same PF API, same stats).
    def make(Tn):
        _, us, ys = llpf.simulate(kf, 0.3 * jnp.ones((Tn, 1), jnp.float32), key)
        run = jax.jit(lambda u, y, k: pf.loglik(u, y, key=k,
                                                method=method))
        return run, (us, ys, jax.random.key(1, impl="rbg")), N * Tn

    rate, dt = _tslope(make, T, 4 * T)
    # model FLOPs per particle-step: dynamics 2*nx^2 + noise matmul 2*nx^2
    # + weight quadratic form 2*ny^2(+exp) ≈ 24; the resample-index
    # matmul adds 2*(N/128)*128 = 2N per particle-step when it fires
    # (always for threshold=1.0).
    per_ps = 24 + (2 * (N // 128 + 1) if resample_threshold >= 1.0 else 0)
    return rate, dt, rate * per_ps / PEAK_BF16_FLOPS


def bench_kf_bank(Bk=1024, T=200, path="bank", t2_factor=8):
    """Bank of ``Bk`` shared-model KFs.  ``path='bank'`` uses the
    shared-Riccati bank execution (filters/bank.py: covariance recursion
    once, whole-scan VMEM bank kernel on TPU / bank-major mean planes
    elsewhere); ``'plane'`` forces the round-4 prefix-compose plane
    path; ``'vmap'`` is the replicated-Riccati baseline.  The bank ll is
    cross-checked against the vmap oracle on hardware before timing."""
    A = jnp.array([[0.97043, -0.097368], [0.097368, 0.970437]], dtype=jnp.float32)
    Bm = jnp.array([[0.1], [0.0]], dtype=jnp.float32)
    C = jnp.eye(2, dtype=jnp.float32)
    R1 = 0.01 * jnp.eye(2, dtype=jnp.float32)
    R2 = 0.1 * jnp.eye(2, dtype=jnp.float32)
    kf = llpf.KalmanFilter(A, Bm, C, 0, R1, R2)
    keys = jax.random.split(jax.random.PRNGKey(0), Bk)

    def make(Tn):
        us = 0.3 * jnp.ones((Bk, Tn, 1), jnp.float32)
        ys = jax.vmap(lambda k, u: llpf.simulate(kf, u, k)[2])(keys, us)
        if path == "bank":
            run = jax.jit(lambda us, ys: llpf.kf_bank_loglik(kf, us, ys))
        elif path == "plane":
            run = jax.jit(lambda us, ys: llpf.kf_bank_loglik(
                kf, us, ys, method="plane"))
        else:
            run = jax.jit(lambda us, ys: jax.vmap(
                lambda u, y: llpf.loglik(kf, u, y))(us, ys))
        return run, (us, ys), Bk * Tn

    run1, (us1, ys1), _ = make(T)
    if path == "bank":
        ll_b = np.asarray(jax.device_get(run1(us1, ys1)))
        ll_o = np.asarray(jax.device_get(jax.jit(lambda us, ys: jax.vmap(
            lambda u, y: llpf.loglik(kf, u, y))(us, ys))(us1, ys1)))
        # rtol bound set by the ORACLE: on v5e the vmapped scan's matmuls
        # run bf16 passes and drift ~2e-3 from the x64 truth, while the
        # bank path (precision=HIGHEST einsums) sits at ~5e-5 (measured;
        # tests/test_kf_bank.py pins 1e-8 agreement on CPU x64).
        ll_ok = bool(np.allclose(ll_b, ll_o, rtol=2e-2))
    else:
        ll_ok = True
    # t2_factor: the plane/associative bank pass costs ~0.35 ns per
    # lane-step, so the T2 run must be long enough for the marginal
    # compute to clear the ~1 ms relay jitter (T2 = 128·T at B = 1024)
    step_rate, dt = _tslope(make, T, t2_factor * T)
    # model FLOPs per KF step (nx=2, ny=2, nu=1): predict 2(2nx^3+nx^2 nu)
    # + correct ~ 2(2 nx^2 ny + ny^3 + nx ny^2 + nx ny) ≈ 150 flops.
    return step_rate / T, dt, step_rate * 150 / PEAK_BF16_FLOPS, ll_ok


def bench_ukf(T=50_000):
    # 4-state/2-output constant-velocity model (docs/src/benchmark.md:120-158)
    dt_s = 0.1
    A = jnp.array(
        [[1, 0, dt_s, 0], [0, 1, 0, dt_s], [0, 0, 1, 0], [0, 0, 0, 1]],
        dtype=jnp.float32,
    )
    C = jnp.array([[1, 0, 0, 0], [0, 1, 0, 0]], dtype=jnp.float32)
    R1 = 0.1 * jnp.eye(4, dtype=jnp.float32)
    R2 = 1.0 * jnp.eye(2, dtype=jnp.float32)
    ukf = llpf.make_ukf(
        lambda x, u, p, t: A @ x,
        lambda x, u, p, t: C @ x,
        R1,
        R2,
        ny=2,
        nu=0,
    )
    key = jax.random.PRNGKey(0)
    ys = jax.random.normal(key, (T, 2), dtype=jnp.float32)

    run = jax.jit(lambda ys: llpf.loglik(ukf, None, ys,
                                         method="sequential"))
    dt = _timeit(run, ys)

    # T-slope for the kernel-speed fields: at ~1.6 us/step a flat
    # _timeit(T=50k) folds the ~27 ms relay dispatch into the rate
    # (~25% underreport)
    ys8 = jax.random.normal(key, (8 * T, 2), dtype=jnp.float32)

    # the plain verb — what a migrating user gets.  Since round 5 the
    # affine-detected UKF auto-routes to the temporal-parallel plain-KF
    # reduction (routing._affine_equiv_kf): the rate is parallel-KF
    # class, so it needs the wide-spread _tslope (the old flat 8x
    # two-point form went jitter-negative at these speeds)
    def make_routed(Tn):
        ysn = jax.random.normal(key, (Tn, 2), dtype=jnp.float32)
        runr = jax.jit(lambda ys: llpf.loglik(ukf, None, ys))
        return runr, (ysn,), Tn

    routed_rate, _ = _tslope(make_routed, 100_000, 32 * 100_000, slopes=3)

    # whole-scan pallas kernel (ops/pallas/ukf_scan.py)
    runf = jax.jit(lambda ys: llpf.ukf_loglik_fused(ukf, ys))
    dtf1 = _timeit(runf, ys)
    fused_rate = 7 * T / max(_timeit(runf, ys8) - dtf1, 1e-3)

    # the TPU-native execution mode: a bank of 1024 independent UKF passes
    Bk = 1024

    def make(Tn):
        ysb = jax.random.normal(jax.random.PRNGKey(1), (Bk, Tn, 2), dtype=jnp.float32)
        runb = jax.jit(lambda ysb: jax.vmap(lambda y: llpf.loglik(ukf, None, y))(ysb))
        return runb, (ysb,), Bk * Tn

    bank_rate, _ = _tslope(make, 1000, 4000)

    # affine-routed bank: ukf_bank_loglik statically detects the affine
    # callbacks and runs the EXACT equivalent through the shared-Riccati
    # plane-pipeline KF bank (filters/bank.py)
    Bk2 = 8192

    def make_aff(Tn):
        ysb = jax.random.normal(jax.random.PRNGKey(2), (Bk2, Tn, 2),
                                dtype=jnp.float32)
        runb = jax.jit(lambda ysb: llpf.ukf_bank_loglik(
            ukf, None, ysb).sum())
        return runb, (ysb,), Bk2 * Tn

    try:
        bank_aff_rate, _ = _tslope(make_aff, 200, 6400)
    except Exception:
        bank_aff_rate = float("nan")
    return T / dt, dt, bank_rate, fused_rate, bank_aff_rate, routed_rate


def bench_ffbs(N=1000, M=1000, T=500):
    """FFBS particle smoother — the reference's most compute-intensive
    routine (O(T·M·N) weight evaluations, smoothing.jl:129-141); the
    Gaussian fast path turns the weight matrix into an MXU matmul."""
    A = jnp.array([[0.97043, -0.097368], [0.097368, 0.970437]], dtype=jnp.float32)
    B = jnp.array([[0.1], [0.0]], dtype=jnp.float32)
    R1 = 0.01 * jnp.eye(2, dtype=jnp.float32)
    R2 = 0.1 * jnp.eye(2, dtype=jnp.float32)
    pf = llpf.ParticleFilter(
        N=N,
        dynamics=lambda x, u, p, t: A @ x + B @ u,
        measurement=lambda x, u, p, t: x,
        dynamics_density=R1,
        measurement_density=R2,
        initial_density=R1,
    )
    kf = llpf.KalmanFilter(A, B, jnp.eye(2, dtype=jnp.float32), 0, R1, R2)

    def make(Tn):
        _, us, ys = llpf.simulate(kf, 0.3 * jnp.ones((Tn, 1), jnp.float32),
                                  jax.random.PRNGKey(0))
        # sync on an on-device reduction of the full [T, M, nx] result: the
        # axon relay fetches FRESH device arrays at only ~40 MB/s, so
        # device_get'ing the trajectory itself attributes ~150 us/step of
        # transport to the smoother (this hid the kernel's real speed in
        # BENCH_r02's 5.1 G evals/s figure).
        run = jax.jit(lambda k: pf.smooth(us, ys, M=M, key=k)[0].sum())
        return run, (jax.random.key(3, impl="rbg"),), Tn * M * N

    rate, dt = _tslope(make, T, 4 * T)
    # model FLOPs: per backstep one [M,nx]x[nx,N] cross matmul (2*M*N*nx)
    # plus the forward PF pass (negligible); nx=2.
    return rate, dt, rate * 4 / PEAK_BF16_FLOPS


def bench_pf_fused(N=100_000, T=512, T2=4096, resample_threshold=0.1,
                   no_resample=False):
    """Whole-scan fused PF kernel (ops/pallas/pf_scan.py): the entire
    bootstrap recursion resident in VMEM.  Also cross-checks the fused
    log-likelihood against the exact KF (statistical certification of
    the in-kernel math; tolerance 1% of |ll|)."""
    A = jnp.array([[0.97043, -0.097368], [0.097368, 0.970437]], dtype=jnp.float32)
    B = jnp.array([[0.1], [0.0]], dtype=jnp.float32)
    C = jnp.eye(2, dtype=jnp.float32)
    R1 = 0.01 * jnp.eye(2, dtype=jnp.float32)
    R2 = 0.1 * jnp.eye(2, dtype=jnp.float32)
    from lowlevelparticlefilters_jl_tpu.ops.pallas.pf_scan import (
        pf_loglik_fused)

    pf = llpf.ParticleFilter(
        N=N,
        dynamics=lambda x, u, p, t: A @ x + B @ u,
        measurement=lambda x, u, p, t: C @ x,
        dynamics_density=R1,
        measurement_density=R2,
        initial_density=R1,
        resample_threshold=resample_threshold,
    )
    kf = llpf.KalmanFilter(A, B, C, 0, R1, R2)

    def make(Tn):
        _, us, ys = llpf.simulate(kf, 0.3 * jnp.ones((Tn, 1), jnp.float32),
                                  jax.random.PRNGKey(0))
        run = jax.jit(lambda u, y, s: pf_loglik_fused(
            pf, u, y, s, _debug_no_resample=no_resample)[0])
        return run, us, ys

    run1, us1, ys1 = make(T)
    ll = float(jax.device_get(run1(us1, ys1, 0)))
    ll_kf = float(jax.device_get(
        jax.jit(lambda u, y: llpf.loglik(kf, u, y))(us1, ys1)))
    ll_ok = abs(ll - ll_kf) < 0.01 * abs(ll_kf)
    d1 = _timeit(run1, us1, ys1, 1)
    run2, us2, ys2 = make(T2)
    d2 = _timeit(run2, us2, ys2, 2)
    rate = (T2 - T) * N / max(d2 - d1, 1e-9)
    return rate, d1, ll_ok


def bench_pf_fused_nonlinear(N=100_000, T=512, T2=4096,
                             resample_threshold=0.1):
    """Generic (dot-free nonlinear) callbacks through the fused kernel's
    double-vmapped elementwise plane path — the per-step cost a user
    with a genuinely nonlinear model sees (the headline benchmark model
    is affine-detected and takes the scalar-plane fast path instead)."""
    R1 = 0.01 * jnp.eye(2, dtype=jnp.float32)
    R2 = 0.1 * jnp.eye(2, dtype=jnp.float32)
    from lowlevelparticlefilters_jl_tpu.ops.pallas.pf_scan import (
        pf_loglik_fused)

    pf = llpf.ParticleFilter(
        N=N,
        dynamics=lambda x, u, p, t: 0.9 * jnp.sin(x) + 0.1 * u[0],
        measurement=lambda x, u, p, t: jnp.tanh(x),
        dynamics_density=R1,
        measurement_density=R2,
        initial_density=llpf.MvNormal(jnp.zeros(2), jnp.eye(2)),
        resample_threshold=resample_threshold,
    )

    def make(Tn):
        ys = 0.5 * jax.random.normal(jax.random.PRNGKey(0), (Tn, 2),
                                     jnp.float32)
        us = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (Tn, 1),
                                     jnp.float32)
        run = jax.jit(lambda u, y, s: pf_loglik_fused(pf, u, y, s)[0])
        return run, us, ys

    run1, us1, ys1 = make(T)
    ll = float(jax.device_get(run1(us1, ys1, 1)))
    d1 = _timeit(run1, us1, ys1, 1)
    run2, us2, ys2 = make(T2)
    d2 = _timeit(run2, us2, ys2, 2)
    rate = (T2 - T) * N / max(d2 - d1, 1e-9)
    return rate, d1, bool(np.isfinite(ll))


def bench_parallel_ukf(T=50_000, iters=2):
    """O(log T) iterated sigma-point smoother on the 4-state CV model —
    the single-stream UKF workload (docs/src/benchmark.md:158) answered
    with temporal parallelism instead of a sequential scan."""
    dt_s = 0.1
    A = jnp.array(
        [[1, 0, dt_s, 0], [0, 1, 0, dt_s], [0, 0, 1, 0], [0, 0, 0, 1]],
        dtype=jnp.float32,
    )
    C = jnp.array([[1, 0, 0, 0], [0, 1, 0, 0]], dtype=jnp.float32)
    R1 = 0.1 * jnp.eye(4, dtype=jnp.float32)
    R2 = 1.0 * jnp.eye(2, dtype=jnp.float32)
    ukf = llpf.make_ukf(
        lambda x, u, p, t: A @ x,
        lambda x, u, p, t: C @ x,
        R1, R2, ny=2, nu=0,
    )
    def make(Tn):
        ys = jax.random.normal(jax.random.PRNGKey(0), (Tn, 2),
                               dtype=jnp.float32)
        run = jax.jit(lambda ys: llpf.parallel_ukf_smooth(
            ukf, None, ys, iters=iters).xT.sum())
        return run, (ys,), Tn

    # 16x spread: the plane-pipeline smoother costs ~17 ns/step, so the
    # marginal work must clear the ~1 ms relay jitter (12.7 ms at 16x)
    rate, dt = _tslope(make, T, 16 * T)
    return rate, dt


def bench_parallel_ukf_nonlinear(T=50_000, iters=4):
    """The honest NONLINEAR single-stream number: iterated sigma-point
    smoother on a quadtank-style square-root-outflow model — no affine
    fast path applies, every iteration runs the full unscented SLR."""
    g1 = lambda x: jnp.sqrt(jnp.abs(x) + 0.1)

    def dyn(x, u, p, t):
        return x + 0.1 * jnp.array(
            [-g1(x[0]) + 0.5 * g1(x[1]), -0.5 * g1(x[1]) + 0.1])

    ukf = llpf.make_ukf(
        dyn, lambda x, u, p, t: x,
        0.001 * jnp.eye(2, dtype=jnp.float32),
        0.01 * jnp.eye(2, dtype=jnp.float32), ny=2, nu=0,
        d0=llpf.MvNormal(jnp.array([1.0, 1.0], jnp.float32),
                         0.1 * jnp.eye(2, dtype=jnp.float32)))

    def make(Tn):
        ys = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(0),
                                           (Tn, 2), jnp.float32)
        run = jax.jit(lambda y: llpf.parallel_ukf_smooth(
            ukf, None, y, iters=iters).xT.sum())
        return run, (ys,), Tn

    # 8x spread: ~44 ns/step needs >10 ms marginal to clear relay jitter
    rate, dt = _tslope(make, T, 8 * T)
    return rate, dt


def bench_parallel_kf(T=100_000):
    """O(log T) associative-scan KF vs the sequential scan on one long
    trajectory (Sarkka & Garcia-Fernandez temporal parallelization)."""
    A = jnp.array([[0.97043, -0.097368], [0.097368, 0.970437]], dtype=jnp.float32)
    B = jnp.array([[0.1], [0.0]], dtype=jnp.float32)
    kf = llpf.KalmanFilter(A, B, jnp.eye(2, dtype=jnp.float32), 0,
                           0.01 * jnp.eye(2, dtype=jnp.float32),
                           0.1 * jnp.eye(2, dtype=jnp.float32))
    us = 0.3 * jnp.ones((T, 1), jnp.float32)
    ys = 0.3 * jax.random.normal(jax.random.PRNGKey(0), (T, 2), jnp.float32)
    seq = jax.jit(lambda u, y: llpf.forward_trajectory(
        kf, u, y, method="sequential").ll)
    par = jax.jit(lambda u, y: llpf.parallel_forward_trajectory(kf, u, y).ll)
    dt_seq = _timeit(seq, us, ys)
    dt_par = _timeit(par, us, ys)

    # steady-state per-step cost of the parallel path (T-slope), for the
    # assoc-scan issue-util roofline field
    def make(Tn):
        ysn = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (Tn, 2),
                                      jnp.float32)
        usn = 0.3 * jnp.ones((Tn, 1), jnp.float32)
        return par, (usn, ysn), Tn

    # wide spread: at ~1.6 ns/step the marginal time must clear the
    # ~1 ms relay jitter floor with margin (r4's 32x-from-100k spread
    # left ~5 ms marginal and sampled 0.3-4.2 ns run-to-run; 2T..64T
    # doubles the marginal window)
    par_rate, _ = _tslope(make, 2 * T, 64 * T, slopes=3)
    return dt_seq / dt_par, dt_seq, dt_par, par_rate


def _roofline_fields(pff_step_rate, pkf_rate, ukf_fused_rate):
    """Fused-kernel issue-bound rooflines (VERDICT r3 ask #6): analytic
    per-step vreg-op models vs measured per-step cost.  The pf_scan and
    assoc_scan bounds assume full 4-ALU issue; ukf_scan's step is one
    long dependency chain, so its bound uses 1 ALU and the (low) util
    says per-op LATENCY dominates — the documented sequential floor."""
    out = {}
    try:
        # step-only rate (resampling disabled): the util of the KERNEL's
        # per-step work — mixing the amortized resample firings in made
        # the field model-dependent
        bound = _pf_scan_bound_us(100_000, 2, 2)
        step_us = 100_000 / pff_step_rate * 1e6
        out["pf_scan_step_bound_us"] = round(bound, 3)
        out["pf_scan_issue_util"] = round(bound / step_us, 3)
    except Exception:
        pass
    try:
        from lowlevelparticlefilters_jl_tpu.ops.pallas.assoc_scan import (
            _lane_width)

        bound_ns = _assoc_scan_bound_ns(2, L=_lane_width(2))
        step_ns = 1e9 / pkf_rate
        out["assoc_scan_ns_per_step"] = round(step_ns, 2)
        out["assoc_scan_step_bound_ns"] = round(bound_ns, 2)
        out["assoc_scan_issue_util"] = round(bound_ns / step_ns, 3)
    except Exception:
        pass
    try:
        dt_s = 0.1
        A = jnp.array(
            [[1, 0, dt_s, 0], [0, 1, 0, dt_s], [0, 0, 1, 0], [0, 0, 0, 1]],
            dtype=jnp.float32)
        C = jnp.array([[1, 0, 0, 0], [0, 1, 0, 0]], dtype=jnp.float32)
        ukf = llpf.make_ukf(lambda x, u, p, t: A @ x,
                            lambda x, u, p, t: C @ x,
                            0.1 * jnp.eye(4, dtype=jnp.float32),
                            1.0 * jnp.eye(2, dtype=jnp.float32), ny=2, nu=0)
        K = _ukf_step_ops(ukf, jnp.zeros((1, 2), jnp.float32))
        bound_us = K / VPU_CLOCK * 1e6          # 1 ALU: dependency chain
        step_us = 1e6 / ukf_fused_rate
        out["ukf_scan_step_bound_us"] = round(bound_us, 3)
        out["ukf_scan_issue_util"] = round(bound_us / step_us, 3)
    except Exception:
        pass
    return out


def main():
    cert = certify_kernels()
    pf_routed_rate, pf_dt, _ = bench_pf()               # plain verb, auto
    pf_rate, _, pf_mfu = bench_pf(method="sequential")  # true XLA scan
    pf_rate_full, pf_dt_full, pf_full_mfu = bench_pf(resample_threshold=1.0)
    kf_rate, kf_dt, kf_mfu, kf_ll_ok = bench_kf_bank(t2_factor=128)
    try:
        # t2_factor=128: at Bk=8192 the 32x spread's marginal time
        # (~31 ms) sits inside relay jitter and misreported 10-16 M
        # passes/s run-to-run (the r3 README/BENCH 2x discrepancy);
        # 128x is stable at ~8.2 M (measured 2026-08-18)
        kf8_rate, _, _, kf8_ll_ok = bench_kf_bank(Bk=8192, t2_factor=128)
    except Exception:
        kf8_rate, kf8_ll_ok = float("nan"), False
    try:
        # round-4 prefix-compose plane path, for the kernel-vs-plane row
        kf8p_rate, _, _, _ = bench_kf_bank(Bk=8192, path="plane",
                                           t2_factor=128)
    except Exception:
        kf8p_rate = float("nan")
    (ukf_rate, ukf_dt, ukf_bank_rate, ukf_fused_rate,
     ukf_bank_aff_rate, ukf_routed_rate) = bench_ukf()
    ffbs_rate, ffbs_dt, ffbs_mfu = bench_ffbs()
    try:
        # N-chunked kernel regime (VERDICT r2 #2): M=1000, N=65536
        ffbs_lg_rate, _, _ = bench_ffbs(N=65536, M=1000, T=24)
    except Exception:
        ffbs_lg_rate = float("nan")
    pkf_speedup, pkf_seq, pkf_par, pkf_rate = bench_parallel_kf()
    try:
        pukf_rate, pukf_dt = bench_parallel_ukf()
    except Exception:
        pukf_rate, pukf_dt = float("nan"), float("nan")
    try:
        pukf_nl_rate, _ = bench_parallel_ukf_nonlinear()
    except Exception:
        pukf_nl_rate = float("nan")
    try:
        pff_rate, pff_dt, pff_ok = bench_pf_fused()
        pff_full_rate, _, pff_full_ok = bench_pf_fused(resample_threshold=1.0)
    except Exception:
        pff_rate = pff_full_rate = float("nan")
        pff_ok = pff_full_ok = False
    try:
        pff_nl_rate, _, pff_nl_ok = bench_pf_fused_nonlinear()
    except Exception:
        pff_nl_rate, pff_nl_ok = float("nan"), False
    try:
        # step-only rate: resampling disabled — the firing cost is the
        # gap between this and the always-resample rate
        pff_step_rate, _, _ = bench_pf_fused(no_resample=True)
    except Exception:
        pff_step_rate = float("nan")
    try:
        # million-particle cloud, whole recursion in one VMEM-resident
        # kernel (r4 admission: calibrated estimate + pinned 127M limit)
        pff_1m_rate, _, pff_1m_ok = bench_pf_fused(N=1_000_000, T=256,
                                                   T2=2048)
    except Exception as e:  # records compile/admission failures in-artifact
        pff_1m_rate, pff_1m_ok = float("nan"), repr(e)[:120]

    # headline = the library's fastest supported execution of the
    # reference benchmark workload: the fused whole-scan kernel when it
    # is available AND its ll certified against the KF; else the XLA scan
    use_fused = pff_ok and pff_rate == pff_rate and pff_rate > pf_rate
    head_rate = max(pff_rate, pf_routed_rate) if use_fused else pf_rate
    head_full = (pff_full_rate
                 if (pff_full_ok and pff_full_rate == pff_full_rate
                     and pff_full_rate > pf_rate_full) else pf_rate_full)
    # KEY ORDER IS LOAD-BEARING (VERDICT r3 weak #1 / ask #1): the driver's
    # artifact keeps only a bounded TAIL of stdout, so the cert_* flags and
    # the headline fields are printed LAST, details first.  Notes/method
    # prose lives in docs/benchmark.md, not here — the whole line must stay
    # within the capture window so `parsed` is non-null.
    extra = {
        "device": jax.devices()[0].device_kind,
        "method": "T-slope",  # see docs/benchmark.md (relay adds ~27ms RPC)
        "pf_xla_steps_per_s": round(pf_rate, 1),
        "pf_routed_verb_steps_per_s": round(pf_routed_rate, 1),
        "pf_resample_every_step_steps_per_s": round(pf_rate_full, 1),
        "pf_resample_every_step_vs_baseline": round(
            pf_rate_full / BASELINE_PF_PARTICLE_STEPS_PER_S, 2),
        "kf_bank1024_passes_per_s": round(kf_rate, 1),
        "kf_bank_ll_matches_vmap": bool(kf_ll_ok),
        "kf_bank8192_passes_per_s": round(kf8_rate, 1),
        "kf_bank8192_ll_matches_vmap": bool(kf8_ll_ok),
        "kf_bank8192_plane_passes_per_s": round(kf8p_rate, 1),
        "ukf_steps_per_s_T50k": round(ukf_rate, 1),
        "ukf_routed_verb_steps_per_s_T50k": round(ukf_routed_rate, 1),
        "ukf_routed_verb_vs_julia_baseline": round(
            ukf_routed_rate / BASELINE_UKF_STEPS_PER_S, 1),
        "ukf_fused_kernel_steps_per_s_T50k": round(ukf_fused_rate, 1),
        "ukf_fused_vs_julia_baseline": round(
            ukf_fused_rate / BASELINE_UKF_STEPS_PER_S, 3),
        "ukf_bank1024_steps_per_s": round(ukf_bank_rate, 1),
        "ukf_bank8192_affine_routed_steps_per_s": round(ukf_bank_aff_rate, 1),
        "ukf_bank8192_affine_routed_vs_julia_baseline": round(
            ukf_bank_aff_rate / BASELINE_UKF_STEPS_PER_S, 1),
        "ffbs_weight_evals_per_s_MN1000_T500": round(ffbs_rate, 1),
        "ffbs_weight_evals_per_s_M1000_N65536": round(ffbs_lg_rate, 1),
        "pf_fused_step_only_steps_per_s": round(pff_step_rate, 1),
        "pf_resample_us_per_firing": round(
            1e6 * 100_000 * (1.0 / pff_full_rate - 1.0 / pff_step_rate), 2),
        "pf_fused_nonlinear_steps_per_s": round(pff_nl_rate, 1),
        "pf_fused_nonlinear_vs_baseline": round(
            pff_nl_rate / BASELINE_PF_PARTICLE_STEPS_PER_S, 2),
        "pf_fused_nonlinear_ll_finite": bool(pff_nl_ok),
        "pf_fused_N1e6_steps_per_s": round(pff_1m_rate, 1),
        "pf_fused_N1e6_ll_matches_kf": (bool(pff_1m_ok)
                                        if isinstance(pff_1m_ok, bool)
                                        else pff_1m_ok),
        "parallel_kf_speedup_T1e5": round(pkf_speedup, 2),
        "parallel_ukf_equiv_steps_per_s_T50k": round(pukf_rate, 1),
        "parallel_ukf_vs_julia_baseline": round(
            pukf_rate / BASELINE_UKF_STEPS_PER_S, 2),
        "parallel_ukf_nonlinear_steps_per_s_it4": round(pukf_nl_rate, 1),
        "parallel_ukf_nonlinear_vs_julia_baseline": round(
            pukf_nl_rate / BASELINE_UKF_STEPS_PER_S, 2),
        # rooflines: analytic bytes(or FLOPs) / walltime / v5e peak
        "pf_xla_bw_util": round(pf_rate * 48 / PEAK_HBM_BYTES, 4),
        "kf_bank_bw_util": round(kf_rate * 200 * 96 / PEAK_HBM_BYTES, 4),
        "ffbs_bw_util": round(ffbs_rate * 96 / 1000 / PEAK_HBM_BYTES, 4),
        "ffbs_mfu_vs_bf16peak": round(ffbs_mfu, 5),
        "pf_resample_every_step_mfu_vs_bf16peak": round(pf_full_mfu, 5),
        "kf_bank1024_mfu_vs_bf16peak": round(kf_mfu, 7),
        # fused-kernel rooflines: VPU ISSUE bound (vreg-ops / 4 ALUs /
        # 1.5 GHz; docs/benchmark.md) vs measured per-step cost — a
        # kernel regression moves these ratios, not just raw rates
            **_roofline_fields(pff_step_rate, pkf_rate, ukf_fused_rate),
        # ---- certs + headline: keep LAST (tail-capture survival) ----
        **{f"cert_{k}": v for k, v in cert.items()},
        "pf_path": "pallas_fused_scan" if use_fused else "xla_scan",
        "pf_fused_ll_matches_kf": bool(pff_ok),
        "pf_fused_steps_per_s": round(pff_rate, 1),
        "pf_always_resample_best_steps_per_s": round(head_full, 1),
        "pf_always_resample_best_vs_baseline": round(
            head_full / BASELINE_PF_PARTICLE_STEPS_PER_S, 2),
        "headline_vs_baseline": round(
            head_rate / BASELINE_PF_PARTICLE_STEPS_PER_S, 2),
    }
    out = {
        "metric": "bootstrap_pf_particle_steps_per_s_N1e5",
        "value": round(head_rate, 1),
        "unit": "particle-steps/s",
        "vs_baseline": round(head_rate / BASELINE_PF_PARTICLE_STEPS_PER_S, 2),
        "extra": extra,
    }
    print(json.dumps(out))
    # Compact (<1.5 kB) summary as the FINAL stdout line: the full dump
    # above exceeds the driver's tail-capture window (BENCH_r02-r04 all
    # landed with "parsed": null and truncated heads), so the line the
    # driver actually parses must be small and self-contained
    # (VERDICT r4 #2).
    marquee = (
        "pf_fused_steps_per_s", "pf_always_resample_best_vs_baseline",
        "pf_fused_nonlinear_vs_baseline", "pf_fused_N1e6_steps_per_s",
        "kf_bank1024_passes_per_s", "ukf_fused_vs_julia_baseline",
        "ukf_routed_verb_steps_per_s_T50k",
        "ukf_bank8192_affine_routed_vs_julia_baseline",
        "parallel_kf_speedup_T1e5", "parallel_ukf_vs_julia_baseline",
        "ffbs_weight_evals_per_s_MN1000_T500", "assoc_scan_ns_per_step",
    )
    summary = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "vs_baseline": out["vs_baseline"],
        "headline_vs_baseline": extra["headline_vs_baseline"],
        **{k: v for k, v in extra.items() if k.startswith("cert_")},
        **{k: extra[k] for k in marquee if k in extra},
    }
    line = json.dumps(summary)
    assert len(line) < 1500, f"summary line {len(line)}B exceeds 1.5kB"
    print(line)


# ---------------------------------------------------------------------------
# --render-docs: one source of truth for published numbers (VERDICT r4 #6).
# Reads the newest BENCH_r*.json driver artifact and rewrites the generated
# blocks in README.md / docs/benchmark.md between BENCH:BEGIN/END markers,
# so a doc row citing a BENCH file always equals that file's value.
# ---------------------------------------------------------------------------

# (description, rate field, scale, unit, vs-baseline field or None)
_DOC_ROWS = [
    ("Bootstrap PF, N=1e5, 2-state model, full loop w/ Neff-triggered "
     "systematic resampling (threshold 0.1 = reference default), whole "
     "recursion in ONE Mosaic kernel (auto-routed from the plain "
     "`loglik(pf, …)` verb)",
     "pf_fused_steps_per_s", 1e9, "G particle-steps/s",
     "headline_vs_baseline"),
    ("Same, resampling forced every step",
     "pf_always_resample_best_steps_per_s", 1e9, "G particle-steps/s",
     "pf_always_resample_best_vs_baseline"),
    ("Same, step cost with resampling disabled (the kernel's per-step "
     "floor)",
     "pf_fused_step_only_steps_per_s", 1e9, "G particle-steps/s", None),
    ("Bootstrap PF, N=1e5, genuinely NONLINEAR dot-free callbacks "
     "(`sin`/`tanh` model): fused kernel's double-vmapped elementwise "
     "plane path",
     "pf_fused_nonlinear_steps_per_s", 1e9, "G particle-steps/s",
     "pf_fused_nonlinear_vs_baseline"),
    ("Bootstrap PF, **N=10⁶** (million-particle cloud resident in VMEM, "
     "single kernel; larger clouds go through "
     "`parallel.sharded_pf_loglik_fused`), ll certified against the exact "
     "KF",
     "pf_fused_N1e6_steps_per_s", 1e9, "G particle-steps/s", None),
    ("UKF-class single stream, 4-state CV model, T=50k, through the PLAIN "
     "`loglik(ukf, …)` verb: affine-detected callbacks auto-reduce to the "
     "exact plain KF and run the O(log T) temporal-parallel scan "
     "(`routing._affine_equiv_kf`)",
     "ukf_routed_verb_steps_per_s_T50k", 1e6, "M steps/s",
     "ukf_routed_verb_vs_julia_baseline"),
    ("UKF-class single stream, 4-state CV model, T=50k: O(log T) iterated "
     "sigma-point smoother (`parallel_ukf_smooth`, full filter+smoother)",
     "parallel_ukf_equiv_steps_per_s_T50k", 1e6, "M steps/s",
     "parallel_ukf_vs_julia_baseline"),
    ("UKF-class single stream, genuinely NONLINEAR (quadtank-style "
     "2-state) model, 4 full unscented-SLR iterations (plane-form SLR)",
     "parallel_ukf_nonlinear_steps_per_s_it4", 1e6, "M steps/s",
     "parallel_ukf_nonlinear_vs_julia_baseline"),
    ("UKF bank, affine-detected callbacks routed exactly through the "
     "shared-Riccati KF bank (`ukf_bank_loglik`, B=8192)",
     "ukf_bank8192_affine_routed_steps_per_s", 1e6, "M ukf-steps/s",
     "ukf_bank8192_affine_routed_vs_julia_baseline"),
    ("UKF, 4-state CV model, generic-callback bank of 1024 instances",
     "ukf_bank1024_steps_per_s", 1e6, "M ukf-steps/s", None),
    ("UKF, single stream, sequential whole-scan kernel (`loglik_fused`; "
     "constant-Jacobian affine callbacks run the steady-state "
     "Riccati-freeze kernel — data-independent covariance recursion "
     "frozen at its f32 fixed point, one folded matvec per step; "
     "dependency-latency cost model in docs/performance.md §5b)",
     "ukf_fused_kernel_steps_per_s_T50k", 1e3, "k steps/s",
     "ukf_fused_vs_julia_baseline"),
    ("KF bank, 8192 trajectory passes × 200 steps (shared-Riccati + "
     "associative mean recursion, lane-major planes)",
     "kf_bank8192_passes_per_s", 1e6, "M passes/s", None),
    ("KF bank, 1024 passes × 200 steps",
     "kf_bank1024_passes_per_s", 1e6, "M passes/s", None),
    ("FFBS particle smoother, M=N=1000 (fused pallas backward pass: "
     "weights, Gumbel-max draws, selection all in VMEM)",
     "ffbs_weight_evals_per_s_MN1000_T500", 1e9, "G weight-evals/s", None),
    ("Same, M=1000, N=65536",
     "ffbs_weight_evals_per_s_M1000_N65536", 1e9, "G weight-evals/s",
     None),
    ("Kalman filtering, T=1e5: plane-pipeline associative scan vs the "
     "sequential scan on the same chip",
     "parallel_kf_speedup_T1e5", 1.0, "× the sequential scan", None),
]

_BEGIN, _END = "<!-- BENCH:BEGIN", "<!-- BENCH:END -->"


def _latest_bench():
    import glob
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    files = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")))
    if not files:
        raise SystemExit("no BENCH_r*.json artifact found")
    path = files[-1]
    with open(path) as f:
        art = json.load(f)
    fields = {}
    if isinstance(art.get("parsed"), dict):
        # full parse available: flatten value/vs_baseline + extra
        p = art["parsed"]
        fields.update({k: v for k, v in p.items() if not isinstance(v, dict)})
        fields.update(p.get("extra", {}))
    # the tail may hold fields the parse lost (or be all we have)
    for k, v in re.findall(
            r'"(\w+)":\s*(-?[\d.]+(?:e-?\d+)?|true|false)',
            art.get("tail", "")):
        fields.setdefault(
            k, True if v == "true" else False if v == "false" else float(v))
    return os.path.basename(path), fields


def _render_table(src: str, fields: dict) -> str:
    lines = [
        f"{_BEGIN} — generated by `python bench.py --render-docs` from "
        f"{src}; do not edit by hand -->",
        "| Workload | This framework | Reference (single-core Julia) "
        "| Ratio | Source |",
        "|---|---|---|---|---|",
    ]
    base = "7.37 M particle-steps/s"
    base_ukf = "2.83 M steps/s"
    for desc, key, scale, unit, vs_key in _DOC_ROWS:
        if key not in fields:
            continue  # not in this artifact's capture window
        val = fields[key] / scale
        vstr = f"{val:.2f} {unit}" if scale > 1.0 else f"{val:.1f}{unit}"
        if vs_key and vs_key in fields:
            r = fields[vs_key]
            ratio = f"**{r:.2f}×**" if r < 10 else f"**{r:.1f}×**"
            ref = base if "pf" in key else base_ukf
        else:
            ratio, ref = "—", "—"
        lines.append(f"| {desc} | {vstr} | {ref} | {ratio} "
                     f"| {src} `{key}` |")
    lines.append(_END)
    return "\n".join(lines)


def _splice(path: str, block: str) -> bool:
    with open(path) as f:
        text = f.read()
    i = text.find(_BEGIN)
    j = text.find(_END)
    if i < 0 or j < 0:
        return False
    new = text[:i] + block + text[j + len(_END):]
    with open(path, "w") as f:
        f.write(new)
    return True


def render_docs():
    import os

    src, fields = _latest_bench()
    block = _render_table(src, fields)
    here = os.path.dirname(os.path.abspath(__file__))
    done = []
    for rel in ("README.md", os.path.join("docs", "benchmark.md")):
        if _splice(os.path.join(here, rel), block):
            done.append(rel)
    if done:
        print(f"rendered {src} table into: {', '.join(done)}")
    else:
        print(f"ERROR: no BENCH:BEGIN/END markers found for {src}")


if __name__ == "__main__":
    import sys

    if "--render-docs" in sys.argv:
        render_docs()
    else:
        main()
