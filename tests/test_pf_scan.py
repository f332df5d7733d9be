"""Whole-scan fused particle filter (ops/pallas/pf_scan.py).

Interpret-mode (CPU) runs use zero noise and r=0.5, which makes the
kernel DETERMINISTIC — so against a zero-process-noise XLA oracle with
shared initial particles the no-resample path must agree to fp
tolerance, and resampling paths to resample-draw tolerance.  Hardware
statistical equivalence is certified in bench.py (kernels_verified).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lowlevelparticlefilters_jl_tpu as llpf
from lowlevelparticlefilters_jl_tpu.filters.particle import (
    PFState, _uniform_weights)
from lowlevelparticlefilters_jl_tpu.ops.pallas.pf_scan import (
    pf_loglik_fused, pf_scan_supported)

A = jnp.array([[0.97, -0.1], [0.1, 0.97]], jnp.float32)
B = jnp.array([[0.1], [0.0]], jnp.float32)
C = jnp.eye(2, dtype=jnp.float32)
R1z = 1e-12 * jnp.eye(2, dtype=jnp.float32)
R2 = 0.1 * jnp.eye(2, dtype=jnp.float32)
N = 512


def _pf(th, R1=R1z):
    return llpf.ParticleFilter(
        N=N, dynamics=lambda x, u, p, t: A @ x + B @ u,
        measurement=lambda x, u, p, t: C @ x, dynamics_density=R1,
        measurement_density=R2,
        initial_density=llpf.MvNormal(jnp.zeros(2), jnp.eye(2)),
        resample_threshold=th)


def _shared_state(key=7):
    x0 = llpf.MvNormal(jnp.zeros(2), jnp.eye(2)).sample(
        jax.random.PRNGKey(key), (N,))
    # match the suite's x64 default so the XLA-path scan carry is stable
    w0, we0 = _uniform_weights(N, x0.dtype)
    s0 = PFState(x=x0, w=w0, we=we0, t=jnp.asarray(0, jnp.int32),
                 key=jax.random.PRNGKey(0))
    return x0, s0


def _data(T, seed=1):
    us = 0.3 * jnp.ones((T, 1), jnp.float32)
    ys = jax.random.normal(jax.random.PRNGKey(seed), (T, 2), jnp.float32)
    return us, ys


@pytest.mark.parametrize("T", [1, 12, 140])
def test_no_resample_matches_xla_exactly(T):
    """Zero noise + threshold 0 (never fires): identical math to the XLA
    scan up to fp associativity (incl. T > 128 crossing a lane block)."""
    pf = _pf(0.0)
    x0, s0 = _shared_state()
    us, ys = _data(T)
    ll_xla = float(pf.loglik(us, ys, state0=s0))
    ll_f, nres = pf_loglik_fused(pf, us, ys, 0, x0=x0, force_kernel=True)
    np.testing.assert_allclose(float(ll_f), ll_xla, rtol=1e-5)
    assert float(nres) == 0.0


def test_always_resample_deterministic_weights():
    """State-independent measurement -> exactly equal weights -> the
    systematic selection is the identity for ANY offset r, so the fused
    path (r=0.5) and the XLA path (r from the key) must agree exactly —
    this pins the in-scan routing incl. weight resets."""
    pf = llpf.ParticleFilter(
        N=N, dynamics=lambda x, u, p, t: A @ x + B @ u,
        measurement=lambda x, u, p, t: 0.0 * x, dynamics_density=R1z,
        measurement_density=R2,
        initial_density=llpf.MvNormal(jnp.zeros(2), jnp.eye(2)),
        resample_threshold=1.0)
    x0, s0 = _shared_state()
    us, ys = _data(12)
    ll_xla = float(pf.loglik(us, ys, state0=s0))
    ll_f, nres = pf_loglik_fused(pf, us, ys, 0, x0=x0, force_kernel=True)
    assert float(nres) == 12.0
    np.testing.assert_allclose(float(ll_f), ll_xla, rtol=1e-5)


def test_neff_trigger_fires():
    """Zero-noise + resampling makes the trajectory r-draw sensitive
    (impoverishment), so only the trigger behavior is asserted here; the
    statistical ll equivalence is certified on hardware in bench.py."""
    pf = _pf(0.5)
    x0, s0 = _shared_state()
    us, ys = _data(30)
    ll_f, nres = pf_loglik_fused(pf, us, ys, 0, x0=x0, force_kernel=True)
    assert 1 <= float(nres) <= 29
    assert np.isfinite(float(ll_f))


def test_missing_measurement_skips_update():
    """NaN measurements contribute zero log-likelihood (PFtypes.jl:109)."""
    pf = _pf(0.0)
    x0, _ = _shared_state()
    us, ys = _data(6)
    ys = ys.at[3].set(jnp.nan)
    ll_f, _ = pf_loglik_fused(pf, us, ys, 0, x0=x0, force_kernel=True)
    ys2 = jnp.concatenate([ys[:3], ys[4:]])
    us2 = jnp.concatenate([us[:3], us[4:]])
    # removing the NaN step changes propagation, so just check finiteness
    # and that the NaN did not poison the total
    assert np.isfinite(float(ll_f))


def test_affine_detection():
    """The static jaxpr affinity check gates the scalar-x-plane fast
    path: affine callbacks detected, nonlinear ones fail closed."""
    from lowlevelparticlefilters_jl_tpu.ops.pallas.pf_scan import _flatten

    aff = lambda x, u, p, t: A @ x + B @ u
    _, _, ok, _ = _flatten(aff, 2, 1, None)
    assert ok
    nonlin = lambda x, u, p, t: jnp.sin(x) + B @ u
    _, _, ok, _ = _flatten(nonlin, 2, 1, None)
    assert not ok
    quad = lambda x, u, p, t: x * x
    _, _, ok, _ = _flatten(quad, 2, 1, None)
    assert not ok
    # affine-through-structure: broadcast/slice/concat preserve affinity
    struct = lambda x, u, p, t: jnp.concatenate([x[:1] - x[1:], 2.0 * x[:1]])
    _, _, ok, _ = _flatten(struct, 2, 1, None)
    assert ok


def test_elementwise_detection():
    """The dot-free (elementwise) gate for the double-vmapped plane
    path: nonlinear elementwise callbacks pass, dots fail closed."""
    from lowlevelparticlefilters_jl_tpu.ops.pallas.pf_scan import _flatten

    ew_fn = lambda x, u, p, t: jnp.sin(x) + jnp.sqrt(jnp.abs(x)) * u[0]
    _, _, aff, ew = _flatten(ew_fn, 2, 1, None)
    assert ew and not aff
    # dots on tiny operands UNROLL to mul/sum and join the plane path
    dot_fn = lambda x, u, p, t: jnp.sin(A @ x) + B @ u
    _, _, aff, ew = _flatten(dot_fn, 2, 1, None)
    assert ew and not aff
    # ... but large dots stay on the row path (fail closed)
    W = jnp.ones((2, 40), jnp.float32)
    big_fn = lambda x, u, p, t: W @ jnp.sin(W.T @ x)
    _, _, aff, ew = _flatten(big_fn, 2, 1, None)
    assert not ew and not aff


def test_elementwise_and_row_paths_agree():
    """A nonlinear dot-free model through the double-vmapped plane path
    (default) and the per-sublane-row path (PF_SCAN_DEBUG=norowv must
    also disable the plane path's density dispatch) must produce the
    same deterministic interpret-mode log-likelihood."""
    import os

    pf = llpf.ParticleFilter(
        N=N, dynamics=lambda x, u, p, t: 0.9 * jnp.sin(x) + 0.1 * u[0],
        measurement=lambda x, u, p, t: jnp.tanh(x), dynamics_density=R1z,
        measurement_density=R2,
        initial_density=llpf.MvNormal(jnp.zeros(2), jnp.eye(2)),
        resample_threshold=0.0)
    x0, _ = _shared_state()
    us, ys = _data(17)
    ll_p, _ = pf_loglik_fused(pf, us, ys, 0, x0=x0, force_kernel=True)
    os.environ["PF_SCAN_DEBUG"] = "norowv"
    try:
        ll_r, _ = pf_loglik_fused(pf, us, ys, 0, x0=x0, force_kernel=True)
    finally:
        del os.environ["PF_SCAN_DEBUG"]
    np.testing.assert_allclose(float(ll_p), float(ll_r), rtol=1e-5)
    # and the XLA oracle agrees (zero noise, no resample, shared x0)
    ll_xla = float(pf.loglik(us, ys, state0=_shared_state()[1],
                             method="sequential"))
    np.testing.assert_allclose(float(ll_p), ll_xla, rtol=1e-5)


def test_unrolled_dot_paths_agree():
    """A model mixing small dots with nonlinearities (A @ x + sin —
    neither affine nor dot-free) runs on the plane path via small-dot
    unrolling; it must match the row path and the XLA oracle exactly
    (zero noise, no resample, shared x0)."""
    import os

    Am = jnp.array([[0.9, -0.1], [0.1, 0.9]], jnp.float32)
    Cm = jnp.array([[1.0, 0.5], [0.0, 1.0]], jnp.float32)
    pf = llpf.ParticleFilter(
        N=N, dynamics=lambda x, u, p, t: Am @ x + 0.1 * jnp.sin(x),
        measurement=lambda x, u, p, t: jnp.tanh(Cm @ x),
        dynamics_density=R1z, measurement_density=R2,
        initial_density=llpf.MvNormal(jnp.zeros(2), jnp.eye(2)),
        resample_threshold=0.0)
    from lowlevelparticlefilters_jl_tpu.ops.pallas.pf_scan import _flatten
    _, _, aff, ew = _flatten(pf.dynamics, 2, 1, None)
    assert ew and not aff
    x0, _ = _shared_state()
    us, ys = _data(17)
    ll_p, _ = pf_loglik_fused(pf, us, ys, 0, x0=x0, force_kernel=True)
    os.environ["PF_SCAN_DEBUG"] = "norowv"
    try:
        ll_r, _ = pf_loglik_fused(pf, us, ys, 0, x0=x0, force_kernel=True)
    finally:
        del os.environ["PF_SCAN_DEBUG"]
    np.testing.assert_allclose(float(ll_p), float(ll_r), rtol=1e-5)
    ll_xla = float(pf.loglik(us, ys, state0=_shared_state()[1],
                             method="sequential"))
    np.testing.assert_allclose(float(ll_p), ll_xla, rtol=1e-5)


def test_mixed_affine_elementwise_paths_agree():
    """Per-callback path selection: affine dynamics (A @ x has dots, so
    no elementwise path) + dot-free nonlinear measurement must run the
    affine path for f AND the plane path for g — and agree with the
    all-rows fallback and the XLA oracle."""
    import os

    pf = llpf.ParticleFilter(
        N=N, dynamics=lambda x, u, p, t: A @ x + B @ u,
        measurement=lambda x, u, p, t: jnp.tanh(x), dynamics_density=R1z,
        measurement_density=R2,
        initial_density=llpf.MvNormal(jnp.zeros(2), jnp.eye(2)),
        resample_threshold=0.0)
    x0, s0 = _shared_state()
    us, ys = _data(17)
    ll_fast, _ = pf_loglik_fused(pf, us, ys, 0, x0=x0, force_kernel=True)
    os.environ["PF_SCAN_DEBUG"] = "noaffine norowv"
    try:
        ll_rows, _ = pf_loglik_fused(pf, us, ys, 0, x0=x0,
                                     force_kernel=True)
    finally:
        del os.environ["PF_SCAN_DEBUG"]
    np.testing.assert_allclose(float(ll_fast), float(ll_rows), rtol=1e-5)
    ll_xla = float(pf.loglik(us, ys, state0=s0, method="sequential"))
    np.testing.assert_allclose(float(ll_fast), ll_xla, rtol=1e-5)


def test_affine_and_row_paths_agree():
    """Same model through the affine fast path and the per-sublane-row
    callback path (PF_SCAN_DEBUG=noaffine is env-only, so drive the flag
    via monkeypatched os.environ) must produce the same deterministic
    interpret-mode log-likelihood."""
    import os

    pf = _pf(0.0)
    x0, _ = _shared_state()
    us, ys = _data(17)
    ll_a, _ = pf_loglik_fused(pf, us, ys, 0, x0=x0, force_kernel=True)
    os.environ["PF_SCAN_DEBUG"] = "noaffine"
    try:
        ll_r, _ = pf_loglik_fused(pf, us, ys, 0, x0=x0, force_kernel=True)
    finally:
        del os.environ["PF_SCAN_DEBUG"]
    np.testing.assert_allclose(float(ll_a), float(ll_r), rtol=1e-5)


def test_mean_fused_matches_xla():
    """pf_mean_fused: the per-step Σ wᵉ·x reduction in the kernel must
    equal the weighted means of the XLA forward trajectory (zero noise,
    no resample, shared x0 — deterministic)."""
    from lowlevelparticlefilters_jl_tpu.ops.pallas.pf_scan import (
        pf_mean_fused)

    pf = _pf(0.0)
    x0, s0 = _shared_state()
    T = 140  # crosses a lane-block boundary
    us, ys = _data(T)
    sol = pf.forward_trajectory(us, ys, state0=s0)
    want = jnp.einsum("tn,tnd->td", sol.we, sol.x)
    means, ll_f, nres = pf_mean_fused(pf, us, ys, 0, x0=x0,
                                      force_kernel=True)
    assert means.shape == (T, 2)
    np.testing.assert_allclose(np.asarray(means), np.asarray(want),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(float(ll_f), float(sol.ll), rtol=1e-5)
    assert float(nres) == 0.0


class TestNonGaussianMeasurementDensity:
    """The kernel traces scalar-family measurement densities
    (ops/distributions.py) in-kernel — the reference's arbitrary-density
    support (PFtypes.jl measurement_likelihood) on the fused path."""

    def _pf_d(self, d, th=0.0):
        return llpf.ParticleFilter(
            N=N, dynamics=lambda x, u, p, t: A @ x + B @ u,
            measurement=lambda x, u, p, t: C @ x, dynamics_density=R1z,
            measurement_density=d,
            initial_density=llpf.MvNormal(jnp.zeros(2), jnp.eye(2)),
            resample_threshold=th)

    @pytest.mark.parametrize("make_d", [
        lambda: llpf.TupleProduct([llpf.StudentT(3.0, 0.0, 0.3),
                                   llpf.StudentT(5.0, 0.0, 0.3)]),
        lambda: llpf.TupleProduct([llpf.Laplace(0.0, 0.3),
                                   llpf.MixtureNormal(0.9, 0.0, 0.3,
                                                      0.0, 3.0)]),
    ])
    def test_matches_xla_no_resample(self, make_d):
        d = make_d()
        pf = self._pf_d(d)
        assert pf_scan_supported(pf)
        x0, s0 = _shared_state()
        T = 140
        us, ys = _data(T)
        ll_xla = float(pf.loglik(us, ys, state0=s0))
        ll_ker, nres = pf_loglik_fused(pf, us, ys, 0, x0=x0,
                                       force_kernel=True)
        assert float(nres) == 0.0
        np.testing.assert_allclose(float(ll_ker), ll_xla, rtol=1e-5)

    def test_matches_xla_with_resampling(self):
        d = llpf.TupleProduct([llpf.StudentT(4.0, 0.0, 0.2),
                               llpf.StudentT(4.0, 0.0, 0.2)])
        pf = self._pf_d(d, th=1.0)
        x0, s0 = _shared_state()
        us, ys = _data(60)
        ll_xla = float(pf.loglik(us, ys, state0=s0))
        ll_ker, nres = pf_loglik_fused(pf, us, ys, 0, x0=x0,
                                       force_kernel=True)
        assert float(nres) == 60.0
        # resample draw streams differ (r=0.5 vs PRNG) — statistical
        # agreement only
        np.testing.assert_allclose(float(ll_ker), ll_xla, rtol=2e-2)

    def test_array_params_not_admitted(self):
        """Array-valued density parameters cannot fold at trace time
        (StudentT's gammaln would land in the kernel) — admission must
        reject them."""
        d = llpf.TupleProduct([llpf.StudentT(jnp.asarray(3.0), 0.0, 0.3),
                               llpf.StudentT(3.0, 0.0, 0.3)])
        pf = self._pf_d(d)
        assert not pf_scan_supported(pf)


def test_stats_fused_matches_xla():
    """pf_stats_fused: the in-kernel raw second moments must reproduce
    the weighted covariance of the XLA forward trajectory (zero noise,
    no resample, shared x0 — deterministic)."""
    from lowlevelparticlefilters_jl_tpu.ops.pallas.pf_scan import (
        pf_stats_fused)

    pf = _pf(0.0)
    x0, s0 = _shared_state()
    T = 140
    us, ys = _data(T)
    sol = pf.forward_trajectory(us, ys, state0=s0)
    want_m = jnp.einsum("tn,tnd->td", sol.we, sol.x)
    dx = sol.x - want_m[:, None, :]
    want_c = jnp.einsum("tn,tnd,tne->tde", sol.we, dx, dx)
    means, covs, ll_f, nres = pf_stats_fused(pf, us, ys, 0, x0=x0,
                                             force_kernel=True)
    assert means.shape == (T, 2) and covs.shape == (T, 2, 2)
    np.testing.assert_allclose(np.asarray(means), np.asarray(want_m),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(covs), np.asarray(want_c),
                               rtol=2e-3, atol=1e-6)
    np.testing.assert_allclose(float(ll_f), float(sol.ll), rtol=1e-5)


def test_stats_fused_xla_fallback():
    """Off-TPU (no force): the fallback path returns weighted mean/cov
    from the XLA forward trajectory."""
    from lowlevelparticlefilters_jl_tpu.ops.pallas.pf_scan import (
        pf_stats_fused)

    pf = _pf(0.5)
    us, ys = _data(24)
    means, covs, ll, _ = pf_stats_fused(pf, us, ys, 0)
    assert means.shape == (24, 2) and covs.shape == (24, 2, 2)
    # covariances are PSD
    ev = np.linalg.eigvalsh(np.asarray(covs))
    assert ev.min() > -1e-6
    assert np.isfinite(float(ll))


def test_pmmh_composition():
    """docs/param_est_bayesian.md fused-PMMH recipe: pf_loglik_fused
    composes inside the metropolis scan (off-TPU it silently runs the
    XLA path with a seed-derived key)."""
    pf = _pf(0.5, R1=0.01 * jnp.eye(2, dtype=jnp.float32))
    us, ys = _data(8)

    def ll(theta, key):
        pfi = pf.replace(measurement_density=llpf.MvNormal(
            jnp.zeros(2), jnp.exp(2 * theta[0]) * jnp.eye(2)))
        seed = jax.random.randint(key, (), 0, 2**31 - 1)
        llv, _ = pf_loglik_fused(pfi, us, ys, seed)
        return llv

    thetas, lls = llpf.metropolis(ll, 4, 0.1 * jnp.ones(1),
                                  key=jax.random.PRNGKey(0),
                                  ll_takes_key=True)
    assert thetas.shape == (4, 1)
    assert np.isfinite(np.asarray(lls)).all()


def test_supported_gate():
    assert pf_scan_supported(_pf(0.1))
    apf = llpf.AuxiliaryParticleFilter(pf=_pf(0.1))
    assert not pf_scan_supported(apf)
    pf_res = llpf.ParticleFilter(
        N=N, dynamics=lambda x, u, p, t: A @ x,
        measurement=lambda x, u, p, t: C @ x, dynamics_density=R1z,
        measurement_density=R2,
        initial_density=llpf.MvNormal(jnp.zeros(2), jnp.eye(2)),
        resampling_strategy="stratified")
    assert not pf_scan_supported(pf_res)


def test_supported_gate_vmem_envelope():
    """N=1e6 clouds are admitted at nx=2 (calibrated VMEM estimate +
    pinned 127 MiB compile limit, commit 10b8630) but must stay rejected
    once the estimate exceeds the v5e budget; the sharded gate admits
    n_devices x the single-chip bound."""
    from lowlevelparticlefilters_jl_tpu.parallel.sharded import (
        pf_sharded_scan_supported)

    pf1m = _pf(0.1).replace(N=1_000_000)
    assert pf_scan_supported(pf1m)
    assert not pf_scan_supported(_pf(0.1).replace(N=4_000_000))
    assert pf_sharded_scan_supported(_pf(0.1).replace(N=8_000_000), 8)
    assert not pf_sharded_scan_supported(_pf(0.1).replace(N=8_000_001), 8)
