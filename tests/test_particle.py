"""Particle filter tests — statistical roundtrips and KF cross-checks.

Mirrors the reference's PF test patterns (test/runtests.jl:245-486:
simulate-then-estimate, loglik-vs-noise-scale curves :412-450, resampler
proportions :108-143).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lowlevelparticlefilters_jl_tpu as llpf
from lowlevelparticlefilters_jl_tpu.ops.resample import (
    resample_systematic,
    resample_stratified,
    resample_residual,
    resample_multinomial,
)


A = np.array([[1.0, 0.1], [0.0, 1.0]])
B = np.array([[0.0], [1.0]])
C = np.array([[1.0, 0.0]])
R1 = 0.01 * np.eye(2)
R2 = 0.1 * np.eye(1)


def dyn(x, u, p, t):
    return jnp.asarray(A) @ x + jnp.asarray(B) @ u


def meas(x, u, p, t):
    return jnp.asarray(C) @ x


def make_pf(N=500, rt=0.1):
    return llpf.ParticleFilter(
        N=N,
        dynamics=dyn,
        measurement=meas,
        dynamics_density=jnp.asarray(R1),
        measurement_density=jnp.asarray(R2),
        initial_density=llpf.MvNormal(jnp.zeros(2), 2 * jnp.eye(2)),
        resample_threshold=rt,
    )


@pytest.fixture(scope="module")
def sim_data():
    kf = llpf.KalmanFilter(A, B, C, 0, R1, R2,
                           d0=llpf.MvNormal(jnp.zeros(2), 2 * jnp.eye(2)))
    key = jax.random.PRNGKey(1)
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=(150, 1)))
    x, u, y = llpf.simulate(kf, u, key)
    return kf, x, u, y


def test_resampler_proportions():
    """Resampled index frequencies ≈ weights (runtests.jl:108-143)."""
    we = jnp.asarray([0.1, 0.4, 0.2, 0.3])
    for fn in (resample_systematic, resample_stratified, resample_residual,
               resample_multinomial):
        counts = np.zeros(4)
        for s in range(200):
            j = fn(we, jax.random.PRNGKey(s), 400)
            counts += np.bincount(np.asarray(j), minlength=4)
        props = counts / counts.sum()
        np.testing.assert_allclose(props, np.asarray(we), atol=0.02)


def test_systematic_is_low_variance():
    we = jnp.full((100,), 0.01)
    j = resample_systematic(we, jax.random.PRNGKey(0))
    # uniform weights → systematic returns a permutation-free identity-ish map
    assert np.asarray(jnp.bincount(j, length=100)).max() == 1


def test_pf_tracks_state(sim_data):
    kf, x, u, y = sim_data
    pf = make_pf(N=1000)
    sol = pf.forward_trajectory(u, y, key=jax.random.PRNGKey(2))
    xh = llpf.mean_trajectory(sol.x, sol.we)
    rmse = float(jnp.sqrt(jnp.mean((xh - x) ** 2)))
    # measurement-only std is sqrt(0.1) ≈ 0.32 on x1; filter should beat it
    assert rmse < 0.45, rmse
    assert np.isfinite(float(sol.ll))


def test_pf_loglik_close_to_kf(sim_data):
    """On a linear-Gaussian model, PF loglik ≈ exact KF loglik."""
    kf, x, u, y = sim_data
    ll_kf = float(llpf.loglik(kf, u, y))
    pf = make_pf(N=2000)
    lls = [float(pf.loglik(u, y, key=jax.random.PRNGKey(s))) for s in range(5)]
    assert abs(np.mean(lls) - ll_kf) < 0.05 * abs(ll_kf), (np.mean(lls), ll_kf)


def test_loglik_peaks_at_true_noise(sim_data):
    """loglik-vs-noise-scale curve peaks near the true scale
    (runtests.jl:412-450)."""
    kf, x, u, y = sim_data
    scales = [0.1, 1.0, 10.0]
    lls = []
    for s in scales:
        pf = llpf.ParticleFilter(
            N=1000, dynamics=dyn, measurement=meas,
            dynamics_density=s * jnp.asarray(R1),
            measurement_density=s * jnp.asarray(R2),
            initial_density=llpf.MvNormal(jnp.zeros(2), 2 * jnp.eye(2)),
        )
        lls.append(float(pf.loglik(u, y, key=jax.random.PRNGKey(3))))
    assert lls[1] > lls[0] and lls[1] > lls[2], lls


def test_aux_pf_runs_and_matches_roughly(sim_data):
    kf, x, u, y = sim_data
    apf = llpf.AuxiliaryParticleFilter(pf=make_pf(N=1000, rt=1.0))
    sol = apf.forward_trajectory(u, y, key=jax.random.PRNGKey(4))
    xh = llpf.mean_trajectory(sol.x, sol.we)
    rmse = float(jnp.sqrt(jnp.mean((xh - x) ** 2)))
    assert rmse < 0.5, rmse


def test_advanced_pf(sim_data):
    """AdvancedParticleFilter with explicit noise keys
    (runtests.jl:589-597 analogue)."""
    kf, x, u, y = sim_data
    L1 = jnp.linalg.cholesky(jnp.asarray(R1))

    def adyn(x, u, p, t, key):
        xn = dyn(x, u, p, t)
        if key is not None:
            xn = xn + L1 @ jax.random.normal(key, (2,), dtype=xn.dtype)
        return xn

    def alik(x, u, y, p, t):
        e = y - meas(x, u, p, t)
        return llpf.mvnormal_logpdf_cov(e, jnp.zeros_like(e), jnp.asarray(R2))

    apf = llpf.AdvancedParticleFilter(
        N=1000, dynamics=adyn, measurement=lambda x, u, p, t, key: meas(x, u, p, t),
        measurement_likelihood=alik,
        initial_density=llpf.MvNormal(jnp.zeros(2), 2 * jnp.eye(2)),
    )
    sol = apf.forward_trajectory(u, y, key=jax.random.PRNGKey(5))
    xh = llpf.mean_trajectory(sol.x, sol.we)
    rmse = float(jnp.sqrt(jnp.mean((xh - x) ** 2)))
    assert rmse < 0.45, rmse


def test_ffbs_smoother(sim_data):
    """FFBS smoothed trajectories beat the filtered estimate
    (smoothing.jl:104-143 roundtrip)."""
    kf, x, u, y = sim_data
    pf = make_pf(N=500)
    xb, ll = pf.smooth(u, y, M=50, key=jax.random.PRNGKey(6))
    assert xb.shape == (len(y), 50, 2)
    xs = llpf.smoothed_mean(xb)
    rmse_sm = float(jnp.sqrt(jnp.mean((xs - x) ** 2)))
    sol = pf.forward_trajectory(u, y, key=jax.random.PRNGKey(7))
    xh = llpf.mean_trajectory(sol.x, sol.we)
    rmse_f = float(jnp.sqrt(jnp.mean((xh - x) ** 2)))
    assert rmse_sm < rmse_f * 1.1, (rmse_sm, rmse_f)
    cov = llpf.smoothed_cov(xb)
    assert cov.shape == (len(y), 2, 2)


def test_pf_jit_and_no_recompile(sim_data):
    """jit-traceability — the JET-test analogue (test/test_jet.jl)."""
    kf, x, u, y = sim_data
    pf = make_pf(N=200)

    @jax.jit
    def run(u, y, key):
        return pf.forward_trajectory(u, y, key=key).ll

    l1 = run(u, y, jax.random.PRNGKey(0))
    l2 = run(u, y, jax.random.PRNGKey(1))
    assert run._cache_size() == 1
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))


def test_missing_measurements(sim_data):
    """NaN measurements skip the weight update (PFtypes.jl:109)."""
    kf, x, u, y = sim_data
    y_nan = np.asarray(y).copy()
    y_nan[10] = np.nan
    pf = make_pf(N=500)
    sol = pf.forward_trajectory(u, jnp.asarray(y_nan), key=jax.random.PRNGKey(8))
    assert np.isfinite(float(sol.ll))
    xh = llpf.mean_trajectory(sol.x, sol.we)
    assert bool(jnp.all(jnp.isfinite(xh)))


class TestLoglikNoiseScaleCurves:
    """PF/APF/KF loglik-vs-noise-scale curves peak at the true parameter
    (runtests.jl:412-450): the full four-way statistical comparison —
    PF, APF, KF, and KF-with-known-state-sequence."""

    def test_curves_peak_at_truth(self):
        d0 = llpf.MvNormal(jnp.zeros(2), 2.0 * jnp.eye(2))
        s_true = 0.1
        kf_true = llpf.KalmanFilter(A, B, C, 0, s_true**2 * np.eye(2),
                                    np.eye(1), d0=d0)
        du = llpf.MvNormal(jnp.zeros(1), jnp.eye(1))
        x, u, y = llpf.simulate(kf_true, 600, jax.random.PRNGKey(42), du=du)

        svec = np.logspace(-2, 0, 11)  # index 5 == the true 0.1
        N = 1000
        ll_pf, ll_apf, ll_kf, ll_kfx = [], [], [], []
        for i, s in enumerate(svec):
            R1s = float(s) ** 2 * np.eye(2)
            pf = llpf.ParticleFilter(
                N=N, dynamics=dyn, measurement=meas,
                dynamics_density=R1s, measurement_density=np.eye(1),
                initial_density=d0,
            )
            ll_pf.append(float(pf.loglik(u, y, key=jax.random.PRNGKey(i))))
            apf = llpf.AuxiliaryParticleFilter(pf=pf)
            ll_apf.append(float(apf.loglik(u, y, key=jax.random.PRNGKey(100 + i))))
            kfs = llpf.KalmanFilter(A, B, C, 0, R1s, np.eye(1), d0=d0)
            ll_kf.append(float(llpf.loglik(kfs, u, y)))
            ll_kfx.append(float(llpf.loglik_x(kfs, u, y, x)))

        for name, lls in [("pf", ll_pf), ("apf", ll_apf), ("kf", ll_kf),
                          ("kfx", ll_kfx)]:
            mi = int(np.argmax(lls))
            assert 4 <= mi <= 7, (name, mi, lls)
        # PF/APF loglik within 20 nats of the exact KF over the whole curve
        # around the peak (runtests.jl:449-450); the far-misspecified end
        # of the curve is Monte-Carlo noisy for N=1000.
        sl = slice(3, 11)
        assert np.max(np.abs(np.asarray(ll_kf[sl]) - np.asarray(ll_pf[sl]))) < 20
        assert np.max(np.abs(np.asarray(ll_kf[sl]) - np.asarray(ll_apf[sl]))) < 20
        # knowing the true state sequence can only help
        assert max(ll_kfx) > max(ll_kf)
