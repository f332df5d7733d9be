"""UKF / EKF / IEKF / SqKF tests — cross-filter oracle equivalence.

Mirrors the reference's core invariants: on linear-Gaussian systems every
Kalman variant must agree with the exact KalmanFilter
(test/test_ukf.jl:112-119, test/test_large.jl:78, test/runtests.jl:376-382)
and augmented UKF ≡ additive UKF (test/test_ukf.jl:169-178).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lowlevelparticlefilters_jl_tpu as llpf

A = np.array([[1.0, 0.1], [0.0, 0.97]])
B = np.array([[0.005], [0.1]])
C = np.array([[1.0, 0.0]])
R1 = np.array([[0.005, 0.0], [0.0, 0.01]])
R2 = 0.1 * np.eye(1)
d0 = lambda: llpf.MvNormal(jnp.zeros(2), jnp.asarray(2 * R1))


def lin_dyn(x, u, p, t):
    return jnp.asarray(A) @ x + jnp.asarray(B) @ u


def lin_meas(x, u, p, t):
    return jnp.asarray(C) @ x


@pytest.fixture(scope="module")
def data():
    kf = llpf.KalmanFilter(A, B, C, 0, R1, R2, d0=d0())
    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.normal(size=(120, 1)))
    x, u, y = llpf.simulate(kf, u, jax.random.PRNGKey(7))
    return kf, x, u, y


def filters_all(data):
    kf = data[0]
    ukf = llpf.make_ukf(lin_dyn, lin_meas, R1, R2, d0=d0(), nu=1, ny=1)
    ekf = llpf.make_ekf(lin_dyn, lin_meas, R1, R2, d0=d0(), nu=1, ny=1)
    iekf = llpf.make_iekf(lin_dyn, lin_meas, R1, R2, d0=d0(), nu=1, ny=1)
    sqkf = llpf.SqKalmanFilter(A, B, C, 0, R1, R2, d0=d0())
    sqekf = llpf.make_sqekf(lin_dyn, lin_meas, R1, R2, d0=d0(), nu=1, ny=1)
    return {"kf": kf, "ukf": ukf, "ekf": ekf, "iekf": iekf, "sqkf": sqkf, "sqekf": sqekf}


def test_all_kalman_variants_agree_on_linear_system(data):
    """test_large.jl:78 pattern: identical loglik and trajectories."""
    _, x, u, y = data
    sols = {}
    for name, f in filters_all(data).items():
        sol = llpf.forward_trajectory(f, u, y)
        sols[name] = sol
    ref = sols["kf"]
    for name, sol in sols.items():
        np.testing.assert_allclose(sol.xt, ref.xt, rtol=1e-6, atol=1e-8, err_msg=name)
        np.testing.assert_allclose(sol.Rt, ref.Rt, rtol=1e-5, atol=1e-8, err_msg=name)
        np.testing.assert_allclose(
            float(sol.ll), float(ref.ll), rtol=1e-8, err_msg=name
        )


def test_augmented_ukf_equals_additive(data):
    """test_ukf.jl:169-178: augmented dynamics/measurement with additive
    noise functions reproduce the additive UKF exactly."""
    _, x, u, y = data

    def aug_dyn(x, u, p, t, w):
        return lin_dyn(x, u, p, t) + w

    def aug_meas(x, u, p, t, e):
        return lin_meas(x, u, p, t) + e

    ukf = llpf.make_ukf(lin_dyn, lin_meas, R1, R2, d0=d0(), nu=1, ny=1)
    ukf_aug = llpf.make_ukf(
        aug_dyn, aug_meas, R1, R2, d0=d0(), nu=1, ny=1,
        augmented_dynamics=True, augmented_measurement=True,
    )
    s1 = llpf.forward_trajectory(ukf, u, y)
    s2 = llpf.forward_trajectory(ukf_aug, u, y)
    np.testing.assert_allclose(s2.xt, s1.xt, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(float(s2.ll), float(s1.ll), rtol=1e-6)


def test_ut_weight_schemes(data):
    """All weight schemes agree on a linear system (weights cancel)."""
    _, x, u, y = data
    lls = []
    for wp in (llpf.TrivialParams(), llpf.WikiParams(), llpf.MerweParams(alpha=0.5)):
        ukf = llpf.make_ukf(lin_dyn, lin_meas, R1, R2, d0=d0(), nu=1, ny=1,
                            weight_params=wp)
        lls.append(float(llpf.forward_trajectory(ukf, u, y).ll))
    np.testing.assert_allclose(lls[1:], lls[0], rtol=1e-6)


def test_sigmapoint_moments():
    """Sigma points reproduce mean/cov exactly for every scheme."""
    m = jnp.array([1.0, -2.0, 0.5])
    Sig = jnp.array([[2.0, 0.3, 0.0], [0.3, 1.0, 0.1], [0.0, 0.1, 0.5]])
    for wp in (llpf.TrivialParams(), llpf.WikiParams(alpha=0.9, kappa=2.0),
               llpf.MerweParams(alpha=0.8, beta=2.0, kappa=1.0)):
        xs = llpf.sigmapoints(m, Sig, wp)
        W = llpf.ukf_weights(wp, 3)
        np.testing.assert_allclose(llpf.ut_mean(xs, W), m, atol=1e-12)
        np.testing.assert_allclose(llpf.ut_cov(xs, m, W), Sig, atol=1e-10)


def test_smoothers_agree_on_linear_system(data):
    """test_large.jl:133-147: all smoothers identical on linear systems."""
    kf, x, u, y = data
    ss_kf = llpf.smooth(kf, u, y)
    ukf = llpf.make_ukf(lin_dyn, lin_meas, R1, R2, d0=d0(), nu=1, ny=1)
    ss_ukf = ukf.smooth(u, y)
    ekf = llpf.make_ekf(lin_dyn, lin_meas, R1, R2, d0=d0(), nu=1, ny=1)
    ss_ekf = ekf.smooth(u, y)
    np.testing.assert_allclose(ss_ukf.xT, ss_kf.xT, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(ss_ekf.xT, ss_kf.xT, rtol=1e-6, atol=1e-8)


def test_nonlinear_ukf_vs_ekf(rng):
    """Nonlinear pendulum-like model: UKF and EKF both track; UKF at least
    as good (test_ukf.jl style roundtrip)."""
    Ts = 0.05
    g = 9.81

    def f(x, u, p, t):
        th, w = x[0], x[1]
        return jnp.array([th + Ts * w, w - Ts * g * jnp.sin(th) + Ts * u[0]])

    def h(x, u, p, t):
        return jnp.array([jnp.sin(x[0])])

    R1n = np.diag([1e-5, 1e-3])
    R2n = np.array([[1e-2]])
    d0n = llpf.MvNormal(jnp.array([0.3, 0.0]), 0.1 * jnp.eye(2))
    ukf = llpf.make_ukf(f, h, R1n, R2n, d0=d0n, nu=1, ny=1, Ts=Ts)
    ekf = llpf.make_ekf(f, h, R1n, R2n, d0=d0n, nu=1, ny=1, Ts=Ts)
    u = jnp.asarray(0.2 * rng.normal(size=(300, 1)))
    xs, u, y = llpf.simulate(ukf, u, jax.random.PRNGKey(11))
    for flt in (ukf, ekf):
        sol = llpf.forward_trajectory(flt, u, y)
        rmse = float(jnp.sqrt(jnp.mean((sol.xt[:, 0] - xs[:, 0]) ** 2)))
        assert rmse < 0.12, (type(flt).__name__, rmse)
        assert bool(sol.ok.all())


def test_iekf_matches_ekf_on_mild_nonlinearity(rng):
    def h(x, u, p, t):
        return jnp.array([x[0] + 0.1 * x[0] ** 2])

    R1n = 0.01 * np.eye(2)
    R2n = np.array([[0.01]])
    d0n = llpf.MvNormal(jnp.zeros(2), 0.5 * jnp.eye(2))
    ekf = llpf.make_ekf(lin_dyn, h, R1n, R2n, d0=d0n, nu=1, ny=1)
    iekf = llpf.make_iekf(lin_dyn, h, R1n, R2n, d0=d0n, nu=1, ny=1, maxiters=10)
    u = jnp.asarray(rng.normal(size=(100, 1)))
    xs, u, y = llpf.simulate(ekf, u, jax.random.PRNGKey(12))
    s1 = llpf.forward_trajectory(ekf, u, y)
    s2 = llpf.forward_trajectory(iekf, u, y)
    # IEKF should be close to EKF but not identical (it iterates)
    assert float(jnp.max(jnp.abs(s1.xt - s2.xt))) < 0.05
    assert np.isfinite(float(s2.ll))


def test_sensor_fusion_mixed_measurement_models(data):
    """Any filter corrects with any measurement model
    (test_large.jl:149-167 pattern)."""
    kf, x, u, y = data
    lmm = llpf.LinearMeasurementModel(C=C, D=None, R2=R2, ny=1)
    emm = llpf.EKFMeasurementModel(measurement=lin_meas, R2=jnp.asarray(R2), ny=1)
    umm = llpf.UKFMeasurementModel(measurement=lin_meas, R2=jnp.asarray(R2), ny=1)
    state = kf.init()
    outs = []
    for mm in (lmm, emm, umm):
        s2, info = kf.correct(state, u[0], y[0], mm=mm)
        outs.append((np.asarray(s2.x), float(info.ll)))
    for xv, ll in outs[1:]:
        np.testing.assert_allclose(xv, outs[0][0], rtol=1e-6, atol=1e-9)
        assert np.isclose(ll, outs[0][1], rtol=1e-6)


def test_composite_measurement_model(data):
    kf, x, u, y = data
    C2 = np.array([[0.0, 1.0]])
    m1 = llpf.LinearMeasurementModel(C=C, D=None, R2=R2, ny=1)
    m2 = llpf.LinearMeasurementModel(C=C2, D=None, R2=0.2 * np.eye(1), ny=1)
    comp = llpf.CompositeMeasurementModel(models=(m1, m2))
    assert comp.ny == 2
    state = kf.init()
    y2 = jnp.array([y[0][0], 0.1])
    s2, info = kf.correct(state, u[0], y2, mm=comp)
    assert info.e.shape == (2,)
    assert np.isfinite(float(info.ll))
    # sequential fusion reduces uncertainty vs single sensor
    s1, _ = kf.correct(state, u[0], y[0], mm=m1)
    assert float(jnp.trace(s2.R)) < float(jnp.trace(s1.R))


def test_ukf_grad(data):
    """jax.grad through the UKF scan (test_diff.jl analogue)."""
    _, x, u, y = data

    def nll(lr):
        ukf = llpf.make_ukf(lin_dyn, lin_meas, R1, jnp.exp(lr) * jnp.eye(1),
                            d0=d0(), nu=1, ny=1)
        return -llpf.loglik(ukf, u, y)

    v = jnp.log(jnp.asarray(0.1))
    g = jax.grad(nll)(v)
    eps = 1e-6
    fd = (nll(v + eps) - nll(v - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-4)


def test_sigma_point_rejection(data):
    _, x, u, y = data
    calls = []

    def reject(xp):
        return jnp.any(jnp.abs(xp) > 1e3)

    ukf = llpf.make_ukf(lin_dyn, lin_meas, R1, R2, d0=d0(), nu=1, ny=1,
                        reject=reject)
    sol = llpf.forward_trajectory(ukf, u, y)
    assert bool(sol.ok.all())


def test_augmented_measurement_equals_additive(data):
    """AUGM (noise through the measurement fn) ≡ additive UKF on an
    additive model (test_ukf.jl:169-178 measurement side)."""
    kf, xs, us, ys = data
    ukf_add = llpf.make_ukf(lin_dyn, lin_meas, R1, R2, d0=d0(), nu=1, ny=1)
    ukf_augm = llpf.make_ukf(
        lin_dyn, lambda x, u, p, t, e: jnp.asarray(C) @ x + e,
        R1, R2, d0=d0(), nu=1, ny=1, augmented_measurement=True,
    )
    s1 = llpf.forward_trajectory(ukf_add, us, ys)
    s2 = llpf.forward_trajectory(ukf_augm, us, ys)
    np.testing.assert_allclose(np.asarray(s2.xt), np.asarray(s1.xt), atol=1e-8)
    np.testing.assert_allclose(float(s2.ll), float(s1.ll), rtol=1e-9)


def test_manifold_circular_state():
    """Custom state/measurement mean+innovation hooks for an angle state
    (the reference's manifold/custom-UT workflow, ukf.jl:357-367):
    a standard UKF breaks at the ±π wrap, the circular UKF tracks it."""
    R1a = jnp.array([[0.05]])
    R2a = jnp.array([[0.1]])
    omega = 0.3

    def dyn(x, u, p, t):
        return x + omega

    def meas(x, u, p, t):
        return x

    def wrap(a):
        return jnp.mod(a + jnp.pi, 2 * jnp.pi) - jnp.pi

    def circ_mean(xs, W):
        # weighted mean on the circle via the embedding
        s = W.wm * jnp.sin(xs[0]) + W.wmi * jnp.sum(jnp.sin(xs[1:]), axis=0)
        c = W.wm * jnp.cos(xs[0]) + W.wmi * jnp.sum(jnp.cos(xs[1:]), axis=0)
        return jnp.arctan2(s, c)

    def circ_cov(xs, m, W):
        d = wrap(xs - m)
        w = jnp.concatenate([jnp.full((1,), W.wc, xs.dtype),
                             jnp.full((xs.shape[0] - 1,), W.wci, xs.dtype)])
        return jnp.einsum("s,si,sj->ij", w, d, d)

    def circ_cross(xs, xm, ys, ym, W):
        dx = wrap(xs - xm)
        dy = wrap(ys - ym)
        w = jnp.concatenate([jnp.full((1,), W.wc, xs.dtype),
                             jnp.full((xs.shape[0] - 1,), W.wci, xs.dtype)])
        return jnp.einsum("s,si,sj->ij", w, dx, dy)

    d0a = llpf.MvNormal(jnp.array([3.0]), jnp.array([[0.1]]))
    ukf_circ = llpf.make_ukf(
        dyn, meas, R1a, R2a, d0=d0a, nu=0, ny=1,
        state_mean=circ_mean, state_cov=circ_cov,
        measurement_mean=circ_mean, measurement_cov=circ_cov,
        cross_cov=circ_cross,
        innovation=lambda y, yh: wrap(y - yh),
    )
    # simulate a wrapped angle trajectory crossing ±π
    T = 40
    rng = np.random.default_rng(0)
    ang = 3.0
    ys, angs = [], []
    for k in range(T):
        angs.append(ang)
        ys.append(wrap(jnp.array([ang + 0.3 * rng.standard_normal()])))
        ang = float(wrap(jnp.asarray(ang + omega + 0.2 * rng.standard_normal())))
    ys = jnp.stack(ys)
    state = ukf_circ.init()
    errs = []
    for k in range(T):
        state, _ = ukf_circ.correct(state, None, ys[k])
        errs.append(abs(float(wrap(jnp.asarray(state.x[0] - angs[k])))))
        state = ukf_circ.predict(state, None)
        state = state.replace(x=wrap(state.x))
    # tracks through the wrap: errors stay bounded by the noise level
    assert max(errs[5:]) < 1.0, max(errs[5:])


def test_pluggable_cholesky(data):
    """cholesky_fn override (ukf.jl:369-381): a regularized factorization
    keeps the filter running on a rank-deficient covariance."""
    kf, xs, us, ys = data
    R1_sing = np.array([[0.01, 0.0], [0.0, 0.0]])  # rank-1 process noise

    def reg_chol(S):
        return jnp.linalg.cholesky(S + 1e-9 * jnp.eye(S.shape[-1]))

    ukf = llpf.make_ukf(lin_dyn, lin_meas, R1_sing, R2, d0=d0(), nu=1, ny=1,
                        cholesky_fn=reg_chol)
    sol = llpf.forward_trajectory(ukf, us, ys)
    assert bool(sol.ok.all())


def test_iekf_iterations_help_on_strong_nonlinearity():
    """More GN iterations improve the measurement update when the
    measurement is strongly nonlinear (iekf.jl:63-120 semantics)."""
    R1a = jnp.array([[0.01]])
    R2a = jnp.array([[0.01]])
    d0a = llpf.MvNormal(jnp.array([1.2]), jnp.array([[0.25]]))
    meas = lambda x, u, p, t: x**3
    dyn = lambda x, u, p, t: x
    lls = {}
    for iters in (1, 10):
        iekf = llpf.make_iekf(dyn, meas, R1a, R2a, d0=d0a, nu=0, ny=1,
                              maxiters=iters)
        state = iekf.init()
        # true x = 2.0, y = 8.0: far from the prior mean, strong curvature
        state, info = iekf.correct(state, None, jnp.array([8.0]))
        lls[iters] = abs(float(state.x[0]) - 2.0)
    assert lls[10] < lls[1], lls


def test_iekf_custom_cjac_matches_autodiff():
    """IEKF with an analytic measurement Jacobian is identical to the
    jacfwd default (test_iekf.jl:131-173: h(x)=1/x and h2(x,u)=u/x)."""
    Q = jnp.array([[1.0]])
    RR = jnp.array([[2.0]])
    d0a = llpf.MvNormal(jnp.array([5.0]), jnp.eye(1))
    dyn = lambda x, u, p, t: x - 0.01 * x**2

    h = lambda x, u, p, t: 1.0 / x
    hjac = lambda x, u, p, t: jnp.reshape(-1.0 / x**2, (1, 1))
    iekf_ad = llpf.make_iekf(dyn, h, Q, RR, d0=d0a, nu=0, ny=1)
    iekf_an = llpf.make_iekf(dyn, h, Q, RR, d0=d0a, nu=0, ny=1, Cjac=hjac)
    sa, _ = iekf_ad.correct(iekf_ad.init(), None, jnp.array([0.25]))
    sb, _ = iekf_an.correct(iekf_an.init(), None, jnp.array([0.25]))
    # posterior sanity (test_iekf.jl:153-155): moved toward 1/y=4, R shrank
    assert 4.0 < float(sa.x[0]) < 5.0
    assert float(sa.R[0, 0]) < 1.0
    np.testing.assert_allclose(np.asarray(sb.x), np.asarray(sa.x), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sb.R), np.asarray(sa.R), rtol=1e-6)

    # u-dependent measurement h2(x, u) = u/x with step=0.9
    h2 = lambda x, u, p, t: u / x
    h2jac = lambda x, u, p, t: jnp.reshape(-u / x**2, (1, 1))
    ie2a = llpf.make_iekf(dyn, h2, Q, RR, d0=d0a, nu=1, ny=1, step=0.9)
    ie2b = llpf.make_iekf(dyn, h2, Q, RR, d0=d0a, nu=1, ny=1, step=0.9,
                          Cjac=h2jac)
    u0 = jnp.array([100.0])
    s2a, _ = ie2a.correct(ie2a.init(), u0, jnp.array([25.0]))
    s2b, _ = ie2b.correct(ie2b.init(), u0, jnp.array([25.0]))
    assert 4.0 < float(s2a.x[0]) < 5.0
    assert float(s2a.R[0, 0]) < 1.0
    np.testing.assert_allclose(np.asarray(s2b.x), np.asarray(s2a.x), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s2b.R), np.asarray(s2a.R), rtol=1e-6)


def test_ekf_r12_correlated_noise(rng):
    """Filter with the R12 cross-covariance has lower estimation-error
    variance on correlated-noise data (test_ekf.jl:364-449, Simon's
    Example 7.1: x⁺=0.8x+w, y=x+v, E[wv]=0.25)."""
    Ar = jnp.array([[0.8]])
    Cr = jnp.array([[1.0]])
    R1n = jnp.array([[1.0]])
    R2n = jnp.array([[0.1]])
    R12n = jnp.array([[0.25]])
    d0n = llpf.MvNormal(jnp.zeros(1), jnp.eye(1))
    dynr = lambda x, u, p, t: Ar @ x
    hr = lambda x, u, p, t: Cr @ x
    ekf_c = llpf.make_ekf(dynr, hr, R1n, R2n, d0=d0n, nu=1, ny=1, R12=R12n)
    ekf_u = llpf.make_ekf(dynr, hr, R1n, R2n, d0=d0n, nu=1, ny=1)
    u = jnp.zeros((400, 1))
    xs, u, y = llpf.simulate(ekf_c, u, jax.random.PRNGKey(21))  # joint noise
    sol_c = llpf.forward_trajectory(ekf_c, u, y)
    sol_u = llpf.forward_trajectory(ekf_u, u, y)
    var = lambda s: float(jnp.var(s.xt - xs))
    assert var(sol_c) < var(sol_u), (var(sol_c), var(sol_u))
    # UKF correcting through an EKF measurement model with R12 also wins
    mm = llpf.EKFMeasurementModel(measurement=hr, R2=R2n, R12=R12n, ny=1)
    ukf = llpf.make_ukf(dynr, mm, R1n, None, d0=d0n, nu=1, ny=1)
    sol_ukf = llpf.forward_trajectory(ukf, u, y)
    assert float(jnp.var(sol_ukf.xt - xs)) < var(sol_u)


def test_kf_r12_matches_ekf_r12(rng):
    """Linear KF with R12 ≡ EKF with R12 (same update algebra,
    filtering.jl:106-116 vs ekf.jl:170-179)."""
    R1n = 0.1 * np.eye(2)
    R2n = np.array([[0.1]])
    R12n = np.array([[0.09], [0.0]])
    d0n = llpf.MvNormal(jnp.zeros(2), 0.1 * jnp.eye(2))
    Cl = np.array([[1.0, 0.0]])
    kf = llpf.KalmanFilter(A, B, Cl, 0, R1n, R2n, R12=jnp.asarray(R12n), d0=d0n)
    h = lambda x, u, p, t: jnp.array([x[0]])
    ekf = llpf.make_ekf(lin_dyn, h, R1n, R2n, d0=d0n, nu=1, ny=1, R12=jnp.asarray(R12n))
    u = jnp.asarray(rng.normal(size=(100, 1)))
    _, u, y = llpf.simulate(kf, u, jax.random.PRNGKey(22))
    s1 = llpf.forward_trajectory(kf, u, y)
    s2 = llpf.forward_trajectory(ekf, u, y)
    np.testing.assert_allclose(np.asarray(s2.xt), np.asarray(s1.xt), atol=1e-8)
    np.testing.assert_allclose(float(s2.ll), float(s1.ll), rtol=1e-10)


def test_pluggable_cholesky_fn(data):
    """cholesky_fn (ukf.jl:369-381, the PositiveFactorizations analogue):
    a jittered factorization matches the default on well-conditioned
    systems and keeps an ill-conditioned UKF finite where the default
    NaN-propagates."""
    _, x, u, y = data

    def chol_jitter(S):
        n = S.shape[-1]
        return jnp.linalg.cholesky(S + 1e-10 * jnp.eye(n, dtype=S.dtype))

    ukf = llpf.make_ukf(lin_dyn, lin_meas, R1, R2, d0=d0(), nu=1, ny=1)
    ukf_j = llpf.make_ukf(lin_dyn, lin_meas, R1, R2, d0=d0(), nu=1, ny=1,
                          cholesky_fn=chol_jitter)
    s1 = llpf.forward_trajectory(ukf, u, y)
    s2 = llpf.forward_trajectory(ukf_j, u, y)
    # the jitter perturbs every factorization; the filters agree to the
    # accumulated-perturbation level, not bitwise
    np.testing.assert_allclose(np.asarray(s2.xt), np.asarray(s1.xt),
                               rtol=1e-3, atol=1e-4)

    # a singular prior covariance: the default chol NaNs out (ok=False),
    # the jittered one survives
    d0_sing = llpf.MvNormal(jnp.zeros(2), jnp.zeros((2, 2)))
    ukf_bad = llpf.make_ukf(lin_dyn, lin_meas, 0.0 * R1, R2, d0=d0_sing,
                            nu=1, ny=1)
    def chol_jitter_big(S):
        n = S.shape[-1]
        return jnp.linalg.cholesky(S + 1e-6 * jnp.eye(n, dtype=S.dtype))

    ukf_fix = llpf.make_ukf(lin_dyn, lin_meas, 0.0 * R1, R2, d0=d0_sing,
                            nu=1, ny=1, cholesky_fn=chol_jitter_big)
    sb = llpf.forward_trajectory(ukf_bad, u[:20], y[:20])
    sf = llpf.forward_trajectory(ukf_fix, u[:20], y[:20])
    assert not bool(jnp.all(sb.ok))
    assert bool(jnp.all(sf.ok))


def test_bumpy_disturbance_augmented_smoother_ordering():
    """test_ukf.jl:338-388: augmented-dynamics UKF with multiplicative
    disturbance noise; the unscented RTS smoother must beat filtering,
    which must beat prediction (eT < eF < eP)."""
    T = 150
    rng = np.random.default_rng(0)
    w_seq = np.stack([np.sqrt(0.1) * rng.normal(size=T),
                      np.sin(0.1 * np.arange(1, T + 1)) ** 2], axis=1)
    x_true = [1.0]
    ys = [[1.0]]
    for i in range(T - 1):
        x_true.append(0.8 * x_true[i] + w_seq[i, 0] + w_seq[i, 1])
        ys.append([x_true[i] + np.sqrt(0.1) * rng.normal()])
    X = np.stack([np.asarray(x_true), w_seq[:, 1]], axis=1)

    def dist_dyn(xd, u, p, t, w):
        x, dd = xd
        return jnp.array([0.8 * x + dd + w[0], jnp.abs(dd * (w[1] ** 2 + 1))])

    def dist_meas(xd, u, p, t):
        return xd[:1]

    R1b = 0.1 * jnp.eye(2)
    ukfw = llpf.make_ukf(dist_dyn, dist_meas, R1b, 0.1 * jnp.eye(1),
                         d0=llpf.MvNormal(jnp.zeros(2), R1b),
                         nu=0, ny=1, nw=2, augmented_dynamics=True)
    us = jnp.zeros((T, 0))
    ysj = jnp.asarray(np.asarray(ys))
    ssol = ukfw.smooth(us, ysj)
    eT = float(np.sum((X - np.asarray(ssol.xT)) ** 2))
    eF = float(np.sum((X - np.asarray(ssol.xt)) ** 2))
    eP = float(np.sum((X - np.asarray(ssol.x)) ** 2))
    assert eT < eF < eP, (eT, eF, eP)


def test_sample_time_invariance_covariance_tuning():
    """test_ukf.jl:391-456: the same continuous-time noise process
    expressed four ways — discrete KF/UKF with R1*Ts, augmented UKF with
    rk4-discretized continuous noise input (R1/Ts), and the exactly
    c2d-discretized augmented form — yields the SAME covariance
    evolution for any Ts."""
    R1s = 1.0
    R2s = jnp.array([[1.0]])
    d0s = llpf.MvNormal(jnp.zeros(1), 1e-8 * jnp.eye(1))

    def cov_evol_predict_only(f, steps=60):
        s = f.init()
        out = []
        for _ in range(steps):
            out.append(float(s.R[0, 0]))
            s = f.predict(s, jnp.zeros(1))
        return np.asarray(out)

    for Ts in (0.1, 1.0, 10.0):
        # integrator: c2d(ss(0,1,1,0), Ts): A=1, B=Ts
        Ad = jnp.array([[1.0]])
        Bd = jnp.array([[Ts]])
        Cd = jnp.array([[1.0]])

        kf = llpf.KalmanFilter(Ad, Bd, Cd, 0, R1s * Ts * jnp.eye(1), R2s,
                               d0=d0s, Ts=Ts)
        ukf = llpf.make_ukf(lambda x, u, p, t: Ad @ x + Bd @ u,
                            lambda x, u, p, t: Cd @ x,
                            R1s * Ts * jnp.eye(1), R2s, d0=d0s,
                            nu=1, ny=1, Ts=Ts)

        # augmented continuous noise input, rk4-discretized
        def dyn_w_cont(x, u, p, t, w):
            return 0.0 * x + u + w

        def dyn_w_disc(x, u, p, t, w, Ts=Ts):
            step = llpf.rk4(lambda xx, uu, pp, tt: dyn_w_cont(xx, uu, pp, tt, w),
                            Ts, supersample=100)
            return step(x, u, p, t)

        ukfw = llpf.make_ukf(dyn_w_disc, lambda x, u, p, t: Cd @ x,
                             (R1s / Ts) * jnp.eye(1), R2s, d0=d0s,
                             nu=1, ny=1, nw=1, augmented_dynamics=True)

        # exactly-discretized augmented form: Bw_d = Ts * chol(R1) = Ts
        def dyn_w_aug(x, u, p, t, w, Ts=Ts):
            return Ad @ x + Bd @ u + Ts * w

        ukfw_aug = llpf.make_ukf(dyn_w_aug, lambda x, u, p, t: Cd @ x,
                                 (R1s / Ts) * jnp.eye(1), R2s, d0=d0s,
                                 nu=1, ny=1, nw=1, augmented_dynamics=True)

        r0 = cov_evol_predict_only(kf)
        r1 = cov_evol_predict_only(ukf)
        r2 = cov_evol_predict_only(ukfw)
        r3 = cov_evol_predict_only(ukfw_aug)
        np.testing.assert_allclose(r1, r0, rtol=1e-5)
        np.testing.assert_allclose(r2, r0, rtol=1e-5)
        np.testing.assert_allclose(r3, r0, rtol=1e-5)
