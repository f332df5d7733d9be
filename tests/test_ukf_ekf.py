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
