"""DAE-UKF tests mirroring /root/reference/test/test_daeukf.jl:

Test-1 system:  ẋ = -x + z + w,  0 = x + z - c,  y = z + v.
Substituting z = c - x reduces to a linear-Gaussian scalar system, so the
DAE-UKF must agree with an analytical 1-D Kalman filter to numerical
precision (test_daeukf.jl:155-215), track the noise-free DAE exactly
(:218-252), and pass a NEES χ² consistency check (:254+).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

import lowlevelparticlefilters_jl_tpu as llpf

C1 = 0.7
DT1 = 0.1


def get_x_z(xz):
    return xz[:1], xz[1:]


def build_xz(x, z):
    return jnp.concatenate([x, z])


def residual(x, z, u, p, t):
    return x + z - C1


def dae_dynamics(xz, u, p, t):
    x, z = get_x_z(xz)
    new_x = x + DT1 * (-x + z)
    new_z = C1 - new_x  # the linear constraint solves in closed form
    return build_xz(new_x, new_z)


def dae_measurement(xz, u, p, t):
    return xz[1:]


def _make_filter(Q, R, P0, x0_val):
    x0 = jnp.array([x0_val])
    z0 = jnp.array([C1]) - x0
    return llpf.DAEUnscentedKalmanFilter(
        dynamics=dae_dynamics,
        measurement=dae_measurement,
        residual=residual,
        get_x_z=get_x_z,
        build_xz=build_xz,
        R1=jnp.array([[Q]]),
        R2=jnp.array([[R]]),
        d0=llpf.MvNormal(x0, jnp.array([[P0]])),
        xz0=build_xz(x0, z0),
        nu=1,
        ny=1,
        Ts=DT1,
    )


class TestLinearScalarDAE:
    def test_matches_analytical_kf(self):
        """DAE-UKF ≡ 1-D KF on the reduced system (test_daeukf.jl:155-215)."""
        Q, R, P0, x0v = 0.05, 0.02, 0.5, 0.3
        alpha, beta = 1 - 2 * DT1, DT1
        H, b = -1.0, C1
        dae = _make_filter(Q, R, P0, x0v)
        rng = np.random.default_rng(0)
        T = 500
        x_true = x0v + 0.1
        ys = []
        for _ in range(T):
            x_true = alpha * x_true + beta * C1 + np.sqrt(Q) * rng.standard_normal()
            ys.append(C1 - x_true + np.sqrt(R) * rng.standard_normal())
        ys = jnp.asarray(np.asarray(ys))[:, None]
        u = jnp.array([0.0])

        @jax.jit
        def run(ys):
            state = dae.init()

            def step(state, yk):
                state = dae.predict(state, u)
                state, info = dae.correct(state, u, yk)
                cons = jnp.abs(jnp.sum(state.xz) - C1)
                return state, (state.x[0], state.R[0, 0], cons, info.resnorm)

            _, out = jax.lax.scan(step, state, ys)
            return out

        xs_dae, Ps_dae, cons, resn = map(np.asarray, run(ys))
        # analytical KF on the reduced system
        x_kf, P_kf = x0v, P0
        xs_kf, Ps_kf = [], []
        for yk in np.asarray(ys)[:, 0]:
            x_kf = alpha * x_kf + beta * C1
            P_kf = alpha**2 * P_kf + Q
            S = H**2 * P_kf + R
            K = P_kf * H / S
            x_kf = x_kf + K * (yk - (H * x_kf + b))
            P_kf = (1 - K * H) * P_kf
            xs_kf.append(x_kf)
            Ps_kf.append(P_kf)
        np.testing.assert_allclose(xs_dae, xs_kf, atol=1e-4)
        np.testing.assert_allclose(Ps_dae, Ps_kf, atol=1e-4)
        assert cons.max() < 1e-5          # descriptor stays on the manifold
        assert resn.max() < 1e-5          # constraint solves converged

    def test_zero_noise_tracks_dae(self):
        """Noise-free filtering follows the reduced ODE exactly
        (test_daeukf.jl:218-252)."""
        dae = _make_filter(0.0, 1e-6, 1e-6, 0.3)
        alpha, beta = 1 - 2 * DT1, DT1
        u = jnp.array([0.0])
        state = dae.init()
        x_true = 0.3
        max_err = 0.0
        for _ in range(100):
            state = dae.predict(state, u)
            x_true = alpha * x_true + beta * C1
            state, _ = dae.correct(state, u, jnp.array([C1 - x_true]))
            max_err = max(max_err, abs(float(state.x[0]) - x_true))
        assert max_err < 1e-5

    def test_nees_consistency(self):
        """Time-averaged NEES within the χ² band (test_daeukf.jl:254+,
        lighter Monte-Carlo budget)."""
        Q, R, P0, x0v = 0.05, 0.02, 0.5, 0.3
        alpha, beta = 1 - 2 * DT1, DT1
        dae = _make_filter(Q, R, P0, x0v)
        u = jnp.array([0.0])
        rng = np.random.default_rng(1)
        T = 300
        x_true = np.zeros(T)
        # draw the initial truth from the filter prior so NEES is calibrated
        x = x0v + np.sqrt(P0) * rng.standard_normal()
        ys = np.zeros(T)
        for k in range(T):
            x = alpha * x + beta * C1 + np.sqrt(Q) * rng.standard_normal()
            x_true[k] = x
            ys[k] = C1 - x + np.sqrt(R) * rng.standard_normal()

        @jax.jit
        def run(ys):
            state = dae.init()

            def step(state, yk):
                state = dae.predict(state, u)
                state, _ = dae.correct(state, u, yk)
                return state, (state.x[0], state.R[0, 0])

            _, out = jax.lax.scan(step, state, ys)
            return out

        xs, Ps = map(np.asarray, run(jnp.asarray(ys)[:, None]))
        burn = 20
        nees = ((xs - x_true) ** 2 / Ps)[burn:]
        n = nees.size
        # NEES samples along one trajectory are weakly dependent; use a
        # slightly widened χ² band (×1.2) like the reference's 95% check.
        lo = stats.chi2.ppf(0.025, n) / n / 1.2
        hi = stats.chi2.ppf(0.975, n) / n * 1.2
        assert lo < nees.mean() < hi, nees.mean()

    def test_newton_solver_contract(self):
        """Built-in Newton solver satisfies the (f, z0) -> z contract."""
        solve = llpf.newton_constraint_solver(iters=20)
        f = lambda z: z**3 - jnp.array([8.0])
        z = solve(f, jnp.array([1.0]))
        np.testing.assert_allclose(np.asarray(z), [2.0], atol=1e-6)


class TestErrorPaths:
    """Error-path parity with test_daeukf.jl:880-940: the reference raises
    mid-call; the jit-compatible design surfaces the same failures as
    ``info.resnorm`` (constraint health) and NaN-propagation + ``sol.ok``
    (Cholesky breakdown) — SURVEY §5 failure-detection mapping."""

    def test_bad_solver_surfaces_large_resnorm(self):
        """A do-nothing constraint solver leaves the sigma points off the
        manifold; the residual norm must surface in info.resnorm (the
        @test_logs warn analogue, test_daeukf.jl:880-887)."""
        f = _make_filter(0.05, 0.02, 0.5, 0.3)
        bad = llpf.DAEUnscentedKalmanFilter(
            dynamics=dae_dynamics, measurement=dae_measurement,
            residual=residual, get_x_z=get_x_z, build_xz=build_xz,
            R1=jnp.array([[0.05]]), R2=jnp.array([[0.02]]),
            d0=llpf.MvNormal(jnp.array([5.0]), jnp.array([[0.5]])),
            xz0=build_xz(jnp.array([5.0]), jnp.array([C1 - 0.3])),  # off-manifold warm start
            nu=1, ny=1, Ts=DT1,
            constraint_solver=lambda fres, z0: z0,  # does nothing
        )
        st = bad.init()
        st, info = bad.correct(st, jnp.array([0.0]), jnp.array([0.0]))
        assert float(info.resnorm) > 1.0  # residual ≈ |x + z - C1| ≫ tol
        # the healthy filter keeps resnorm tiny on the same step
        stg = f.init()
        _, info_good = f.correct(stg, jnp.array([0.0]), jnp.array([0.0]))
        assert float(info_good.resnorm) < 1e-6

    def test_indefinite_R2_propagates_nan_and_flags_ok(self):
        """Indefinite innovation covariance: the reference raises a clear
        ErrorException (test_daeukf.jl:929-940); the jit-safe equivalent is
        NaN-propagating Cholesky + sol.ok == False."""
        f = _make_filter(0.05, 0.02, 0.5, 0.3)
        st = f.init()
        st = f.predict(st, jnp.array([0.0]))
        _, info = f.correct(
            st, jnp.array([0.0]), jnp.array([0.0]), R2=jnp.array([[-1.0]])
        )
        assert not np.isfinite(float(info.ll))

    def test_forward_trajectory_ok_flags_cholesky_breakdown(self):
        """End-to-end: a trajectory driven with an indefinite R2 override
        must come back with ok == False everywhere, not wrong numbers."""
        f = _make_filter(0.05, 0.02, 0.5, 0.3)
        T = 10
        us = jnp.zeros((T, 1))
        ys = 0.1 * jnp.ones((T, 1))
        sol = llpf.forward_trajectory(
            f, us, ys,
            pre_correct_cb=lambda *a: jnp.array([[-1.0]]),
        )
        assert not bool(jnp.any(sol.ok))

    def test_resnorm_monitoring_via_callback(self):
        """The 4-callback protocol can watch constraint health per step —
        the functional replacement for the reference's @warn
        (ukf.jl:1176-1177)."""
        f = _make_filter(0.05, 0.02, 0.5, 0.3)
        T = 15
        us = jnp.zeros((T, 1))
        kf_key = jax.random.PRNGKey(0)
        _, _, ys = llpf.simulate(f, us, kf_key)

        def post_correct_cb(flt, state, info, u, y, p, t):
            return state, info.resnorm

        sol = llpf.forward_trajectory(f, us, ys, post_correct_cb=post_correct_cb)
        resnorms = np.asarray(sol.extra)
        assert resnorms.shape == (T,)
        assert resnorms.max() < 1e-6
