"""Ensemble Kalman filter — statistical depth.

Mirrors /root/reference/test/test_enkf.jl line by line where meaningful:
construction/state access, reset semantics, SSE-vs-KF bounds, ll
closeness, ensemble-size sweep, inflation, time-varying R1, inputless
dynamics, solution format, and simulate.  The reference's ``threads``
flag has no analogue (vmap always batches the ensemble); the serial-vs-
threaded determinism check maps to jit-vs-eager determinism instead.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lowlevelparticlefilters_jl_tpu as llpf

A = jnp.array([[0.99, 0.1], [0.0, 0.2]])
B = jnp.array([[-0.74, 1.61], [-1.44, 1.75]])
C = jnp.eye(2)
R1 = jnp.eye(2)
R2 = jnp.eye(2)
NX, NU, NY, N = 2, 2, 2, 100


def dyn(x, u, p, t):
    return A @ x + B @ u


def meas(x, u, p, t):
    return C @ x


def d0(mu=None):
    mu = jnp.asarray([0.5, -0.3]) if mu is None else jnp.asarray(mu)
    return llpf.MvNormal(mu, 4.0 * jnp.eye(NX))


def mk_enkf(N=N, **kw):
    kw.setdefault("dynamics", dyn)
    kw.setdefault("measurement", meas)
    kw.setdefault("R1", R1)
    kw.setdefault("R2", R2)
    kw.setdefault("d0", d0())
    kw.setdefault("nu", NU)
    kw.setdefault("ny", NY)
    return llpf.EnsembleKalmanFilter(N=N, **kw)


@pytest.fixture(scope="module")
def data():
    kf = llpf.KalmanFilter(A, B, C, 0, R1, R2, d0=d0())
    du = llpf.MvNormal(jnp.zeros(NU), jnp.eye(NU))
    x, u, y = llpf.simulate(kf, 200, jax.random.PRNGKey(42), du=du)
    return kf, x, u, y


class TestConstructionAndState:
    def test_basic_access(self):
        """num_particles/state/covariance access (test_enkf.jl:36-46)."""
        enkf = mk_enkf()
        st = enkf.init(jax.random.PRNGKey(0))
        assert st.X.shape == (N, NX)
        assert enkf.state(st).shape == (NX,)
        assert enkf.covariance(st).shape == (NX, NX)
        # initial ensemble statistics approximately match d0
        assert float(jnp.linalg.norm(enkf.state(st) - d0().mean)) < 1.0

    def test_reset_semantics(self):
        """init() restores t=0; init(x0=...) recenters (test_enkf.jl:49-52,
        :150-153)."""
        enkf = mk_enkf()
        st = enkf.init(jax.random.PRNGKey(1))
        assert int(st.t) == 0
        st0 = enkf.init(jax.random.PRNGKey(1), x0=jnp.zeros(NX))
        assert float(jnp.linalg.norm(enkf.state(st0))) < 2.0

    def test_predict_correct_update(self):
        """predict advances t; correct moves the mean; update returns the
        (ll, e, S, K) info (test_enkf.jl:55-80)."""
        enkf = mk_enkf()
        key = jax.random.PRNGKey(2)
        u1 = jax.random.normal(key, (NU,))
        y1 = jax.random.normal(jax.random.fold_in(key, 1), (NY,))
        st = enkf.init(jax.random.PRNGKey(3))
        stp = enkf.predict(st, u1)
        assert int(stp.t) == 1
        stc, info = enkf.correct(st, u1, y1)
        assert not np.allclose(np.asarray(enkf.state(stc)), np.asarray(d0().mean))
        st2, info = enkf.update(st, u1, y1)
        for f in ("ll", "e", "S", "K"):
            assert hasattr(info, f)
        assert int(st2.t) == 1

    def test_simulate(self):
        """simulate(enkf, T, du) draws a trajectory (test_enkf.jl:88-90)."""
        enkf = mk_enkf()
        du = llpf.MvNormal(jnp.zeros(NU), jnp.eye(NU))
        x, u, y = llpf.simulate(enkf, 50, jax.random.PRNGKey(4), du=du)
        assert x.shape == (50, NX) and u.shape == (50, NU) and y.shape == (50, NY)
        assert bool(jnp.all(jnp.isfinite(x)))


class TestKFComparison:
    def test_sse_and_ll_bounds(self, data):
        """EnKF(500) within 1.2x KF SSE and ll within 5.0 on the linear
        system (test_enkf.jl:94-122)."""
        kf, x_true, u, y = data
        sol_kf = llpf.forward_trajectory(kf, u, y)
        enkf = mk_enkf(N=500)
        sol_en = enkf.forward_trajectory(u, y, key=jax.random.PRNGKey(5))
        sse = lambda d: float(jnp.sum(jnp.square(d)))
        sse_kf = sse(x_true - sol_kf.xt)
        sse_en = sse(x_true - sol_en.xt)
        assert sse_en < 1.2 * sse_kf
        assert sse_en < 500
        assert abs(float(sol_en.ll) - float(sol_kf.ll)) < 5.0

    @pytest.mark.parametrize("N_test", [20, 50, 200])
    def test_ensemble_sizes(self, data, N_test):
        """Finite ll for all ensemble sizes (test_enkf.jl:125-131)."""
        _, _, u, y = data
        enkf = mk_enkf(N=N_test)
        sol = enkf.forward_trajectory(u[:10], y[:10], key=jax.random.PRNGKey(6))
        assert np.isfinite(float(sol.ll))

    def test_inflation(self, data):
        """Inflation field + finite run (test_enkf.jl:134-139)."""
        _, _, u, y = data
        enkf = mk_enkf(inflation=1.05)
        assert float(enkf.inflation) == 1.05
        sol = enkf.forward_trajectory(u[:20], y[:20], key=jax.random.PRNGKey(7))
        assert np.isfinite(float(sol.ll))

    def test_time_varying_R1(self, data):
        """Callable R1(x,u,p,t) (test_enkf.jl:142-145)."""
        _, _, u, y = data
        R1f = lambda x, u_, p, t: jnp.where(t < 10, 1.0, 2.0) * jnp.eye(NX)
        enkf = mk_enkf(R1=R1f)
        sol = enkf.forward_trajectory(u[:20], y[:20], key=jax.random.PRNGKey(8))
        assert np.isfinite(float(sol.ll))

    def test_no_input_dynamics(self, data):
        """nu=0 / empty u works (test_enkf.jl:156-160)."""
        _, _, _, y = data
        enkf = mk_enkf(dynamics=lambda x, u, p, t: A @ x, nu=0)
        sol = enkf.forward_trajectory(None, y[:20], key=jax.random.PRNGKey(9))
        assert np.isfinite(float(sol.ll))

    def test_solution_format(self, data):
        """KalmanFilteringSolution with [T, ...] stacked fields
        (test_enkf.jl:163-170)."""
        _, _, u, y = data
        enkf = mk_enkf()
        sol = enkf.forward_trajectory(u[:20], y[:20], key=jax.random.PRNGKey(10))
        assert sol.x.shape == (20, NX)
        assert sol.xt.shape == (20, NX)
        assert sol.R.shape == (20, NX, NX)
        assert sol.Rt.shape == (20, NX, NX)
        assert sol.e.shape == (20, NY)

    def test_jit_eager_deterministic(self, data):
        """jit and eager produce identical results with the same key — the
        JAX analogue of the reference's serial-vs-threaded RNG determinism
        check (test_enkf.jl:180-189)."""
        _, _, u, y = data
        enkf = mk_enkf()
        run = lambda: enkf.forward_trajectory(u[:20], y[:20], key=jax.random.PRNGKey(11))
        s1 = run()
        s2 = jax.jit(lambda u_, y_: enkf.forward_trajectory(
            u_, y_, key=jax.random.PRNGKey(11)).xt)(u[:20], y[:20])
        np.testing.assert_allclose(np.asarray(s1.xt), np.asarray(s2), rtol=1e-6, atol=1e-8)

    def test_calibration_nis(self, data):
        """NIS of the EnKF innovations is χ²-consistent on the linear
        system (statistical-calibration pattern, SURVEY §4.3)."""
        kf, _, u, y = data
        enkf = mk_enkf(N=1000)
        sol = enkf.forward_trajectory(u, y, key=jax.random.PRNGKey(12))
        S = np.asarray(sol.S)
        e = np.asarray(sol.e)
        nis = np.einsum("ti,tij,tj->t", e, np.linalg.inv(S), e)
        # mean NIS ~ ny = 2 for a calibrated filter
        assert 1.5 < nis.mean() < 2.6, nis.mean()
