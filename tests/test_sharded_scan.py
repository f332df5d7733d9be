"""Round-4 mesh composition of the whole-scan kernels (VERDICT r3 ask #5).

(a) ``sharded_pf_loglik_fused`` — per-device fused PF segments composed
    with global logsumexp/Neff collectives and the distributed route
    exchange at segment boundaries;
(b) ``sharded_filter_scan`` / ``time_sharded_parallel_kf`` — time-axis-
    sharded associative Kalman scan (local fused scan + cross-device
    carry combine).

Runs on the 8-virtual-device CPU mesh from tests/conftest.py; the
per-device segment body exercises the XLA-equivalent path there (the
Mosaic kernel is exercised single-chip in test_pf_scan.py and on
hardware by bench.py's certs) — what is under test here is the
composition: the collectives, the weight bookkeeping, and the exchange.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import lowlevelparticlefilters_jl_tpu as llpf
from lowlevelparticlefilters_jl_tpu.parallel.sharded import (
    pf_sharded_scan_supported,
    sharded_pf_loglik_fused,
    time_sharded_parallel_kf,
)

A = jnp.array([[0.97, -0.09], [0.09, 0.97]], jnp.float32)
B = jnp.array([[0.1], [0.0]], jnp.float32)
R1 = 0.01 * jnp.eye(2, dtype=jnp.float32)
R2 = 0.1 * jnp.eye(2, dtype=jnp.float32)


def _mesh(n, name):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.array(devs[:n]), (name,))


@pytest.fixture(scope="module")
def sim():
    kf = llpf.KalmanFilter(A, B, jnp.eye(2, dtype=jnp.float32), 0, R1, R2)
    _, u, y = llpf.simulate(kf, 0.3 * jnp.ones((96, 1), jnp.float32),
                            jax.random.PRNGKey(0))
    return kf, u, y, float(llpf.loglik(kf, u, y))


def _pf(N=16384):
    return llpf.ParticleFilter(
        N=N,
        dynamics=lambda x, u_, p, t: A @ x + B @ u_,
        measurement=lambda x, u_, p, t: x,
        dynamics_density=R1, measurement_density=R2, initial_density=R1)


def test_sharded_pf_loglik_matches_kf(sim):
    kf, u, y, ll_kf = sim
    pf = _pf()
    assert pf_sharded_scan_supported(pf, 8)
    mesh = _mesh(8, "particles")
    ll = float(sharded_pf_loglik_fused(pf, u, y, jax.random.PRNGKey(3),
                                       mesh, segment=8))
    # MC estimate of the exact KF likelihood (N=16384 → ~0.5%)
    assert abs(ll - ll_kf) < 0.02 * abs(ll_kf)


def test_sharded_pf_single_device_consistent(sim):
    # D=1 exercises the same segment/boundary algebra with trivial
    # collectives — isolates the telescoped-lse bookkeeping
    kf, u, y, ll_kf = sim
    pf = _pf(N=8192)
    mesh = _mesh(1, "particles")
    ll = float(sharded_pf_loglik_fused(pf, u, y, jax.random.PRNGKey(5),
                                       mesh, segment=8))
    assert abs(ll - ll_kf) < 0.02 * abs(ll_kf)


def test_sharded_pf_missing_measurements(sim):
    # NaN rows must be ll-neutral through the segment kernel contract
    kf, u, y, _ = sim
    pf = _pf(N=8192)
    mesh = _mesh(8, "particles")
    y_nan = y.at[10].set(jnp.nan).at[48].set(jnp.nan)  # incl. a segment head
    ll = float(sharded_pf_loglik_fused(pf, u, y_nan, jax.random.PRNGKey(3),
                                       mesh, segment=8))
    assert jnp.isfinite(ll)
    # reference: single-device sequential PF on the same NaN pattern
    ll_seq = float(pf.loglik(u, y_nan, key=jax.random.PRNGKey(3),
                             method="sequential"))
    assert abs(ll - ll_seq) < 0.03 * abs(ll_seq)


def test_time_sharded_parallel_kf(sim):
    kf, u, y, ll_kf = sim
    from lowlevelparticlefilters_jl_tpu.parallel.temporal import (
        parallel_forward_trajectory)

    mesh = _mesh(8, "time")
    xt, Rt, ll = time_sharded_parallel_kf(kf, u, y, mesh)
    sol = parallel_forward_trajectory(kf, u, y)
    assert float(jnp.max(jnp.abs(xt - sol.xt))) < 1e-4
    assert float(jnp.max(jnp.abs(Rt - sol.Rt))) < 1e-4
    assert abs(float(ll) - float(sol.ll)) < 1e-3
    assert abs(float(ll) - ll_kf) < 1e-2


def test_time_sharded_timevarying(sim):
    # stacked [T, ...] time-varying A through the sharded element path
    kf0, u, y, _ = sim
    from lowlevelparticlefilters_jl_tpu.parallel.temporal import (
        parallel_forward_trajectory)

    T = y.shape[0]
    scale = (1.0 + 0.01 * jnp.sin(jnp.arange(T, dtype=jnp.float32)))
    A_t = scale[:, None, None] * A[None]
    kf = llpf.KalmanFilter(A_t, B, jnp.eye(2, dtype=jnp.float32), 0, R1, R2)
    mesh = _mesh(8, "time")
    xt, _, ll = time_sharded_parallel_kf(kf, u, y, mesh)
    sol = parallel_forward_trajectory(kf, u, y)
    assert float(jnp.max(jnp.abs(xt - sol.xt))) < 1e-4
    assert abs(float(ll) - float(sol.ll)) < 1e-3
