"""Tests for TPU-fast resampling formulations and the mesh-sharded layer.

Mirrors the reference's resampler-proportion tests (runtests.jl:108-143)
plus cross-implementation equivalence, and validates the sharded particle
filter against the exact KalmanFilter oracle on an 8-device CPU mesh
(SURVEY.md §4 multi-device strategy).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lowlevelparticlefilters_jl_tpu as llpf
from lowlevelparticlefilters_jl_tpu.ops.resample import (
    resample_systematic,
    resample_systematic_gather,
    _systematic_slots,
)
from lowlevelparticlefilters_jl_tpu.parallel import (
    particle_mesh,
    sharded_forward_trajectory,
    bank_loglik,
    bank_mesh,
    shard_bank,
)


def _weights(N, key):
    we = jax.random.uniform(key, (N,))
    return we / we.sum()


class TestSystematicCountingSort:
    def test_matches_searchsorted(self):
        """Counting-sort indices == literal CDF search (up to fp ties)."""
        for N in (64, 1000, 4096):
            key = jax.random.PRNGKey(N)
            we = _weights(N, key)
            j = resample_systematic(we, jax.random.PRNGKey(1))
            bins = jnp.cumsum(we)
            r = jax.random.uniform(jax.random.PRNGKey(1), (), dtype=we.dtype)
            u = (r + jnp.arange(N, dtype=we.dtype)) / N * bins[-1]
            j_ref = jnp.clip(jnp.searchsorted(bins, u, side="right"), 0, N - 1)
            assert int(jnp.max(jnp.abs(j - j_ref))) <= 1
            assert float(jnp.mean((j != j_ref).astype(jnp.float32))) < 0.01

    def test_monotone_and_proportional(self):
        """Offspring counts proportional to weights (runtests.jl:108-127)."""
        N = 10_000
        we = _weights(N, jax.random.PRNGKey(0))
        j = resample_systematic(we, jax.random.PRNGKey(3))
        assert bool(jnp.all(jnp.diff(j) >= 0))
        counts = np.bincount(np.asarray(j), minlength=N)
        # systematic resampling: counts in {floor, ceil} of N*we
        expect = np.asarray(we) * N
        assert np.all(np.abs(counts - expect) <= 1.0 + 1e-6)

    def test_fused_gather_matches_indexing(self):
        N = 5000
        we = _weights(N, jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (N, 3))
        key = jax.random.PRNGKey(2)
        y_fused = resample_systematic_gather(x, we, key)
        j = resample_systematic(we, key)
        np.testing.assert_allclose(
            np.asarray(y_fused), np.asarray(x[j]), atol=1e-8
        )

    def test_slots_partition_output(self):
        N = 257
        we = _weights(N, jax.random.PRNGKey(9))
        K = _systematic_slots(we, jax.random.PRNGKey(4), N)
        assert int(K[-1]) == N  # full CDF covers all N slots
        assert bool(jnp.all(jnp.diff(K) >= 0))


@pytest.fixture(scope="module")
def system():
    A = jnp.array([[0.97043, -0.097368], [0.097368, 0.970437]])
    B = jnp.array([[0.1], [0.0]])
    C = jnp.eye(2)
    R1 = 0.01 * jnp.eye(2)
    R2 = 0.1 * jnp.eye(2)
    return A, B, C, R1, R2


class TestShardedParticleFilter:
    def test_matches_kf_oracle(self, system):
        """Sharded PF loglik ≈ exact KF loglik on the linear-Gaussian
        system (cross-filter oracle pattern, runtests.jl:332-382)."""
        A, B, C, R1, R2 = system
        assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
        pf = llpf.ParticleFilter(
            N=2048,
            dynamics=lambda x, u, p, t: A @ x + B @ u,
            measurement=lambda x, u, p, t: C @ x,
            dynamics_density=R1,
            measurement_density=R2,
            initial_density=R1,
            resample_threshold=1.0,
        )
        kf = llpf.KalmanFilter(A, B, C, 0, R1, R2)
        _, us, ys = llpf.simulate(kf, 0.3 * jnp.ones((60, 1)), jax.random.PRNGKey(0))
        mesh = particle_mesh(8)
        xs, ws, wes, ll_sh = sharded_forward_trajectory(
            pf, us, ys, jax.random.PRNGKey(1), mesh
        )
        ll_kf = llpf.loglik(kf, us, ys)
        assert abs(float(ll_sh) - float(ll_kf)) < 0.05 * abs(float(ll_kf))
        # weights globally normalized at every step
        np.testing.assert_allclose(np.asarray(jnp.sum(wes, axis=-1)), 1.0, atol=1e-6)

    def test_matches_unsharded_statistics(self, system):
        A, B, C, R1, R2 = system
        pf = llpf.ParticleFilter(
            N=4096,
            dynamics=lambda x, u, p, t: A @ x + B @ u,
            measurement=lambda x, u, p, t: C @ x,
            dynamics_density=R1,
            measurement_density=R2,
            initial_density=R1,
            resample_threshold=0.5,  # exercise the Neff-trigger branch
        )
        kf = llpf.KalmanFilter(A, B, C, 0, R1, R2)
        _, us, ys = llpf.simulate(kf, 0.3 * jnp.ones((40, 1)), jax.random.PRNGKey(2))
        mesh = particle_mesh(8)
        xs, ws, wes, ll_sh = sharded_forward_trajectory(
            pf, us, ys, jax.random.PRNGKey(3), mesh
        )
        sol = llpf.forward_trajectory(pf, us, ys, key=jax.random.PRNGKey(4))
        m_sh = np.einsum("tn,tnd->td", np.asarray(wes), np.asarray(xs))
        m_un = np.einsum("tn,tnd->td", np.asarray(sol.we), np.asarray(sol.x))
        # agree to Monte-Carlo tolerance
        assert np.abs(m_sh - m_un).max() < 0.15
        assert abs(float(ll_sh) - float(sol.ll)) < 0.05 * abs(float(sol.ll))


class TestFilterBank:
    def test_bank_loglik_matches_loop(self, system):
        A, B, C, R1, R2 = system
        kf = llpf.KalmanFilter(A, B, C, 0, R1, R2)
        Bk, T = 16, 30
        keys = jax.random.split(jax.random.PRNGKey(0), Bk)
        us = 0.3 * jnp.ones((Bk, T, 1))
        ys = jax.vmap(lambda k, u: llpf.simulate(kf, u, k)[2])(keys, us)
        lls = bank_loglik(kf, us, ys)
        for i in range(0, Bk, 5):
            assert abs(float(lls[i]) - float(llpf.loglik(kf, us[i], ys[i]))) < 1e-6

    def test_bank_sharded_over_mesh(self, system):
        A, B, C, R1, R2 = system
        kf = llpf.KalmanFilter(A, B, C, 0, R1, R2)
        Bk, T = 16, 20
        keys = jax.random.split(jax.random.PRNGKey(1), Bk)
        us = 0.3 * jnp.ones((Bk, T, 1))
        ys = jax.vmap(lambda k, u: llpf.simulate(kf, u, k)[2])(keys, us)
        mesh = bank_mesh(8)
        us_s, ys_s = shard_bank((us, ys), mesh)
        lls = jax.jit(lambda u, y: bank_loglik(kf, u, y))(us_s, ys_s)
        lls_ref = bank_loglik(kf, us, ys)
        np.testing.assert_allclose(np.asarray(lls), np.asarray(lls_ref), rtol=1e-6)

    def test_grad_through_bank(self, system):
        """Gradient of bank loglik w.r.t. filter matrices (test_diff.jl
        analogue) — reverse-mode through scan + vmap."""
        A, B, C, R1, R2 = system
        kf = llpf.KalmanFilter(A, B, C, 0, R1, R2)
        _, us, ys = llpf.simulate(kf, 0.3 * jnp.ones((20, 1)), jax.random.PRNGKey(5))

        def nll(a11):
            Ap = A.at[0, 0].set(a11)
            kfp = llpf.KalmanFilter(Ap, B, C, 0, R1, R2)
            return -llpf.loglik(kfp, us, ys)

        g = jax.grad(nll)(A[0, 0])
        assert np.isfinite(float(g))
        # finite-difference check
        eps = 1e-5
        fd = (nll(A[0, 0] + eps) - nll(A[0, 0] - eps)) / (2 * eps)
        np.testing.assert_allclose(float(g), float(fd), rtol=1e-3)
