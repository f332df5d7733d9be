"""Fused associative-scan kernel (ops/pallas/assoc_scan.py) vs the XLA
`jax.lax.associative_scan` oracle — interpret mode (CPU), matching the
test strategy of the other pallas kernels (resample_v2, ffbs_kernel).

Small L values force multi-block grids so the sublane-carry sweep and
the cross-block VMEM carry are exercised, not just the lane Hillis pass.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowlevelparticlefilters_jl_tpu.ops.pallas.assoc_scan import (
    filter_scan, smooth_scan)
from lowlevelparticlefilters_jl_tpu.parallel import temporal as tp


def _filter_elems(rng, T, nx):
    A = jnp.asarray(rng.normal(size=(T, nx, nx)) * 0.3, jnp.float32)
    b = jnp.asarray(rng.normal(size=(T, nx)), jnp.float32)
    Ch = rng.normal(size=(T, nx, nx)) * 0.3
    C = jnp.asarray(Ch @ np.swapaxes(Ch, -1, -2) + 0.1 * np.eye(nx),
                    jnp.float32)
    eta = jnp.asarray(rng.normal(size=(T, nx)), jnp.float32)
    Jh = rng.normal(size=(T, nx, nx)) * 0.3
    J = jnp.asarray(Jh @ np.swapaxes(Jh, -1, -2) + 0.1 * np.eye(nx),
                    jnp.float32)
    return A, b, C, eta, J


class TestFilterScanKernel:
    # nx capped at 3 here: the interpret-mode emulation of the unrolled
    # plane combine grows ~nx^3 ops and its XLA *CPU* compile alone runs
    # >10 min at nx=4 (same pathology as the plane-graph note in
    # CLAUDE.md).  nx ≥ 4 numerics are certified against the
    # HIGHEST-precision oracle on real hardware every round by
    # bench.py::certify_kernels (nx=4 and nx=6, filter + smoother).
    @pytest.mark.parametrize("nx,T,L", [(2, 200, 8), (3, 64, 8)])
    def test_vs_associative_scan(self, nx, T, L):
        rng = np.random.default_rng(nx * 1000 + T)
        A, b, C, eta, J = _filter_elems(rng, T, nx)
        want = jax.lax.associative_scan(tp._filter_combine,
                                        (A, b, C, eta, J))
        xt, Rt = filter_scan(A, b, C, eta, J, L=L, interpret=True)
        np.testing.assert_allclose(np.asarray(xt), np.asarray(want[1]),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(Rt), np.asarray(want[2]),
                                   rtol=2e-4, atol=2e-5)

    def test_single_block_no_pad(self):
        """T exactly one block (T = 8*L): no padding, single grid step."""
        rng = np.random.default_rng(7)
        nx, L = 2, 16
        A, b, C, eta, J = _filter_elems(rng, 8 * L, nx)  # T = 128
        want = jax.lax.associative_scan(tp._filter_combine,
                                        (A, b, C, eta, J))
        xt, Rt = filter_scan(A, b, C, eta, J, L=L, interpret=True)
        np.testing.assert_allclose(np.asarray(xt), np.asarray(want[1]),
                                   rtol=2e-4, atol=2e-5)


class TestSmoothScanKernel:
    @pytest.mark.parametrize("nx,T,L", [(2, 120, 8), (3, 56, 8)])
    def test_vs_reverse_associative_scan(self, nx, T, L):
        rng = np.random.default_rng(nx * 77 + T)
        E = jnp.asarray(rng.normal(size=(T, nx, nx)) * 0.4, jnp.float32)
        g = jnp.asarray(rng.normal(size=(T, nx)), jnp.float32)
        Lh = rng.normal(size=(T, nx, nx)) * 0.3
        Lm = jnp.asarray(Lh @ np.swapaxes(Lh, -1, -2), jnp.float32)
        want = jax.lax.associative_scan(
            lambda a, b: tp._smooth_combine(b, a), (E, g, Lm),
            reverse=True)
        xT, RT = smooth_scan(E, g, Lm, L=L, interpret=True)
        np.testing.assert_allclose(np.asarray(xT), np.asarray(want[1]),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(RT), np.asarray(want[2]),
                                   rtol=2e-4, atol=2e-5)


class TestEndToEndKernelRouting:
    def test_kernel_filter_matches_sequential_kf(self):
        """filter_scan on real filter elements reproduces the sequential
        KF's filtered moments (the production dispatch contract)."""
        import lowlevelparticlefilters_jl_tpu as llpf

        A = jnp.array([[0.97, -0.097], [0.097, 0.97]], jnp.float32)
        B = jnp.array([[0.1], [0.0]], jnp.float32)
        kf = llpf.KalmanFilter(A, B, jnp.eye(2, dtype=jnp.float32), 0,
                               0.01 * jnp.eye(2, dtype=jnp.float32),
                               0.1 * jnp.eye(2, dtype=jnp.float32))
        T = 100
        us = 0.3 * jnp.ones((T, 1), jnp.float32)
        _, _, ys = llpf.simulate(kf, us, jax.random.PRNGKey(0))
        seq = llpf.forward_trajectory(kf, us, ys)

        tvec = jnp.arange(T, dtype=jnp.float32)
        F = jnp.broadcast_to(A, (T, 2, 2))
        H = jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32), (T, 2, 2))
        Q = jnp.broadcast_to(0.01 * jnp.eye(2, dtype=jnp.float32), (T, 2, 2))
        R = jnp.broadcast_to(0.1 * jnp.eye(2, dtype=jnp.float32), (T, 2, 2))
        c = jnp.broadcast_to(B @ jnp.array([0.3], jnp.float32), (T, 2))
        elems = tp._filter_elements(F, c, H, Q, R, ys,
                                    kf.d0.mean, kf.d0.cov)
        xt, Rt = filter_scan(*elems, L=8, interpret=True)
        np.testing.assert_allclose(np.asarray(xt), np.asarray(seq.xt),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(Rt), np.asarray(seq.Rt),
                                   rtol=1e-3, atol=1e-4)


class TestKernelDifferentiability:
    def test_grad_falls_back_to_xla(self):
        """`pallas_call` has no autodiff rule; the custom_jvp swaps the
        kernel for the XLA associative_scan under differentiation —
        grad must match a finite difference."""
        rng = np.random.default_rng(0)
        T, nx = 40, 2
        A = jnp.asarray(rng.normal(size=(T, nx, nx)) * 0.3, jnp.float32)
        b = jnp.asarray(rng.normal(size=(T, nx)), jnp.float32)
        Ch = rng.normal(size=(T, nx, nx)) * 0.3
        C0 = jnp.asarray(Ch @ np.swapaxes(Ch, -1, -2), jnp.float32)
        eta = jnp.asarray(rng.normal(size=(T, nx)), jnp.float32)
        J = 0.1 * jnp.broadcast_to(jnp.eye(nx, dtype=jnp.float32),
                                   (T, nx, nx))
        from lowlevelparticlefilters_jl_tpu.ops.pallas.assoc_scan import (
            filter_scan_p)

        def loss(q):
            C = C0 + q * jnp.eye(nx, dtype=jnp.float32)
            e = (tp._m_split(A), tp._v_split(b), tp._m_split(C),
                 tp._v_split(eta), tp._m_split(J))
            xt, Rt = filter_scan_p(e, L=8, interpret=True)
            return sum(x.sum() for x in xt) + Rt[0][0].sum()

        g = float(jax.grad(loss)(jnp.float32(0.1)))
        eps = 1e-3
        fd = float((loss(jnp.float32(0.1 + eps))
                    - loss(jnp.float32(0.1 - eps))) / (2 * eps))
        assert np.isfinite(g) and abs(g - fd) < 2e-2 * (1 + abs(fd)), (g, fd)
