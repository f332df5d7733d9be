"""Whole-scan bank KF kernel (ops/pallas/bank_scan.py) vs the plane /
vmap oracles, in interpret mode on CPU.

The kernel runs the sequential bank mean/ll recursion with the bank
resident in VMEM; every value must match `kf_bank_loglik`'s plane path
(itself pinned to vmap(loglik), filtering.jl:52-128 semantics) to f32
tolerance."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lowlevelparticlefilters_jl_tpu as llpf
from lowlevelparticlefilters_jl_tpu.filters import bank as bank_mod
from lowlevelparticlefilters_jl_tpu.filters.bank import (
    _bank_inputs, _bank_loglik_planes, _shared_recursion, kf_bank_loglik)
from lowlevelparticlefilters_jl_tpu.ops.pallas import bank_scan

A = jnp.array([[0.97, -0.1], [0.1, 0.97]], jnp.float32)
B = jnp.array([[0.1], [0.0]], jnp.float32)
C = jnp.array([[1.0, 0.0], [0.2, 1.0]], jnp.float32)
D = jnp.array([[0.05], [0.0]], jnp.float32)
R1 = 0.01 * jnp.eye(2, dtype=jnp.float32)
R2 = 0.1 * jnp.eye(2, dtype=jnp.float32)


def _kf(**kw):
    kw.setdefault("d0", llpf.MvNormal(jnp.array([0.1, -0.2], jnp.float32),
                                      0.5 * jnp.eye(2, dtype=jnp.float32)))
    return llpf.KalmanFilter(A, B, C, D, R1, R2, **kw)


def _data(Bk, T, key=0, nu=1, ny=2):
    ku, ky = jax.random.split(jax.random.PRNGKey(key))
    us = 0.3 * jax.random.normal(ku, (Bk, T, nu), jnp.float32)
    ys = jax.random.normal(ky, (Bk, T, ny), jnp.float32)
    return us, ys


def _kernel_ll(kf, us, ys):
    us, ys, Bk, T = _bank_inputs(kf, us, ys)
    dtype = ys.dtype
    _, Schol, K, _, Am, Bm, Cm, Dm = _shared_recursion(kf, T, dtype)
    return bank_scan.bank_loglik_kernel(kf, us, ys, Schol, K, Am, Bm,
                                        Cm, Dm)


def _plane_ll(kf, us, ys):
    us, ys, Bk, T = _bank_inputs(kf, us, ys)
    dtype = ys.dtype
    _, Schol, K, _, Am, Bm, Cm, Dm = _shared_recursion(kf, T, dtype)
    return _bank_loglik_planes(kf, us, ys, Bk, T, dtype, Schol, K, Am,
                               Bm, Cm, Dm)


@pytest.mark.parametrize("nu", [1, 0])
def test_kernel_matches_plane_path(nu):
    kf = _kf() if nu else llpf.KalmanFilter(
        A, None, C, None, R1, R2,
        d0=llpf.MvNormal(jnp.array([0.1, -0.2], jnp.float32),
                         0.5 * jnp.eye(2, dtype=jnp.float32)))
    us, ys = _data(5, 17, nu=nu)
    want = _plane_ll(kf, us if nu else None, ys)
    got = _kernel_ll(kf, us if nu else None, ys)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=1e-4)


def test_kernel_nonmultiple_bank_padding():
    # B = 9 pads to 1024 lanes; the padded lanes must not leak
    kf = _kf()
    us, ys = _data(9, 12, key=3)
    np.testing.assert_allclose(np.asarray(_kernel_ll(kf, us, ys)),
                               np.asarray(_plane_ll(kf, us, ys)),
                               rtol=2e-5, atol=1e-4)


def test_kernel_chunked_bank(monkeypatch):
    # zero the VMEM envelope: Bcap floors at 1024, so a 2048-member
    # bank splits into two independent kernel chunks
    kf = _kf()
    us, ys = _data(2048, 6, key=4)
    want = _plane_ll(kf, us, ys)
    monkeypatch.setattr(bank_scan, "_CHUNK_BYTES", 0)
    got = _kernel_ll(kf, us, ys)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=1e-4)


def test_kernel_long_segment_block_loop(monkeypatch):
    # T > _FULL_UNROLL: the 128-step block loop with a masked pad tail
    # (T=600 → Tpad=640); shrink the segment bound so the T-chunking
    # (state carried between segment calls) is exercised too
    monkeypatch.setattr(bank_scan, "_TSEG", 544)
    monkeypatch.setattr(bank_scan, "_FULL_UNROLL", 8)
    kf = _kf()
    us, ys = _data(3, 600, key=11)
    np.testing.assert_allclose(np.asarray(_kernel_ll(kf, us, ys)),
                               np.asarray(_plane_ll(kf, us, ys)),
                               rtol=2e-5, atol=2e-4)


def test_kernel_r12_alpha_general_recursion():
    kf = _kf(R12=jnp.array([[0.01, 0.0], [0.0, 0.005]], jnp.float32))
    us, ys = _data(4, 15, key=5)
    np.testing.assert_allclose(np.asarray(_kernel_ll(kf, us, ys)),
                               np.asarray(_plane_ll(kf, us, ys)),
                               rtol=2e-5, atol=1e-4)


def test_routed_on_fake_tpu(monkeypatch):
    # monkeypatched routing gate: kf_bank_loglik takes the kernel route
    # (interpret mode on CPU) and still matches the vmap oracle
    monkeypatch.setattr(bank_scan, "_route_on_tpu", lambda: True)
    monkeypatch.setattr(bank_scan, "bank_kernel_profitable",
                        lambda *a: True)
    calls = []
    real = bank_scan.bank_loglik_kernel
    monkeypatch.setattr(bank_scan, "bank_loglik_kernel",
                        lambda *a, **k: calls.append(1) or real(*a, **k))
    kf = _kf()
    us, ys = _data(6, 13, key=6)
    ll = kf_bank_loglik(kf, us, ys)
    assert calls, "kernel route not taken"
    want = jax.vmap(lambda u, y: llpf.loglik(kf, u, y))(us, ys)
    np.testing.assert_allclose(np.asarray(ll), np.asarray(want),
                               rtol=2e-5, atol=1e-4)


def test_routed_grad_reroutes_to_plane_path(monkeypatch):
    # under jvp/grad the custom_jvp must re-route BOTH primal and
    # tangent through the plane path — the kernel itself must not run
    monkeypatch.setattr(bank_scan, "_route_on_tpu", lambda: True)
    monkeypatch.setattr(bank_scan, "bank_kernel_profitable",
                        lambda *a: True)
    us, ys = _data(3, 9, key=7)

    def obj(r1s):
        kf = llpf.KalmanFilter(A, B, C, D, r1s * jnp.eye(2, dtype=jnp.float32),
                               R2, d0=llpf.MvNormal(
                                   jnp.zeros(2, jnp.float32),
                                   0.5 * jnp.eye(2, dtype=jnp.float32)))
        return kf_bank_loglik(kf, us, ys).sum()

    g = jax.grad(obj)(jnp.float32(0.01))
    eps = 1e-3
    fd = (obj(jnp.float32(0.01 + eps)) - obj(jnp.float32(0.01 - eps))) / (
        2 * eps)
    np.testing.assert_allclose(np.asarray(g), np.asarray(fd), rtol=2e-2)


def test_vmap_over_bank_falls_back(monkeypatch):
    # a BatchTracer anywhere in (kf, us, ys) must keep the kernel out
    us, ys = _data(3, 9, key=8)

    def one(r1s):
        kf = llpf.KalmanFilter(A, B, C, D, r1s * jnp.eye(2, dtype=jnp.float32),
                               R2, d0=llpf.MvNormal(
                                   jnp.zeros(2, jnp.float32),
                                   0.5 * jnp.eye(2, dtype=jnp.float32)))
        return kf_bank_loglik(kf, us, ys)

    # reference values BEFORE arming the route (plane path, no tracers)
    want = jnp.stack([one(jnp.float32(0.01)), one(jnp.float32(0.02))])

    monkeypatch.setattr(bank_scan, "_route_on_tpu", lambda: True)
    monkeypatch.setattr(bank_scan, "bank_kernel_profitable",
                        lambda *a: True)

    def boom(*a, **k):
        raise AssertionError("kernel must not run under vmap")

    monkeypatch.setattr(bank_scan, "bank_loglik_kernel", boom)
    lls = jax.vmap(one)(jnp.array([0.01, 0.02], jnp.float32))
    np.testing.assert_allclose(np.asarray(lls), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_supported_gate_bounds():
    f32 = jnp.float32
    assert bank_scan.bank_kernel_supported(200, 8192, 2, 2, 1, f32)
    assert not bank_scan.bank_kernel_supported(200, 8192, 5, 2, 1, f32)
    assert not bank_scan.bank_kernel_supported(200, 8192, 2, 2, 1,
                                               jnp.float64)
    assert not bank_scan.bank_kernel_supported(200_000, 8192, 2, 2, 1, f32)
    # small banks are runnable (method="kernel") but not auto-profitable
    assert bank_scan.bank_kernel_supported(200, 128, 2, 2, 1, f32)
    assert not bank_scan.bank_kernel_profitable(200, 128, 2, 2, 1, f32)
    assert bank_scan.bank_kernel_profitable(200, 8192, 2, 2, 1, f32)
