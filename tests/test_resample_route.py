"""Monotone-routing resample kernel (ops/pallas/resample_route.py).

Off-TPU the kernel runs in interpret mode, so these tests pin the exact
semantics the hardware ships: bitwise equality of the routed gather
against ``x[resample_systematic(we)]`` (same K slot boundaries), across
benign, heavily skewed, and fully degenerate weight profiles — the
profiles that exercise all three routing phases (compaction distance,
run-start spread, forward-fill run lengths).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowlevelparticlefilters_jl_tpu.ops.resample import resample_systematic
from lowlevelparticlefilters_jl_tpu.ops.pallas.resample_route import (
    fused_systematic_gather_route, route_kernel_fits)


def _oracle(x, we, key):
    return np.asarray(jnp.take(x, resample_systematic(we, key), axis=0))


@pytest.mark.parametrize(
    "N,nx,seed,skew",
    [(2000, 2, 0, 1.0), (1500, 3, 1, 0.1), (2048, 1, 2, 30.0),
     (777, 4, 3, 8.0), (4096, 2, 4, 1.0)],
)
def test_route_bitwise_equals_xla(N, nx, seed, skew):
    kw, kr, kx = jax.random.split(jax.random.PRNGKey(seed), 3)
    we = jnp.abs(jax.random.normal(kw, (N,))).astype(jnp.float32) ** skew + 1e-12
    we = we / jnp.sum(we)
    x = jax.random.normal(kx, (N, nx), jnp.float32)
    got = np.asarray(fused_systematic_gather_route(x, we, kr))
    np.testing.assert_array_equal(got, _oracle(x, we, kr))


def test_route_degenerate_single_particle():
    """All weight on one particle -> N identical copies: one survivor,
    maximal compaction displacement, one forward-fill run of length N."""
    N = 2000
    we = jnp.zeros((N,)).at[777].set(1.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (N, 2), jnp.float32)
    out = np.asarray(
        fused_systematic_gather_route(x, we, jax.random.PRNGKey(2)))
    np.testing.assert_array_equal(out, np.tile(np.asarray(x[777]), (N, 1)))


def test_route_half_dead():
    """Zero-weight particles interleaved with survivors (compaction with
    gaps at every distance scale)."""
    N = 3000
    kw, kr, kx = jax.random.split(jax.random.PRNGKey(9), 3)
    we = jnp.abs(jax.random.normal(kw, (N,)))
    we = jnp.where(jax.random.uniform(jax.random.PRNGKey(5), (N,)) < 0.5,
                   0.0, we)
    we = we / jnp.sum(we)
    x = jax.random.normal(kx, (N, 2), jnp.float32)
    got = np.asarray(fused_systematic_gather_route(x, we, kr))
    np.testing.assert_array_equal(got, _oracle(x, we, kr))


def test_route_wide_state_exact():
    """Routing cost is linear in nx (plane copies) — no nx admission
    cliff like the windowed-MXU kernel's 9-dots-per-dim."""
    N, nx = 1200, 12
    kw, kr, kx = jax.random.split(jax.random.PRNGKey(11), 3)
    we = jnp.abs(jax.random.normal(kw, (N,))) + 1e-9
    we = we / jnp.sum(we)
    x = jax.random.normal(kx, (N, nx), jnp.float32)
    got = np.asarray(fused_systematic_gather_route(x, we, kr))
    np.testing.assert_array_equal(got, _oracle(x, we, kr))


def test_route_admission():
    assert route_kernel_fits(100_000, 2)
    assert route_kernel_fits(100_000, 8)
    assert route_kernel_fits(262_144, 2)
    assert route_kernel_fits(1_000_000, 2)  # the SURVEY §5 regime
    assert not route_kernel_fits(1_000_000, 20)
