"""Fused pallas systematic-resample kernel (ops/pallas/resample_v2.py).

Off-TPU the kernel runs in interpret mode, so these tests verify the
exact semantics the hardware path ships with: bitwise equality against
the XLA formulation (same K slot boundaries) for benign, heavily
skewed, and near-degenerate weight profiles — the reference's
resampler-correctness tests (runtests.jl:108-143) cover distribution,
these cover the TPU kernel's exact-selection contract.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowlevelparticlefilters_jl_tpu.ops.resample import (
    resample_systematic,
    resample_systematic_gather,
)
from lowlevelparticlefilters_jl_tpu.ops.pallas.resample_v2 import (
    fused_systematic_gather,
)


@pytest.mark.parametrize(
    "N,seed,skew",
    [(2000, 0, 1.0), (1500, 2, 0.1), (2048, 3, 30.0)],
)
def test_kernel_bitwise_equals_xla(N, seed, skew):
    kw, kr, kx = jax.random.split(jax.random.PRNGKey(seed), 3)
    we = jnp.abs(jax.random.normal(kw, (N,))).astype(jnp.float32) ** skew + 1e-12
    we = we / jnp.sum(we)
    x = jax.random.normal(kx, (N, 3), jnp.float32)
    j_ref = resample_systematic(we, kr)
    out_ref = np.asarray(jnp.take(x, j_ref, axis=0))
    out, j = fused_systematic_gather(x, we, kr)
    np.testing.assert_array_equal(np.asarray(j), np.asarray(j_ref))
    np.testing.assert_array_equal(np.asarray(out), out_ref)


def test_kernel_degenerate_single_particle():
    """All weight on one particle -> N identical copies (the maximal
    window-spill case: one chunk's runs cover every output block)."""
    N = 2000
    we = jnp.zeros((N,)).at[777].set(1.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (N, 2), jnp.float32)
    out, j = fused_systematic_gather(x, we, jax.random.PRNGKey(2))
    assert int(jnp.sum(j == 777)) == N
    np.testing.assert_array_equal(
        np.asarray(out), np.tile(np.asarray(x[777]), (N, 1))
    )


def test_gather_wrapper_exactness():
    """The public wrapper stays bitwise equal to x[resample_systematic]
    regardless of which path it routes to."""
    N = 4096
    kw, kr, kx = jax.random.split(jax.random.PRNGKey(5), 3)
    we = jnp.abs(jax.random.normal(kw, (N,))) + 1e-9
    we = we / jnp.sum(we)
    x = jax.random.normal(kx, (N, 2), jnp.float32)
    ref = np.asarray(jnp.take(x, resample_systematic(we, kr), axis=0))
    np.testing.assert_array_equal(
        np.asarray(resample_systematic_gather(x, we, kr)), ref
    )


def test_kernel_wide_state_exact():
    """Wide particle states stay bitwise exact in the kernel itself
    (hardware-validated to nx=20) — though the admission gate routes
    nx > 4 to XLA because the kernel's per-dimension gather dots lose
    to the XLA row gather there (see `_kernel_fits`)."""
    N, nx = 1500, 20
    kw, kr, kx = jax.random.split(jax.random.PRNGKey(9), 3)
    we = jnp.abs(jax.random.normal(kw, (N,))) + 1e-9
    we = we / jnp.sum(we)
    x = jax.random.normal(kx, (N, nx), jnp.float32)
    ref = np.asarray(jnp.take(x, resample_systematic(we, kr), axis=0))
    out, j = fused_systematic_gather(x, we, kr)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_kernel_fits_admission_bounds():
    from lowlevelparticlefilters_jl_tpu.ops.resample import _kernel_fits

    # perf gate: kernel loses to XLA's row gather above nx ~ 5
    assert _kernel_fits(100_000, 2)
    assert _kernel_fits(100_000, 4)
    assert not _kernel_fits(100_000, 8)
    assert not _kernel_fits(32_768, 20)
    # VMEM gate: very large N exceeds the scoped budget even at nx=4
    assert not _kernel_fits(400_000, 4)
