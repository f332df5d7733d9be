"""Hardware-PRNG noise kernel (ops/pallas/noise.py) shape contracts.

Moment quality on the real device is certified in bench.py
(cert_noise_moments); here we pin the SHAPE handling — in particular
the rank != 2 path (Mosaic's prng_random_bits is rank-2-only, so 1-D
and 3-D requests route through a padded (8k, 128) plane; a 1-D request
used to raise NotImplementedError on TPU, which bench certification
caught as a False moment check).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from lowlevelparticlefilters_jl_tpu.ops.pallas.noise import pallas_normal


@pytest.mark.parametrize("shape", [(17,), (1 << 12,), (3, 5, 7), (8, 128)])
def test_shapes_cpu_fallback(shape):
    z = pallas_normal(3, shape)
    assert z.shape == shape
    assert z.dtype == jnp.float32
    assert np.isfinite(np.asarray(z)).all()


@pytest.mark.parametrize("shape", [(17,), (3, 5, 7), (8, 128)])
def test_shapes_interpret_kernel(shape):
    """force_kernel routes through the pallas lowering (interpret mode
    stubs the PRNG to zero bits — shape handling is what's under test)."""
    z = pallas_normal(3, shape, force_kernel=True)
    assert z.shape == shape
    assert np.isfinite(np.asarray(z)).all()


def test_cos_sin_2pi_accuracy():
    """The polynomial cos/sin pair (quadrant fold + cephes minimax) must
    match jnp.cos/sin(2πu) to f32 polynomial accuracy over a dense grid
    incl. the quadrant boundaries — Box-Muller Gaussian quality (and the
    hardware moment cert) rides on this."""
    from lowlevelparticlefilters_jl_tpu.ops.pallas.noise import _cos_sin_2pi

    u = jnp.concatenate([
        jnp.linspace(0.0, 1.0, 100_001, dtype=jnp.float32)[:-1],
        jnp.asarray([0.0, 0.125, 0.25 - 1e-7, 0.25, 0.375, 0.5,
                     0.625, 0.75, 0.875, 1.0 - 1e-7], jnp.float32)])
    cv, sv = _cos_sin_2pi(u)
    tw = 2.0 * np.pi * np.asarray(u, np.float64)
    np.testing.assert_allclose(np.asarray(cv), np.cos(tw), atol=5e-7)
    np.testing.assert_allclose(np.asarray(sv), np.sin(tw), atol=5e-7)
    # exact unit circle to f32 tolerance
    np.testing.assert_allclose(np.asarray(cv) ** 2 + np.asarray(sv) ** 2,
                               1.0, atol=1e-6)
