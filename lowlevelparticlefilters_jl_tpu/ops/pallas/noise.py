"""Pallas TPU kernels: hardware-PRNG Gaussian noise + fused particle
propagation.

The particle filter's time update draws N·nx Gaussians per step
(/root/reference/src/PFtypes.jl:122-139 draws them per particle with a
stored RNG).  JAX's default threefry bits are computed on the VPU; the TPU
has a *hardware* PRNG exposed through `pltpu.prng_random_bits` which is
substantially cheaper.  These kernels:

- :func:`pallas_normal` — standard normals via hardware bits + Box-Muller,
- :func:`propagate_gaussian` — one fused VMEM pass doing
  ``dyn_batched(x) + z @ cholᵀ`` with in-kernel noise generation, so the
  propagated particles never round-trip through HBM between the dynamics
  evaluation and the noise add.

Both fall back to `interpret=True` off-TPU (semantics validated in the
test suite on CPU; performance only matters on device).  Counter-based
determinism: the caller supplies an int32 seed, typically derived from a
JAX key via `jax.random.randint` or a step counter.
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TWO_PI = 6.283185307179586


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _cos_sin_2pi(u):
    """``(cos(2πu), sin(2πu))`` for u in [0, 1) — quadrant folding + the
    cephes sinf/cosf minimax polynomials on [-π/4, π/4].

    Mosaic lowers ``jnp.cos``/``jnp.sin`` to ~2.5 µs per [8, 12544]
    plane EACH (measured on v5e — ~10× the cost of exp/log, ~25× an
    add); this evaluates the pair in ~35 cheap VPU ops (~1 µs), with
    max abs error ~1e-7 — far below anything Box-Muller Gaussian
    quality can resolve (the moment certification in bench.py covers
    it on hardware).  No range reduction beyond the quadrant fold is
    needed because u is already one period."""
    t = 4.0 * u                          # angle in quadrant units [0, 4)
    q = jnp.floor(t + 0.5)               # nearest quadrant 0..4
    r = (t - q) * 1.5707963267948966     # residual angle in [-π/4, π/4]
    r2 = r * r
    s = r * (1.0 + r2 * (-1.6666654611e-1 + r2 * (
        8.3321608736e-3 + r2 * (-1.9515295891e-4))))
    c = 1.0 + r2 * (-0.5 + r2 * (4.166664568298827e-2 + r2 * (
        -1.388731625493765e-3 + r2 * 2.443315711809948e-5)))
    qi = q.astype(jnp.int32) & 3
    # rotate (c, s) by q·90°: q=0:(c,s) 1:(-s,c) 2:(-c,-s) 3:(s,-c)
    swap = (qi & 1) == 1
    cv = jnp.where(swap, s, c)
    sv = jnp.where(swap, c, s)
    cneg = (qi == 1) | (qi == 2)
    sneg = qi >= 2
    return jnp.where(cneg, -cv, cv), jnp.where(sneg, -sv, sv)


def _normal_kernel(seed_ref, out_ref):
    pltpu.prng_seed(seed_ref[0])
    shape = out_ref.shape
    # Box-Muller from two uint32 draws; u1 in (0,1], u2 in [0,1).
    b1 = pltpu.prng_random_bits(shape)
    b2 = pltpu.prng_random_bits(shape)
    u1 = (b1.astype(jnp.float32) + 2147483648.0 + 1.0) / 4294967297.0
    u2 = (b2.astype(jnp.float32) + 2147483648.0) / 4294967296.0
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    out_ref[:] = r * _cos_sin_2pi(u2)[0]


def pallas_normal(seed, shape, force_kernel: bool = False) -> jax.Array:
    """Standard-normal array from the TPU hardware PRNG (f32).

    ``seed``: int32 scalar array; same seed → same bits (counter-based).
    Off-TPU this falls back to threefry (`jax.random.normal`) — the
    interpret-mode hardware PRNG is stubbed to zeros, so only the real
    device exercises the kernel (``force_kernel=True`` runs it in
    interpret mode anyway, for lowering tests).
    """
    if not _on_tpu() and not force_kernel:
        key = jax.random.PRNGKey(jnp.asarray(seed, jnp.uint32))
        return jax.random.normal(key, shape, jnp.float32)
    seed = jnp.asarray(seed, jnp.int32).reshape(1)
    shape = tuple(shape)
    if len(shape) != 2:
        # Mosaic's prng_random_bits requires rank-2: generate a padded
        # (8k, 128) plane and carve the requested shape out of it.
        n = 1
        for s in shape:
            n *= s
        rows = -(-n // 128)          # ceil(n / 128) lanes
        rows = -(-rows // 8) * 8     # sublane-aligned
        flat = pallas_normal(seed, (rows, 128), force_kernel=force_kernel)
        return flat.reshape(-1)[:n].reshape(shape)
    # ~4 live full-shape planes (bits x2, u's, polynomial temps) on top
    # of the output: the default 16M scoped-vmem limit OOMs past ~2^20
    # draws (measured 47M needed at 2^22)
    out_bytes = shape[0] * shape[1] * 4
    return pl.pallas_call(
        _normal_kernel,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(120 << 20, max(32 << 20, 6 * out_bytes))),
        interpret=pltpu.InterpretParams() if not _on_tpu() else False,
    )(seed)


def propagate_gaussian(
    dyn_batched: Callable,
    x: jax.Array,
    chol_R1: jax.Array,
    seed,
    force_kernel: bool = False,
) -> jax.Array:
    """Fused ``dyn_batched(x) + N(0, R1)`` in one VMEM pass.

    - ``dyn_batched``: vectorized dynamics ``[N, nx] -> [N, nx]`` built
      from pure jnp ops (traced into the kernel),
    - ``chol_R1``: lower Cholesky factor of the process noise,
    - ``seed``: int32 scalar (vary per step, e.g. fold in the time index).

    Off-TPU (``force_kernel=False``) the same math runs as plain XLA with
    threefry noise, so CPU tests validate the fused semantics.
    """
    N, nx = x.shape
    if not _on_tpu() and not force_kernel:
        xn = dyn_batched(jnp.asarray(x, jnp.float32))
        key = jax.random.PRNGKey(jnp.asarray(seed, jnp.uint32))
        z = jax.random.normal(key, (N, nx), jnp.float32)
        return xn + z @ jnp.asarray(chol_R1, jnp.float32).T
    seed = jnp.asarray(seed, jnp.int32).reshape(1)
    chol = jnp.asarray(chol_R1, jnp.float32)
    x = jnp.asarray(x, jnp.float32)
    # Pallas kernels may not capture array values — hoist both closed-over
    # *tracers* (closure_convert; e.g. u/t inside a scan body) and literal
    # array constants (jaxpr consts; e.g. a system matrix) into inputs.
    dyn_cc, tracer_consts = jax.closure_convert(dyn_batched, x)
    closed = jax.make_jaxpr(dyn_cc)(x, *tracer_consts)
    lit_consts = [jnp.asarray(c) for c in closed.consts]
    consts = [*lit_consts, *tracer_consts]
    n_lit = len(lit_consts)

    def dyn_flat(xx, *cs):
        (out,) = jax.core.eval_jaxpr(closed.jaxpr, cs[:n_lit], xx, *cs[n_lit:])
        return out

    # Block over the particle axis so VMEM holds one tile at a time
    # (a monolithic N=1e5 block spills registers and exceeds VMEM).
    # Pick the largest divisor of N up to 8192 that satisfies the Mosaic
    # sublane constraint (divisible by 8); fall back to the whole array.
    # The user dynamics must be rowwise (per-particle), which the PF
    # contract already guarantees.
    BLK = next(
        (b for b in range(min(N, 8192) // 8 * 8, 0, -8) if N % b == 0), N
    )
    grid = (N // BLK,)

    def kernel(seed_ref, x_ref, chol_ref, *rest):
        *const_refs, out_ref = rest
        # Per-block stream via a second independent seed word — NOT
        # seed+program_id, which would collide whenever two steps' seeds
        # differ by less than the block count (identical noise blocks
        # silently correlated across time).
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
        xn = dyn_flat(x_ref[:], *[c[:] for c in const_refs])
        b1 = pltpu.prng_random_bits((BLK, nx))
        b2 = pltpu.prng_random_bits((BLK, nx))
        u1 = (b1.astype(jnp.float32) + 2147483648.0 + 1.0) / 4294967297.0
        u2 = (b2.astype(jnp.float32) + 2147483648.0) / 4294967296.0
        z = jnp.sqrt(-2.0 * jnp.log(u1)) * _cos_sin_2pi(u2)[0]
        out_ref[:] = xn + jnp.dot(
            z, chol_ref[:].T, preferred_element_type=jnp.float32
        )

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, nx), jnp.float32),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec((BLK, nx), lambda i: (i, 0), memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((nx, nx), lambda i: (0, 0), memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(c.shape, (lambda i, _c=c: tuple(0 for _ in _c.shape)),
                        memory_space=pltpu.VMEM) for c in consts],
        out_specs=pl.BlockSpec((BLK, nx), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=pltpu.InterpretParams() if not _on_tpu() else False,
    )(seed, x, chol, *consts)
