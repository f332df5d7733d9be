"""Reference-parity accessor surface.

The reference exports a flat function API over its mutable filter
objects (src/LowLevelParticleFilters.jl:3-10): ``state(f)``,
``covariance(f)``, ``num_particles(f)``, ``weights``/``expweights``/
``particles``, ``update!``/``predict!``/``correct!``/``reset!``,
``shouldresample``, ``sample_measurement``.  In the functional JAX
design those concepts live on immutable state pytrees and filter
methods; this module provides module-level functions with the
reference's names so a user migrating from the Julia package finds the
same verbs (minus the ``!`` — nothing mutates here: every "mutating"
verb returns the new state).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .filters.particle import PFState
from .ops.logsumexp import effective_particles


def state(obj):
    """Point estimate of a filter state (src/filtering.jl state accessor):
    the mean ``x`` for Gaussian states, the weighted particle mean for
    particle states."""
    if isinstance(obj, PFState):
        return jnp.einsum("n,nd->d", obj.we, obj.x)
    if hasattr(obj, "x"):
        return obj.x
    raise TypeError(f"no state accessor for {type(obj).__name__}")


def covariance(obj):
    """Covariance of a filter state (kalman.jl covariance accessor);
    weighted sample covariance for particle states."""
    if isinstance(obj, PFState):
        m = state(obj)
        d = obj.x - m
        return jnp.einsum("n,ni,nj->ij", obj.we, d, d)
    if hasattr(obj, "U"):  # square-root states store an upper Cholesky factor
        U = obj.U
        return U.T @ U
    if hasattr(obj, "R"):
        return obj.R
    raise TypeError(f"no covariance accessor for {type(obj).__name__}")


def index(s) -> jax.Array:
    """Current step counter of a filter state
    (src/LowLevelParticleFilters.jl:116 `index`)."""
    return s.t


def num_particles(pf_or_state) -> int:
    """`num_particles` (PFtypes.jl)."""
    if isinstance(pf_or_state, PFState):
        return pf_or_state.x.shape[0]
    return pf_or_state.N


def weights(s: PFState) -> jax.Array:
    """Normalized log-weights (PFtypes.jl `weights`)."""
    return s.w


def expweights(s: PFState) -> jax.Array:
    """Normalized linear weights (PFtypes.jl `expweights`)."""
    return s.we


def particles(s: PFState) -> jax.Array:
    """The particle array [N, nx] (PFtypes.jl `particles`)."""
    return s.x


def particletype(s: PFState):
    """Element type of the particles (PFtypes.jl `particletype`)."""
    return s.x.dtype


def shouldresample(we: jax.Array, threshold: float = 0.1) -> jax.Array:
    """Neff-based resampling trigger (resample.jl:5-10)."""
    N = we.shape[-1]
    return effective_particles(we) < threshold * N


def update(f, s, u, y, p=None, t=None, **kw):
    """One correct-then-predict step (filtering.jl:181-191), functional:
    returns ``(state, info)``.

    ``p``/``t`` are forwarded as keywords: filter signatures differ in the
    positions after ``y`` (AuxiliaryParticleFilter takes ``y1`` there), so
    positional forwarding would silently bind ``p``→``y1``."""
    return f.update(s, u, y, p=p, t=t, **kw)


def predict(f, s, u=None, p=None, t=None, **kw):
    """Time update (filtering.jl:52-74 / :140-153), functional.

    ``p``/``t`` forwarded as keywords (see `update`)."""
    return f.predict(s, u, p=p, t=t, **kw)


def correct(f, s, u, y, p=None, t=None, **kw):
    """Measurement update (filtering.jl:100-128 / :164-174), functional:
    returns ``(state, info)`` with the reference's ``(ll, e, S, Sᵪ, K)``.

    ``p``/``t`` forwarded as keywords (see `update`)."""
    return f.correct(s, u, y, p=p, t=t, **kw)


def reset(f, key=None):
    """Fresh initial state from ``d0`` (filtering.jl:4-14 `reset!`).
    Particle filters need a PRNG ``key``."""
    return f.init(key) if key is not None else f.init()


def sample_measurement(f, key, x, u=None, p=None, t=0, noise=True):
    """Draw y ~ p(y | x) from the filter's measurement model
    (src/filtering.jl sample_measurement)."""
    return f.sample_measurement(key, x, u, p, t, noise=noise)


def weigthed_mean(*args, **kwargs):
    """Deprecated typo alias kept by the reference
    (`@deprecate weigthed_mean weighted_mean`,
    src/LowLevelParticleFilters.jl:12) — forwards to ``weighted_mean``."""
    import warnings

    from .trajectory import weighted_mean

    warnings.warn("weigthed_mean is deprecated, use weighted_mean",
                  DeprecationWarning, stacklevel=2)
    return weighted_mean(*args, **kwargs)


def weigthed_cov(*args, **kwargs):
    """Deprecated typo alias kept by the reference
    (`@deprecate weigthed_cov weighted_cov`,
    src/LowLevelParticleFilters.jl:13) — forwards to ``weighted_cov``."""
    import warnings

    from .trajectory import weighted_cov

    warnings.warn("weigthed_cov is deprecated, use weighted_cov",
                  DeprecationWarning, stacklevel=2)
    return weighted_cov(*args, **kwargs)
