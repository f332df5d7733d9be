"""Filter protocol: pure `predict`/`correct`/`update` over immutable state.

The reference's uniform mutating API (`predict!`, `correct!`, `update!`,
`reset!`, `state`, `covariance`; /root/reference/src/filtering.jl and
src/LowLevelParticleFilters.jl:48-49) becomes a functional protocol:

    state           = f.init()                      # reset! analogue
    state, info     = f.correct(state, u, y, p, t)
    state           = f.predict(state, u, p, t)
    state, info     = f.update(state, u, y, p, t)

Filters are pytree dataclasses — their matrices are differentiable leaves
and a bank of filters is just a vmapped filter pytree.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp


class AbstractFilter:
    """Mixin with the shared update logic; concrete filters are @struct."""

    # -- protocol ---------------------------------------------------------
    def init(self, key=None):  # pragma: no cover - overridden
        raise NotImplementedError

    def predict(self, state, u=None, p=None, t=0, **kw):  # pragma: no cover
        raise NotImplementedError

    def correct(self, state, u, y, p=None, t=0, **kw):  # pragma: no cover
        raise NotImplementedError

    def update(self, state, u, y, p=None, t=0, **kw):
        """One correct-then-predict step (filtering.jl:181-185)."""
        state, info = self.correct(state, u, y, p, t, **kw)
        state = self.predict(state, u, p, t)
        return state, info

    def __call__(self, state, u, y, p=None, t=0, **kw):
        return self.update(state, u, y, p, t, **kw)

    # -- metadata ---------------------------------------------------------
    @property
    def dims(self) -> tuple[int, int, int]:
        return (self.nx, self.nu, self.ny)


class AbstractKalmanFilter(AbstractFilter):
    """Marker base for Kalman-family filters (Gaussian state posteriors).

    `state`/`covariance` mirror the reference's exported accessors
    (kalman.jl:111-112).  Note: these are *methods over the state pytree*;
    the UKF's `state_mean`/`state_cov` *fields* are the custom UT
    reduction hooks (different concept, reference kwargs of the same name).
    """

    def state(self, state):
        return state.x

    def covariance(self, state):
        return state.R


class AbstractParticleFilter(AbstractFilter):
    """Marker base for particle filters (weighted-sample posteriors)."""

    def state(self, state):
        return jnp.einsum("n,nd->d", state.we, state.x)
