"""Density protocol + a small library of noise distributions.

The reference supports arbitrary Distributions.jl densities for
particle-filter noise via an extension
(/root/reference/ext/LowLevelParticleFiltersDistributionsExt.jl), with
`TupleProduct` (:28-78) as the mixed discrete/continuous product
distribution used for e.g. quantized or outlier-robust noise models.

Here the protocol is structural — any object with ``logpdf(x)`` and
``sample(key, shape=())`` works as a noise/initial density (the built-in
Gaussian is ops/mvnormal.MvNormal).  This module adds the common non-
Gaussian building blocks as pytree dataclasses, all jit/vmap/grad-safe:

- scalar families: :class:`Normal`, :class:`Uniform`, :class:`Laplace`,
  :class:`StudentT` (heavy-tailed, the classic robust-PF choice),
  :class:`Binary` (discrete two-point, e.g. outage indicators),
- :class:`TupleProduct` — independent product of scalar densities across
  state dimensions (the TupleProduct analogue),
- :class:`MixtureNormal` — two-component Gaussian mixture (glint noise).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from ..utils.struct import struct, field, static_field

_LOG2PI = 1.8378770664093453


@struct
class Normal:
    """Scalar Gaussian N(mu, sigma^2)."""

    mu: jax.Array = field(default=0.0)
    sigma: jax.Array = field(default=1.0)

    def logpdf(self, x):
        z = (x - self.mu) / self.sigma
        return -0.5 * (z**2 + _LOG2PI) - jnp.log(self.sigma)

    def sample(self, key, shape=()):
        return self.mu + self.sigma * jax.random.normal(key, shape)

    @property
    def mean(self):
        return jnp.asarray(self.mu)


@struct
class Uniform:
    """Scalar uniform on [lo, hi]."""

    lo: jax.Array = field(default=0.0)
    hi: jax.Array = field(default=1.0)

    def logpdf(self, x):
        inside = (x >= self.lo) & (x <= self.hi)
        return jnp.where(inside, -jnp.log(self.hi - self.lo), -jnp.inf)

    def sample(self, key, shape=()):
        return jax.random.uniform(key, shape, minval=self.lo, maxval=self.hi)

    @property
    def mean(self):
        return 0.5 * (self.lo + self.hi)


@struct
class Laplace:
    """Scalar Laplace(mu, b) — robust heavy-ish tails."""

    mu: jax.Array = field(default=0.0)
    b: jax.Array = field(default=1.0)

    def logpdf(self, x):
        return -jnp.abs(x - self.mu) / self.b - jnp.log(2 * self.b)

    def sample(self, key, shape=()):
        return self.mu + self.b * jax.random.laplace(key, shape)

    @property
    def mean(self):
        return jnp.asarray(self.mu)


@struct
class StudentT:
    """Scalar Student-t with ``df`` degrees of freedom, location/scale."""

    df: jax.Array = field(default=3.0)
    mu: jax.Array = field(default=0.0)
    sigma: jax.Array = field(default=1.0)

    def logpdf(self, x):
        from jax.scipy.special import gammaln

        v = self.df
        z = (x - self.mu) / self.sigma
        return (
            gammaln((v + 1) / 2) - gammaln(v / 2)
            - 0.5 * jnp.log(v * jnp.pi) - jnp.log(self.sigma)
            - (v + 1) / 2 * jnp.log1p(z**2 / v)
        )

    def sample(self, key, shape=()):
        return self.mu + self.sigma * jax.random.t(key, self.df, shape)

    @property
    def mean(self):
        return jnp.asarray(self.mu)


@struct
class Binary:
    """Two-point discrete distribution: value ``a`` w.p. ``pa`` else ``b``
    (the mixed-discrete component TupleProduct exists for)."""

    a: jax.Array = field(default=0.0)
    b: jax.Array = field(default=1.0)
    pa: jax.Array = field(default=0.5)

    def logpdf(self, x):
        is_a = jnp.isclose(x, self.a)
        is_b = jnp.isclose(x, self.b)
        lp = jnp.where(is_a, jnp.log(self.pa), jnp.log1p(-self.pa))
        return jnp.where(is_a | is_b, lp, -jnp.inf)

    def sample(self, key, shape=()):
        take_a = jax.random.bernoulli(key, self.pa, shape)
        return jnp.where(take_a, self.a, self.b)

    @property
    def mean(self):
        return self.pa * self.a + (1 - self.pa) * self.b


@struct
class MixtureNormal:
    """Two-component scalar Gaussian mixture (glint/outlier noise)."""

    p1: jax.Array = field(default=0.9)
    mu1: jax.Array = field(default=0.0)
    sigma1: jax.Array = field(default=1.0)
    mu2: jax.Array = field(default=0.0)
    sigma2: jax.Array = field(default=10.0)

    def logpdf(self, x):
        l1 = Normal(self.mu1, self.sigma1).logpdf(x) + jnp.log(self.p1)
        l2 = Normal(self.mu2, self.sigma2).logpdf(x) + jnp.log1p(-self.p1)
        return jnp.logaddexp(l1, l2)

    def sample(self, key, shape=()):
        k1, k2, kc = jax.random.split(key, 3)
        c = jax.random.bernoulli(kc, self.p1, shape)
        return jnp.where(
            c,
            Normal(self.mu1, self.sigma1).sample(k1, shape),
            Normal(self.mu2, self.sigma2).sample(k2, shape),
        )

    @property
    def mean(self):
        return self.p1 * self.mu1 + (1 - self.p1) * self.mu2


@struct
class TupleProduct:
    """Independent product of scalar densities across vector components
    (DistributionsExt.jl:28-78): mixed discrete/continuous supported.

    ``logpdf(x)`` sums component log-densities over the last axis;
    ``sample`` draws each component with its own key.
    """

    dists: tuple = field()

    def __post_init__(self):
        object.__setattr__(self, "dists", tuple(self.dists))

    @property
    def dim(self) -> int:
        return len(self.dists)

    @property
    def mean(self):
        return jnp.stack([jnp.asarray(d.mean) for d in self.dists])

    def logpdf(self, x):
        x = jnp.asarray(x)
        return sum(
            d.logpdf(x[..., i]) for i, d in enumerate(self.dists)
        )

    def sample(self, key, shape=()):
        keys = jax.random.split(key, self.dim)
        return jnp.stack(
            [d.sample(k, shape) for d, k in zip(self.dists, keys)], axis=-1
        )
