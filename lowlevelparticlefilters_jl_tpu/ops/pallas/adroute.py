"""Autodiff routing for whole-scan Mosaic kernels.

``pallas_call`` has no autodiff rule, but the reference differentiates
through every filter (/root/reference/test/test_diff.jl:33-107), so each
fused kernel here carries a ``custom_jvp`` that re-routes through the
equivalent XLA scan under differentiation — the same treatment
``ops/pallas/assoc_scan.py`` gives its prefix-scan primitives, generalized
to kernels whose differentiable inputs include *closure-captured* values
(filter matrices, noise covariances, and parameters closed over by user
dynamics/measurement callbacks): ``jax.closure_convert`` hoists every
captured tracer of the XLA fallback into explicit custom_jvp arguments, so
their tangents flow instead of being silently dropped.

Semantics: outside differentiation the kernel runs and its value is
returned untouched.  Under jvp/grad/linearize — including ``grad(jit(f))``,
where the decision happens at jaxpr level, after tracing — BOTH the primal
and the tangent come from the XLA fallback.  For deterministic kernels
(UKF/EKF scans) the two primals agree to numerical precision; for the
stochastic PF kernel the XLA path redraws its noise with a threefry key
derived from the same seed, so under AD the returned value is a fresh
(statistically equivalent) likelihood estimate — the standard particle-
filter score, with resampling treated as piecewise-constant.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def f32_tree(tree):
    """Cast every inexact leaf to float32 — the fused kernels compute in
    f32 regardless of the x64 flag, and custom_jvp requires the XLA
    fallback's output dtypes to match the kernel's exactly."""
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.inexact) else x, tree)


def route_ad(kernel_fn, xla_fn, *args):
    """Evaluate ``kernel_fn(*args)`` with differentiation re-routed.

    ``kernel_fn`` and ``xla_fn`` must return the same output pytree
    structure for ``*args`` (the array inputs whose tangents the caller
    controls directly).  Both may close over further values; tracers
    captured by ``xla_fn`` are closure-converted into explicit arguments
    so the jvp sees their tangents.
    """
    converted, aux = jax.closure_convert(
        lambda *a: f32_tree(xla_fn(*a)), *args)
    n = len(args)

    @jax.custom_jvp
    def prim(*all_args):
        return kernel_fn(*all_args[:n])

    @prim.defjvp
    def _jvp(primals, tangents):
        return jax.jvp(converted, primals, tangents)

    return prim(*args, *aux)
