"""Pallas TPU kernel: the temporal-parallel KF/RTS associative scans in
ONE pass over HBM.

`jax.lax.associative_scan` materializes every level of the Brent–Kung
tree: at T=2e5/nx=2 the XLA filter scan costs ~0.24 µs/element (T-slope)
against an analytic traffic floor of ~0.4 ns/element — each of the
~17 levels re-slices and re-concatenates all 2nx²+3nx element leaves
through HBM.  This kernel streams the element planes through VMEM once:

- layout: elements as [E, NB, 8, L] f32 planes (E = one plane per matrix
  entry, time split block → sublane → lane), the lane-major form the
  XLA path already uses (parallel/temporal.py SoA combines);
- per block: Hillis–Steele inclusive scan along the lane axis (log2 L
  full-occupancy VPU passes of `pltpu.roll` + iota mask + combine),
  then a 3-pass sublane-carry sweep on the [8, 1] row tails, then a
  cross-block carry kept in VMEM scratch across the sequential grid;
- the combine arithmetic IS `parallel.temporal._filter_combine_soa` /
  `_smooth_combine_soa` evaluated on [8, L] planes — the kernel and the
  XLA fallback share one source of truth for the math (Särkkä &
  García-Fernández temporal-parallelization elements, arXiv:1905.13002;
  sequential reference: /root/reference/src/filtering.jl:293-315,
  src/smoothing.jl:8-45).

The left identity of both combines is (I, 0, ...): masked-in lanes and
the t=0 carry use it, so no edge `where` is needed after a combine.

Reverse (smoother) scans reduce to this forward kernel:
`associative_scan(g, x, reverse=True)` equals
`flip(forward_scan(g, flip(x)))` with the SAME operator g (prefix-so-far
as g's first argument in both) — the wrapper flips the time axis on the
way in and out and keeps the swapped-argument combine
`g(a, b) = _smooth_combine(b, a)`.

Supported: f32, nx ≤ 8 (E ≤ 208 planes; lane width L adapts to nx so
the VMEM high-water ≈ 4 live copies of [E, 8, L] stays bounded).
Off-TPU and beyond the gate, callers keep the XLA associative_scan
path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .noise import _on_tpu

# default lane width of a time block: BT = 8 * L elements per grid step;
# log2(L) + 1 full-plane combine passes per block
_L = 512


def _lane_width(nx: int) -> int:
    """Block lane width by state dimension: E grows as 3nx²+2nx and the
    combine unroll as ~nx³, so wider states take narrower blocks to keep
    the VMEM high-water (~4 live copies of [E, 8, L]) and the Mosaic
    program size bounded (VMEM ≈ 16 MB/core)."""
    return 512 if nx <= 4 else 128


def _struct_filter(nx):
    """Element structure descriptors: ('m', n, n) | ('v', n), with the
    per-plane identity scalar (A/E diagonal 1, everything else 0)."""
    return (("m", nx), ("v", nx), ("m", nx), ("v", nx), ("m", nx))


def _struct_smooth(nx):
    return (("m", nx), ("v", nx), ("m", nx))


def _identity_scalars(struct):
    ident = []
    first = True
    for kind, n in struct:
        if kind == "m":
            ident.extend(
                1.0 if (first and i == j) else 0.0
                for i in range(n) for j in range(n))
            first = False
        else:
            ident.extend(0.0 for _ in range(n))
    return ident


def _nplanes(struct):
    return sum(n * n if kind == "m" else n for kind, n in struct)


def _unflatten(flat, struct):
    """flat list of planes -> tuple of tuple-of-tuples / tuples matching
    parallel.temporal's SoA combine signature."""
    out, k = [], 0
    for kind, n in struct:
        if kind == "m":
            out.append(tuple(tuple(flat[k + i * n + j] for j in range(n))
                             for i in range(n)))
            k += n * n
        else:
            out.append(tuple(flat[k + i] for i in range(n)))
            k += n
    return tuple(out)


def _flatten(e):
    flat = []
    for part in e:
        if isinstance(part[0], tuple):
            for row in part:
                flat.extend(row)
        else:
            flat.extend(part)
    return flat


def _make_kernel(combine, struct, E, L, out_idx):
    ident = _identity_scalars(struct)

    def comb_planes(left, right):
        return _flatten(combine(_unflatten(left, struct),
                                _unflatten(right, struct)))

    def kernel(in_ref, out_ref, carry_ref):
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _init():
            for e in range(E):
                carry_ref[e] = jnp.full((8, 128), ident[e], jnp.float32)

        xs = [in_ref[e, 0] for e in range(E)]           # [8, L] each
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, L), 1)
        s = 1
        while s < L:                                    # lane Hillis sweep
            sh = [jnp.where(lane >= s, pltpu.roll(x, s, axis=1), iv)
                  for x, iv in zip(xs, ident)]
            xs = comb_planes(sh, xs)
            s *= 2
        # sublane carry sweep on the row tails [8, 1]
        sub = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
        cs = [x[:, L - 1:L] for x in xs]
        for s in (1, 2, 4):
            sh = [jnp.where(sub >= s, pltpu.roll(c, s, axis=0), iv)
                  for c, iv in zip(cs, ident)]
            cs = comb_planes(sh, cs)
        # exclusive row prefix: inclusive shifted down one row
        ex = [jnp.where(sub >= 1, pltpu.roll(c, 1, axis=0), iv)
              for c, iv in zip(cs, ident)]
        # fold the cross-block carry into the row prefixes ([8, 1] work)
        carry = [carry_ref[e][:, 0:1] for e in range(E)]
        ex = comb_planes(carry, ex)
        # next block's carry: prior carry ⊗ whole-block product (row 7
        # of the inclusive sublane sweep)
        tail = comb_planes(carry, [c[7:8, :] for c in cs])
        for e in range(E):
            carry_ref[e] = jnp.broadcast_to(tail[e], (8, 128))
        # apply row+block prefixes across all lanes (one full combine)
        exb = [jnp.broadcast_to(c, (8, L)) for c in ex]
        xs = comb_planes(exb, xs)
        for k, e in enumerate(out_idx):
            out_ref[k, 0] = xs[e]

    return kernel


def _plane_scan(planes, combine, struct, out_idx, L=_L, interpret=None):
    """Inclusive associative scan of [E, T] element planes; returns the
    selected output planes [len(out_idx), T]."""
    E, T = planes.shape
    ident = jnp.asarray(_identity_scalars(struct), jnp.float32)[:, None]
    BT = 8 * L
    NB = -(-T // BT)
    pad = NB * BT - T
    if pad:
        planes = jnp.concatenate(
            [planes, jnp.broadcast_to(ident, (E, pad))], axis=1)
    x = planes.reshape(E, NB, 8, L)
    kern = _make_kernel(combine, struct, E, L, tuple(out_idx))
    if interpret is None:
        interpret = not _on_tpu()
    out = pl.pallas_call(
        kern,
        grid=(NB,),
        in_specs=[pl.BlockSpec((E, 1, 8, L), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((len(out_idx), 1, 8, L),
                               lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((len(out_idx), NB, 8, L),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((E, 8, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(x)
    return out.reshape(len(out_idx), NB * BT)[:, :T]


def scan_supported(nx, dtype) -> bool:
    """Production admission: on-TPU, f32 elements, nx ≤ 8 (E ≤ 208
    planes at the nx-adapted lane width; the XLA SoA path covers the
    rest)."""
    return _on_tpu() and dtype == jnp.float32 and nx <= 8


@functools.partial(jax.custom_jvp, nondiff_argnums=(1, 2))
def _filter_scan_p_prim(elems_p, L, interpret):
    from ...parallel.temporal import _filter_combine_soa

    nx = len(elems_p[1])
    if L is None:
        L = _lane_width(nx)
    planes = jnp.stack(_flatten(elems_p)).astype(jnp.float32)
    struct = _struct_filter(nx)
    # outputs: b planes (nx) then C planes (nx*nx)
    off_b = nx * nx
    off_C = off_b + nx
    out_idx = list(range(off_b, off_b + nx)) + list(
        range(off_C, off_C + nx * nx))
    out = _plane_scan(planes, _filter_combine_soa, struct, out_idx,
                      L=L, interpret=interpret)
    xt = tuple(out[i] for i in range(nx))
    Rt = tuple(tuple(out[nx + i * nx + j] for j in range(nx))
               for i in range(nx))
    return xt, Rt


@_filter_scan_p_prim.defjvp
def _filter_scan_p_jvp(L, interpret, primals, tangents):
    """`pallas_call` has no autodiff rule; under differentiation the
    scan falls back to the XLA entrywise-pytree associative_scan (same
    combine source, machine-precision-equivalent primal)."""
    from ...parallel.temporal import _filter_combine_soa

    def xla(e):
        out = jax.lax.associative_scan(_filter_combine_soa, e)
        return out[1], out[2]

    return jax.jvp(xla, primals, tangents)


def filter_scan_p(elems_p, *, L=None, interpret=None):
    """Plane-level API: elements as the tuple-of-[T]-plane structures of
    parallel/temporal.py (A, b, C, η, J); returns the filtered moments
    as planes ``(xt: tuple[nx], Rt: tuple-of-tuples[nx][nx])``.
    Differentiable: under jvp/grad the fused kernel is swapped for the
    XLA associative_scan (custom_jvp above)."""
    return _filter_scan_p_prim(elems_p, L, interpret)


@functools.partial(jax.custom_jvp, nondiff_argnums=(1, 2))
def _smooth_scan_p_prim(elems_p, L, interpret):
    from ...parallel.temporal import _smooth_combine_soa

    nx = len(elems_p[1])
    if L is None:
        L = _lane_width(nx)
    planes = jnp.stack(_flatten(elems_p)).astype(jnp.float32)
    planes = planes[:, ::-1]
    struct = _struct_smooth(nx)
    off_g = nx * nx
    off_L = off_g + nx
    out_idx = list(range(off_g, off_g + nx)) + list(
        range(off_L, off_L + nx * nx))
    out = _plane_scan(planes,
                      lambda a, b: _smooth_combine_soa(b, a), struct,
                      out_idx, L=L, interpret=interpret)
    out = out[:, ::-1]
    xT = tuple(out[i] for i in range(nx))
    RT = tuple(tuple(out[nx + i * nx + j] for j in range(nx))
               for i in range(nx))
    return xT, RT


@_smooth_scan_p_prim.defjvp
def _smooth_scan_p_jvp(L, interpret, primals, tangents):
    from ...parallel.temporal import _smooth_combine_soa

    def xla(e):
        out = jax.lax.associative_scan(
            lambda a, b: _smooth_combine_soa(b, a), e, reverse=True)
        return out[1], out[2]

    return jax.jvp(xla, primals, tangents)


def smooth_scan_p(elems_p, *, L=None, interpret=None):
    """Plane-level reverse scan of RTS smoothing elements (E, g, L):
    returns smoothed-moment planes ``(xT, RT)``.  Equals
    ``associative_scan(lambda a, b: _smooth_combine(b, a), reverse=True)``
    via the flip identity in the module docstring.  Differentiable via
    the XLA-fallback custom_jvp."""
    return _smooth_scan_p_prim(elems_p, L, interpret)


def _split_mat(M):
    T, n, m = M.shape
    return tuple(tuple(M[:, i, j] for j in range(m)) for i in range(n))


def filter_scan(A, b, C, eta, J, *, L=None, interpret=None):
    """Array-level wrapper of :func:`filter_scan_p`: [T, ...] element
    stacks in, filtered moments ``(xt [T, nx], Rt [T, nx, nx])`` out."""
    T, nx = b.shape
    xt, Rt = filter_scan_p(
        (_split_mat(A), tuple(b[:, i] for i in range(nx)), _split_mat(C),
         tuple(eta[:, i] for i in range(nx)), _split_mat(J)),
        L=L, interpret=interpret)
    return (jnp.stack(list(xt), axis=-1),
            jnp.stack([jnp.stack(list(r), axis=-1) for r in Rt], axis=-2))


def filter_scan_full(A, b, C, eta, J, *, L=None, interpret=None):
    """Inclusive filter prefix scan returning ALL FIVE combined element
    stacks ``(A, b, C, eta, J) [T, ...]`` — the local level of the
    time-axis-sharded composition (parallel/sharded.py::
    sharded_filter_scan needs full elements to fold the cross-device
    carry, not just the filtered moments).  On TPU the fused Mosaic
    plane kernel; otherwise (or under differentiation, via route_ad)
    the XLA associative_scan with the same combine source."""
    from ...parallel.temporal import _filter_combine, _filter_combine_soa
    from .adroute import route_ad

    T, nx = b.shape

    def xla_fn(A, b, C, eta, J):
        return jax.lax.associative_scan(_filter_combine, (A, b, C, eta, J))

    if not scan_supported(nx, jnp.result_type(b.dtype, jnp.float32)) \
            and interpret is None:
        return xla_fn(A, b, C, eta, J)

    def kernel_fn(A, b, C, eta, J):
        elems_p = (_split_mat(A), tuple(b[:, i] for i in range(nx)),
                   _split_mat(C), tuple(eta[:, i] for i in range(nx)),
                   _split_mat(J))
        planes = jnp.stack(_flatten(elems_p)).astype(jnp.float32)
        struct = _struct_filter(nx)
        E = planes.shape[0]
        Lw = _lane_width(nx) if L is None else L
        out = _plane_scan(planes, _filter_combine_soa, struct,
                          list(range(E)), L=Lw, interpret=interpret)

        def mat(off):
            return jnp.stack(
                [jnp.stack([out[off + i * nx + j] for j in range(nx)], -1)
                 for i in range(nx)], -2)

        o_b = nx * nx
        o_C = o_b + nx
        o_eta = o_C + nx * nx
        o_J = o_eta + nx
        return (mat(0),
                jnp.stack([out[o_b + i] for i in range(nx)], -1),
                mat(o_C),
                jnp.stack([out[o_eta + i] for i in range(nx)], -1),
                mat(o_J))

    return route_ad(kernel_fn, xla_fn,
                    jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32),
                    jnp.asarray(C, jnp.float32),
                    jnp.asarray(eta, jnp.float32),
                    jnp.asarray(J, jnp.float32))


def smooth_scan(E, g, L_, *, L=None, interpret=None):
    """Array-level wrapper of :func:`smooth_scan_p`."""
    T, nx = g.shape
    xT, RT = smooth_scan_p(
        (_split_mat(E), tuple(g[:, i] for i in range(nx)),
         _split_mat(L_)), L=L, interpret=interpret)
    return (jnp.stack(list(xT), axis=-1),
            jnp.stack([jnp.stack(list(r), axis=-1) for r in RT], axis=-2))
