"""Distributed-grid primitives: halo exchange, global reductions, gathers.

The multi-chip component the reference does not have (it is single-device;
SURVEY §2.14).  Design: the domain is decomposed over a `jax.sharding.Mesh`
with mesh axes ('x','y','z') mapped onto the leading spatial dims.  Each shard
holds its local block in the *same ghost-padded layout* as a single-device
field (local interior N_d/k_d + one ghost layer per side), so every stencil op
in this package runs unchanged per shard; only the ghost *contents* change —
filled by ring `ppermute` halo exchanges instead of (or in addition to) the
physical boundary conditions.  Periodic directions need no special case at
all: the ring wraps.

All functions take a `DistCtx` built inside `shard_map`; `ctx=None` (or a
mesh extent of 1 in a dim) degenerates to the single-device semantics exactly.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .grid import slab, set_slab

__all__ = ["DistCtx", "make_ctx", "edge_lo", "edge_hi", "offsets",
           "fetch_lo", "fetch_hi", "sync_scalar", "sync_vector",
           "psum_all", "pmax_all", "global_inside_count", "gather_scalar",
           "slice_local", "parity_shift"]


class DistCtx(NamedTuple):
    axes: tuple          # static: mesh axis name per spatial dim (None = unsharded)
    sizes: tuple         # static: mesh extent per spatial dim
    n_loc: tuple         # static: local interior size per spatial dim
    coords: tuple        # traced: this shard's index along each dim (0 if unsharded)


def make_ctx(axes: tuple, sizes: tuple, local_shape: tuple) -> DistCtx:
    """Build the ctx inside a `shard_map` region.  ``local_shape`` is the
    local *padded* shape."""
    coords = tuple(jax.lax.axis_index(ax) if ax is not None else 0
                   for ax in axes)
    n_loc = tuple(n - 2 for n in local_shape)
    return DistCtx(tuple(axes), tuple(sizes), n_loc, coords)


def sharded(ctx: Optional[DistCtx], d: int) -> bool:
    return ctx is not None and ctx.sizes[d] > 1


def edge_lo(ctx: DistCtx, d: int):
    """True on shards owning the low physical boundary of dim d."""
    if not sharded(ctx, d):
        return True
    return ctx.coords[d] == 0


def edge_hi(ctx: DistCtx, d: int):
    """True on shards owning the high physical boundary of dim d."""
    if not sharded(ctx, d):
        return True
    return ctx.coords[d] == ctx.sizes[d] - 1


def offsets(ctx: Optional[DistCtx], shape: tuple[int, ...]):
    """Global interior index offset of this shard's cell 0, per dim (traced),
    for a field of local padded ``shape`` (levels differ from the finest)."""
    D = len(shape)
    if ctx is None:
        return (0,) * D
    return tuple(ctx.coords[d] * (shape[d] - 2) for d in range(D))


def parity_shift(ctx: Optional[DistCtx], shape: tuple[int, ...]):
    """(sum of global offsets) mod 2 — corrects the red-black checkerboard
    color across shard boundaries."""
    if ctx is None:
        return 0
    s = 0
    for d in range(len(shape)):
        s = s + ctx.coords[d] * (shape[d] - 2)
    return s % 2


def _perm_from_left(k: int):
    return [(i, (i + 1) % k) for i in range(k)]


def _perm_from_right(k: int):
    return [(i, (i - 1) % k) for i in range(k)]


def fetch_lo(ctx: DistCtx, a: jax.Array, axis: int, d: int, idx: int) -> jax.Array:
    """Slab ``idx`` of the LEFT (lower-coordinate) ring neighbor along spatial
    dim ``d`` (``axis`` is the array axis, >= d when component axes lead).
    Unsharded dims self-wrap, which is exactly the single-device periodic
    read."""
    s = slab(a, axis, idx)
    if not sharded(ctx, d):
        return s
    return jax.lax.ppermute(s, ctx.axes[d], _perm_from_left(ctx.sizes[d]))


def fetch_hi(ctx: DistCtx, a: jax.Array, axis: int, d: int, idx: int) -> jax.Array:
    """Slab ``idx`` of the RIGHT (higher-coordinate) ring neighbor along
    spatial dim ``d`` — mirror of `fetch_lo`."""
    s = slab(a, axis, idx)
    if not sharded(ctx, d):
        return s
    return jax.lax.ppermute(s, ctx.axes[d], _perm_from_right(ctx.sizes[d]))


def sync_scalar(a: jax.Array, ctx: Optional[DistCtx],
                perdir: tuple[int, ...] = (), lead: int = 0,
                edge_zero: bool = True) -> jax.Array:
    """Refresh the ghost layers of a (possibly component-leading) field:

    * sharded dims: ring halo exchange; on physical-edge shards of
      non-periodic dims the outer ghost is zeroed (``edge_zero``, the solver
      fields' convention) or keeps its LOCAL pre-sync value otherwise (BC /
      forcing ghosts);
    * unsharded periodic dims: local wrap (single-device `perBC!`);
    * unsharded non-periodic dims: untouched.
    """
    if ctx is None:
        # single-device: only periodic wrap applies
        for d in perdir:
            ax = lead + d
            n = a.shape[ax]
            a = set_slab(a, ax, 0, slab(a, ax, n - 2))
            a = set_slab(a, ax, -1, slab(a, ax, 1))
        return a
    D = len(ctx.axes)
    for d in range(D):
        ax = lead + d
        n = a.shape[ax]
        if sharded(ctx, d):
            lo = fetch_lo(ctx, a, ax, d, n - 2)
            hi = fetch_hi(ctx, a, ax, d, 1)
            if d not in perdir and edge_zero:
                lo = jnp.where(edge_lo(ctx, d), jnp.zeros_like(lo), lo)
                hi = jnp.where(edge_hi(ctx, d), jnp.zeros_like(hi), hi)
            elif d not in perdir:
                lo = jnp.where(edge_lo(ctx, d), slab(a, ax, 0), lo)
                hi = jnp.where(edge_hi(ctx, d), slab(a, ax, n - 1), hi)
            a = set_slab(a, ax, 0, lo)
            a = set_slab(a, ax, -1, hi)
        elif d in perdir:
            a = set_slab(a, ax, 0, slab(a, ax, n - 2))
            a = set_slab(a, ax, -1, slab(a, ax, 1))
    return a


def sync_vector(a: jax.Array, ctx: Optional[DistCtx],
                perdir: tuple[int, ...] = (), edge_zero: bool = False) -> jax.Array:
    """Halo-refresh a ``(D, *local)`` field (edge ghosts kept by default —
    they carry BC values)."""
    return sync_scalar(a, ctx, perdir, lead=1, edge_zero=edge_zero)


def _axis_names(ctx: DistCtx):
    return tuple(ax for ax in ctx.axes if ax is not None)


def psum_all(x, ctx: Optional[DistCtx]):
    """Sum across every sharded mesh axis (identity when ctx is None) — the
    global-reduction point of norms, means and forces under decomposition."""
    if ctx is None:
        return x
    names = _axis_names(ctx)
    return jax.lax.psum(x, names) if names else x


def pmax_all(x, ctx: Optional[DistCtx]):
    """Max across every sharded mesh axis (identity when ctx is None) — used
    by the CFL limit and the L∞ residual norm."""
    if ctx is None:
        return x
    names = _axis_names(ctx)
    return jax.lax.pmax(x, names) if names else x


def global_inside_count(ctx: Optional[DistCtx], shape: tuple[int, ...]) -> int:
    """Global interior cell count for a local padded ``shape`` (static)."""
    if ctx is None:
        return math.prod(n - 2 for n in shape)
    return math.prod((shape[d] - 2) * ctx.sizes[d] for d in range(len(shape)))


def gather_scalar(a: jax.Array, ctx: DistCtx) -> jax.Array:
    """All-gather a distributed padded scalar field into the replicated global
    padded field (interior concatenation + fresh zero ghosts) — the
    coarse-grid-gather of the multigrid transition."""
    D = a.ndim
    g = a[(slice(1, -1),) * D]
    for d in range(D):
        if sharded(ctx, d):
            g = jax.lax.all_gather(g, ctx.axes[d], axis=d, tiled=True)
    return jnp.pad(g, [(1, 1)] * D)


def slice_local(g: jax.Array, ctx: DistCtx) -> jax.Array:
    """Inverse of `gather_scalar`: this shard's padded block of a replicated
    global padded field (interior slice + zero ghosts)."""
    D = g.ndim
    gi = g[(slice(1, -1),) * D]
    n_loc = [gi.shape[d] // ctx.sizes[d] if sharded(ctx, d) else gi.shape[d]
             for d in range(D)]
    starts = [jnp.asarray(ctx.coords[d] * n_loc[d], jnp.int32)
              if sharded(ctx, d) else jnp.asarray(0, jnp.int32)
              for d in range(D)]
    loc = jax.lax.dynamic_slice(gi, starts, n_loc)
    return jnp.pad(loc, [(1, 1)] * D)
