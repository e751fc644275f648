"""Boundary conditions as pure whole-array ops.

Functional port of `BC!`, `perBC!`, `exitBC!` and `apply!`
(`/root/reference/src/core.jl:192-243`, `src/Flow.jl:76-83`).  The reference
mutates ghost slabs with per-slab kernel launches; here each BC application is
a chain of `at[].set` slab updates that XLA fuses into the surrounding stencil
computation.  Under SPMD sharding the slab updates are handled by the
partitioner (only the shard owning a boundary writes it).

A boundary spec ``ubc`` is either

* a tuple of ``D`` numbers — constant Dirichlet velocity, or
* a callable ``ubc(i, x, t) -> scalar`` with 0-based component ``i``, position
  ``x`` a ``(D,)`` jnp vector and time ``t`` (the reference's `uBC(i,x,t)`,
  `src/WaterLily.jl:50-52`); it must be jnp-traceable.
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from .grid import loc_grid, slab, set_slab

__all__ = [
    "bc_field", "bc_vector", "per_bc", "exit_bc", "apply_scalar", "apply_vector",
]


def bc_field(ubc, i: int, shape: tuple[int, ...], t, dtype,
             offset=None) -> jax.Array:
    """Evaluate the boundary spec for component ``i`` on the full face-``i``
    grid.  Constant tuples return a 0-d array (broadcasting handles the rest);
    callables are vmapped over the grid points (``offset`` maps local shard
    indices to global coordinates)."""
    if callable(ubc):
        coords = loc_grid(i, shape, dtype, offset)   # (D, *shape)
        flat = coords.reshape(len(shape), -1).T      # (M, D)
        vals = jax.vmap(lambda x: ubc(i, x, t))(flat)
        return vals.reshape(shape).astype(dtype)
    return jnp.asarray(ubc[i], dtype)


def _broadcast_slab(vals: jax.Array, ref: jax.Array, axis: int, idx: int) -> jax.Array:
    """Slab of `vals` at (axis, idx) broadcast against `ref`'s slab shape."""
    if vals.ndim == 0:
        return jnp.broadcast_to(vals, slab(ref, axis, idx).shape)
    return slab(vals, axis, idx)


def bc_vector(u: jax.Array, ubc, t=0.0, save_exit: bool = False,
              perdir: tuple[int, ...] = (), ctx=None) -> jax.Array:
    """Apply domain BCs to a vector field ``u`` of shape ``(D, *Ng)``.

    Dirichlet on the normal component (ghost slab *and* first interior face),
    zero-Neumann-style extrapolation of the tangential components, periodic
    wrap for directions in ``perdir``, with ``save_exit`` preserving the
    ``i=0`` exit plane for the convective outlet
    (`src/core.jl:199-224`).  The (i, j) loop order and slab update order match
    the reference exactly, so corner ghosts agree bitwise.

    Under domain decomposition (``ctx``) each sharded direction first fetches
    ring halos (which *are* the periodic BC when the ring wraps) and the
    physical Dirichlet/Neumann writes apply only on boundary-owning shards.
    """
    from .dist import edge_hi, edge_lo, fetch_hi, fetch_lo, offsets, sharded

    D, shape = u.shape[0], u.shape[1:]
    off = offsets(ctx, shape) if ctx is not None else None
    for i in range(D):
        ui = u[i]
        Ui = bc_field(ubc, i, shape, t, u.dtype, off)
        for j in range(D):
            n = shape[j]
            set_one = False
            one = None
            if ctx is not None and sharded(ctx, j):
                lo_h = fetch_lo(ctx, ui, j, j, n - 2)
                hi_h = fetch_hi(ctx, ui, j, j, 1)
                if j in perdir:
                    lo, hi = lo_h, hi_h
                elif i == j:
                    lo = jnp.where(edge_lo(ctx, j), _broadcast_slab(Ui, ui, j, 0), lo_h)
                    one = jnp.where(edge_lo(ctx, j), _broadcast_slab(Ui, ui, j, 1),
                                    slab(ui, j, 1))
                    set_one = True
                    if save_exit and i == 0:
                        hi = jnp.where(edge_hi(ctx, j), slab(ui, j, n - 1), hi_h)
                    else:
                        hi = jnp.where(edge_hi(ctx, j), _broadcast_slab(Ui, ui, j, -1), hi_h)
                else:
                    if callable(ubc):
                        lo_bc = _broadcast_slab(Ui, ui, j, 0) + slab(ui, j, 1) - _broadcast_slab(Ui, ui, j, 1)
                        hi_bc = _broadcast_slab(Ui, ui, j, -1) + slab(ui, j, n - 2) - _broadcast_slab(Ui, ui, j, n - 2)
                    else:
                        lo_bc = slab(ui, j, 1)
                        hi_bc = slab(ui, j, n - 2)
                    lo = jnp.where(edge_lo(ctx, j), lo_bc, lo_h)
                    hi = jnp.where(edge_hi(ctx, j), hi_bc, hi_h)
            elif j in perdir:
                lo = slab(ui, j, n - 2)
                hi = slab(ui, j, 1)
            elif i == j:  # normal component: Dirichlet
                lo = _broadcast_slab(Ui, ui, j, 0)
                one = _broadcast_slab(Ui, ui, j, 1)
                set_one = True
                if save_exit and i == 0:   # keep exit plane for exitBC
                    hi = slab(ui, j, n - 1)
                else:
                    hi = _broadcast_slab(Ui, ui, j, -1)
            else:  # tangential: u_g = U_g + (u - U)|neighbor
                if callable(ubc):
                    lo = _broadcast_slab(Ui, ui, j, 0) + slab(ui, j, 1) - _broadcast_slab(Ui, ui, j, 1)
                    hi = _broadcast_slab(Ui, ui, j, -1) + slab(ui, j, n - 2) - _broadcast_slab(Ui, ui, j, n - 2)
                else:  # constant spec: U_g - U_n == 0 exactly (the reference's
                    #  @fastmath reassociates this cancellation too)
                    lo = slab(ui, j, 1)
                    hi = slab(ui, j, n - 2)
            # compose with broadcasted index selects: the whole (i, j) chain
            # fuses into a single read-modify-write pass (a set_slab chain
            # materializes a full copy per slab on TPU)
            jdx = jax.lax.broadcasted_iota(jnp.int32, ui.shape, j)
            ui = jnp.where(jdx == 0, lo, jnp.where(jdx == n - 1, hi, ui))
            if set_one:
                ui = jnp.where(jdx == 1, one, ui)
        u = u.at[i].set(ui)
    return u


def per_bc(a: jax.Array, perdir: tuple[int, ...], lead: int = 0) -> jax.Array:
    """Periodic ghost update of a scalar field (`perBC!`, `src/core.jl:239-243`).

    ``lead`` counts leading non-spatial (component) axes, so ``(D, *Ng)``
    arrays can be wrapped with ``lead=1``.
    """
    for j in perdir:
        ax = lead + j
        n = a.shape[ax]
        a = set_slab(a, ax, 0, slab(a, ax, n - 2))
        a = set_slab(a, ax, -1, slab(a, ax, 1))
    return a


def exit_bc(u: jax.Array, u_old: jax.Array, dt, ctx=None) -> jax.Array:
    """1-D convective outlet on the ``i=0`` exit plane plus a global mass-flux
    correction (`exitBC!`, `src/core.jl:226-233`).

    Distributed: the inflow/exit plane means become masked `psum`s (only
    boundary-owning shards contribute) and the exit update applies on the
    high-edge shards of dim 0.
    """
    from .dist import edge_hi, edge_lo, global_inside_count, psum_all

    D = u.shape[0]
    inner = (slice(1, -1),) * (D - 1)       # interior of the transverse dims
    exit_ix = (slice(-1, None),) + inner
    prev_ix = (slice(-2, -1),) + inner
    in_ix = (slice(1, 2),) + inner
    if ctx is None:
        u_in = jnp.mean(u[(0,) + in_ix])                   # inflow mass flux
        ue = u_old[(0,) + exit_ix]
        new = ue - u_in * dt * (ue - u_old[(0,) + prev_ix])  # 1-D convection
        new = new - (jnp.mean(new) - u_in)                 # flux imbalance fix
        return u.at[(0,) + exit_ix].set(new)
    # global transverse interior count (the slab excludes dim-0)
    count = global_inside_count(ctx, u.shape[1:]) // ((u.shape[1] - 2) * ctx.sizes[0])
    lo0, hi0 = edge_lo(ctx, 0), edge_hi(ctx, 0)
    u_in = psum_all(jnp.sum(jnp.where(lo0, u[(0,) + in_ix], 0.0)), ctx) / count
    ue = u_old[(0,) + exit_ix]
    new = ue - u_in * dt * (ue - u_old[(0,) + prev_ix])
    corr = psum_all(jnp.sum(jnp.where(hi0, new, 0.0)), ctx) / count - u_in
    new = new - corr
    return u.at[(0,) + exit_ix].set(jnp.where(hi0, new, u[(0,) + exit_ix]))


def apply_scalar(f: Callable, shape: tuple[int, ...], dtype=jnp.float32) -> jax.Array:
    """Fill a scalar field with ``f(x)`` at cell centers (`apply!`,
    `src/Flow.jl:81-83`)."""
    coords = loc_grid(None, shape, dtype).reshape(len(shape), -1).T
    return jax.vmap(f)(coords).reshape(shape).astype(dtype)


def apply_vector(f: Callable, D: int, shape: tuple[int, ...], dtype=jnp.float32) -> jax.Array:
    """Fill a vector field with ``f(i, x)`` at the face-``i`` locations."""
    comps = []
    for i in range(D):
        coords = loc_grid(i, shape, dtype).reshape(D, -1).T
        comps.append(jax.vmap(lambda x, i=i: f(i, x))(coords).reshape(shape))
    return jnp.stack(comps).astype(dtype)
