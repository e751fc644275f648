"""Grid conventions, index algebra and shift primitives.

TPU-native rebuild of the reference index-algebra layer
(`/root/reference/src/core.jl:26-61,170-190`).  The reference expresses stencils
through per-cell `CartesianIndex` arithmetic inside generated kernels; the
idiomatic XLA equivalent is whole-array shifts, slab assignments and broadcasted
iota coordinates, which XLA fuses into single stencil loops.

Conventions (identical physics to the reference, 0-based indexing):

* A scalar field has shape ``Ng = N + 2`` per spatial dim: ``N`` interior cells
  plus one ghost cell per side.  Interior cells are indices ``1..Ng-2``.
* A vector field is stored **component-first**: shape ``(D, *Ng)``.  ``u[i]``
  lives on the *lower* ``i``-face of its cell (marker-and-cell staggering).
  Component-first keeps the minor (lane) axis spatial, which is what the TPU
  VPU/Pallas tiling wants; the reference stores components last
  (`src/Flow.jl:114-148`) because Julia is column-major.
* A tensor field has shape ``(D, D, *Ng)``.
* World coordinates (`src/core.jl:177-178`): the center of cell ``I`` is at
  ``x = I - 0.5`` per dim; the ``i``-face is at ``x_i = I_i - 1`` in dim ``i``
  and at the center in the others.  The interior therefore spans ``[0, N]``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "shift", "interior", "set_interior", "grow", "slab", "set_slab",
    "loc_grid", "index_sum_parity", "inside_mask",
]


def shift(a: jax.Array, axis: int, s: int) -> jax.Array:
    """Return ``b`` with ``b[I] = a[I + s*e_axis]`` (wrapping at the ends).

    The wrap-around values land only in cells whose stencil would be
    out-of-bounds in the reference; callers mask or overwrite those slabs, so
    the wrap semantics are never observed.  ``jnp.roll`` lowers to two slices +
    concat which XLA fuses; under SPMD sharding it becomes a collective-permute
    halo exchange over ICI.
    """
    if s == 0:
        return a
    return jnp.roll(a, -s, axis=axis)


def interior(a: jax.Array, d: int | None = None, buff: int = 1) -> jax.Array:
    """Slice off `buff` ghost layers from the trailing ``d`` (spatial) dims.

    Mirrors `inside(a; buff)` (`src/core.jl:47`).  ``d`` defaults to all dims
    (scalar field).
    """
    if d is None:
        d = a.ndim
    if buff == 0:
        return a
    ix = (slice(None),) * (a.ndim - d) + (slice(buff, -buff),) * d
    return a[ix]


def set_interior(a: jax.Array, values: jax.Array, d: int | None = None) -> jax.Array:
    """Return a copy of ``a`` with the interior of the trailing ``d`` spatial
    dims replaced by ``values``."""
    if d is None:
        d = a.ndim
    ix = (slice(None),) * (a.ndim - d) + (slice(1, -1),) * d
    return a.at[ix].set(values)


def grow(values: jax.Array, d: int | None = None, fill=0) -> jax.Array:
    """Pad ``values`` with one ghost layer (constant ``fill``) on the trailing
    ``d`` spatial dims."""
    if d is None:
        d = values.ndim
    pad = [(0, 0)] * (values.ndim - d) + [(1, 1)] * d
    return jnp.pad(values, pad, constant_values=fill)


def slab(a: jax.Array, axis: int, idx: int) -> jax.Array:
    """Extract the hyperplane ``a[..., idx, ...]`` at ``axis`` (keeps dims)."""
    ix = (slice(None),) * axis + (slice(idx, idx + 1) if idx != -1 else slice(-1, None),)
    return a[ix]


def set_slab(a: jax.Array, axis: int, idx: int, values: jax.Array) -> jax.Array:
    """Return a copy of ``a`` with the hyperplane at ``axis``/``idx`` set."""
    ix = (slice(None),) * axis + (slice(idx, idx + 1) if idx != -1 else slice(-1, None),)
    return a.at[ix].set(values)


def loc_grid(i: int | None, shape: tuple[int, ...], dtype=jnp.float32,
             offset=None) -> jax.Array:
    """World coordinates of every grid point: shape ``(D, *shape)``.

    ``i`` is the 0-based face component (``None`` for cell centers).  Matches
    `loc(i,I,T)` (`src/core.jl:177-178`): with 0-based index ``I`` the
    coordinate is ``I - 0.5 - 0.5*δ_{di}`` in dim ``d``.  ``offset`` (per-dim,
    possibly traced) shifts local shard indices to global ones under domain
    decomposition.
    """
    D = len(shape)
    half = jnp.asarray(0.5, dtype)
    coords = []
    for d in range(D):
        c = jax.lax.broadcasted_iota(dtype, shape, d) - half
        if offset is not None:
            c = c + jnp.asarray(offset[d], dtype)
        if i is not None and d == i:
            c = c - half
        coords.append(c)
    return jnp.stack(coords)


def index_sum_parity(shape: tuple[int, ...], dtype=jnp.int32) -> jax.Array:
    """``(sum_d I_d) % 2`` over the grid — the red/black checkerboard color."""
    s = jax.lax.broadcasted_iota(dtype, shape, 0)
    for d in range(1, len(shape)):
        s = s + jax.lax.broadcasted_iota(dtype, shape, d)
    return s % 2


def inside_mask(shape: tuple[int, ...], dtype=jnp.bool_) -> jax.Array:
    """Boolean mask of interior cells (ghost layer False)."""
    m = jnp.ones(shape, dtype=bool)
    for d in range(len(shape)):
        m = set_slab(m, d, 0, jnp.zeros_like(slab(m, d, 0)))
        m = set_slab(m, d, -1, jnp.zeros_like(slab(m, d, -1)))
    return m.astype(dtype) if dtype is not jnp.bool_ else m
