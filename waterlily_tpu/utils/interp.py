"""Multilinear field sampling and dimension spreading.

TPU-native port of `/root/reference/src/util.jl:17-43,78-128`.  `interp`
matches the reference's clamped, staggered-aware sampling semantics; queries
vmap cleanly for particle/pathline workloads (gathers on device).
"""
from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp

__all__ = ["interp_scalar", "interp_vector", "squeeze", "spread",
           "spread_sim"]


def _interp_core(x: jax.Array, arr: jax.Array) -> jax.Array:
    """N-D multilinear sample at 0-based array coordinate ``x + 0.5``
    (`_interp`, `util.jl:33-43`)."""
    D = arr.ndim
    xx = x + 0.5
    i0 = jnp.floor(xx).astype(jnp.int32)
    y = xx - i0
    s = jnp.zeros((), arr.dtype)
    for corner in itertools.product((0, 1), repeat=D):
        w = jnp.prod(jnp.where(jnp.asarray(corner) == 0, 1 - y, y))
        idx = tuple(i0[d] + corner[d] for d in range(D))
        s = s + arr[idx] * w
    return s


def _clamp(x: jax.Array, shape) -> jax.Array:
    """Clamp the query into the valid interpolation domain
    (`_interp_clamp`, `util.jl:17-18`)."""
    hi = jnp.asarray([n - 2 for n in shape], x.dtype)
    return jnp.clip(x, 0.0, hi)


def interp_scalar(x, arr: jax.Array) -> jax.Array:
    """Sample a scalar field at world coordinate ``x`` (`interp`,
    `util.jl:29-31`)."""
    x = jnp.asarray(x, arr.dtype)
    return _interp_core(_clamp(x, arr.shape), arr)


def interp_vector(x, u: jax.Array) -> jax.Array:
    """Sample a staggered vector field ``(D, *Ng)``: each component's query is
    shifted +0.5 in its own direction before clamping (`interp`,
    `util.jl:22-27`)."""
    D = u.shape[0]
    x = jnp.asarray(x, u.dtype)
    out = []
    for i in range(D):
        sh = jnp.zeros(D, u.dtype).at[i].set(0.5)
        out.append(_interp_core(_clamp(x + sh, u.shape[1:]), u[i]))
    return jnp.stack(out)


def squeeze(a: jax.Array) -> jax.Array:
    """Drop singleton dims (`squeeze`, `util.jl:78`)."""
    return jnp.squeeze(a)


def spread(src: jax.Array, n_new: int, dim: int = 2, lead: int = 0,
           noise: float = 0.0, key=None) -> jax.Array:
    """Extrude a field along a new spatial axis of length ``n_new`` inserted
    at spatial position ``dim``, with optional uniform noise
    (`spread!`, `util.jl:102-127`).  ``lead`` counts leading component axes
    (1 for a vector field)."""
    ax = lead + dim
    out = jnp.broadcast_to(jnp.expand_dims(src, ax),
                           src.shape[:ax] + (n_new,) + src.shape[ax:])
    if noise != 0.0:
        key = key if key is not None else jax.random.PRNGKey(0)
        out = out + noise * jax.random.uniform(key, out.shape, out.dtype)
    return out


def spread_sim(sim3d, sim2d, dim: int = 2, noise: float = 0.0, key=None):
    """Extrude a 2D simulation's state into a 3D simulation — the
    simulation-level `spread!` (`util.jl:102-127`, tested
    `test_util.jl:17-36`): copies ``u`` (extruded in-plane components, zero
    out-of-plane component unless noise is added), ``p``, with assertions that
    the in-plane grids and bodies match.  ``dim`` is the new (0-based) spatial
    axis of ``sim3d``; noise perturbs ``u`` to break the 2D symmetry."""
    import dataclasses

    import numpy as np

    s2, s3 = sim2d.flow.cfg.shape, sim3d.flow.cfg.shape
    plane = tuple(n for d, n in enumerate(s3) if d != dim)
    if plane != tuple(s2):
        raise ValueError(f"in-plane grids differ: {plane} vs {s2}")
    sd2 = np.asarray(sim2d.sdf_field())
    ix = tuple(slice(None) if d != dim else s3[dim] // 2 for d in range(3))
    sd3 = np.asarray(sim3d.sdf_field())[ix]
    if not np.allclose(sd2, sd3, atol=1e-4):
        raise ValueError("2D and 3D bodies do not match in the spread plane")
    n_new = s3[dim]
    st2, st3 = sim2d.flow.state, sim3d.flow.state
    comps = []
    k2 = 0
    for i in range(3):
        if i == dim:
            comps.append(jnp.zeros(s3, st3.u.dtype))
        else:
            comps.append(spread(st2.u[k2].astype(st3.u.dtype), n_new, dim))
            k2 += 1
    u = jnp.stack(comps)
    if noise != 0.0:
        key = key if key is not None else jax.random.PRNGKey(0)
        u = u + noise * jax.random.uniform(key, u.shape, u.dtype)
    p = spread(st2.p.astype(st3.p.dtype), n_new, dim)
    sim3d.flow.state = dataclasses.replace(st3, u=u, u0=u, p=p)
    if getattr(sim3d, "_flat", None) is not None:
        sim3d._sync_flat()
    return sim3d
