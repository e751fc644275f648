"""Flow diagnostics: vorticity, strain, vortex criteria, body forces, means.

TPU-native port of `/root/reference/src/Metrics.jl`.  Pointwise metrics are
whole-array shift expressions; surface integrals over the BDIM band evaluate
the body normal at every interior cell with one vmapped sweep and reduce with
a single (f64-accumulated where available) sum — `psum` under sharding.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.body import Body, kern
from ..ops.grid import grow, interior, loc_grid, shift

__all__ = [
    "dudx", "ke_field", "lambda2_field", "curl_edge", "omega_field",
    "omega_mag_field", "omega_theta_field", "helicity_field", "strain_field",
    "vorticity",
    "nds_field", "pressure_force", "viscous_force", "total_force",
    "pressure_moment", "viscous_moment", "total_moment", "MeanFlow",
]


def _acc_dtype(dtype):
    """Reduction dtype: promote to f64 like the reference (`Metrics.jl:127`)
    when x64 is enabled (CPU); stay f32 on TPU."""
    return jnp.float64 if jax.config.jax_enable_x64 else dtype


def _fsum(a: jax.Array, lead: int) -> jax.Array:
    """Accurate surface-integral reduction of ``(*lead, *grid)`` over the
    grid axes.  The reference accumulates these sums in Float64
    (`Metrics.jl:127`); TPUs have no fast f64, so instead: sum each leading-
    axis slab with XLA's tree reduction (error ~eps·log n), then combine the
    per-slab partials with a Neumaier-compensated scan — error stays
    ~eps·log(plane) independent of the row count instead of growing with a
    sequential f32 accumulation."""
    acc = _acc_dtype(a.dtype)
    if acc == jnp.float64:           # x64 on (CPU): plain f64 sum matches ref
        return jnp.sum(a.astype(acc), axis=tuple(range(lead, a.ndim)))
    return _fsum_comp(a, lead)


def _fsum_comp(a: jax.Array, lead: int) -> jax.Array:
    """The compensated (same-precision) branch of `_fsum`."""
    rows = jnp.sum(a, axis=tuple(range(lead + 1, a.ndim)))  # (*lead, rows)
    rows = jnp.moveaxis(rows, -1, 0)

    def step(carry, v):
        s, c = carry
        t = s + v
        # Neumaier: pick the larger-magnitude operand's rounding error
        c = c + jnp.where(jnp.abs(s) >= jnp.abs(v), (s - t) + v, (v - t) + s)
        return (t, c), None

    (s, c), _ = jax.lax.scan(step, (jnp.zeros_like(rows[0]),
                                    jnp.zeros_like(rows[0])), rows)
    return s + c


def dudx(i: int, j: int, u: jax.Array) -> jax.Array:
    """∂u_i/∂x_j at cell centers (`∂(i,j,I,u)`, `Metrics.jl:42-44`): exact
    staggered difference inline, 4-point average for cross terms."""
    if i == j:
        return shift(u[i], i, 1) - u[i]
    a = shift(u[i], j, 1)
    b = shift(u[i], j, -1)
    return (a + shift(a, i, 1) - b - shift(b, i, 1)) / 4


def ke_field(u: jax.Array, U=None) -> jax.Array:
    """0.5|u-U|² at cell centers (`ke`, `Metrics.jl:33-35`)."""
    D = u.shape[0]
    s = jnp.zeros(u.shape[1:], u.dtype)
    for i in range(D):
        Ui = 0.0 if U is None else U[i]
        s = s + (u[i] + shift(u[i], i, 1) - 2 * Ui) ** 2
    return 0.125 * s


def _jacobian_field(u: jax.Array) -> jax.Array:
    D = u.shape[0]
    return jnp.stack([jnp.stack([dudx(i, j, u) for j in range(D)])
                      for i in range(D)])


def lambda2_field(u: jax.Array) -> jax.Array:
    """λ₂ vortex criterion (`λ₂`, `Metrics.jl:54-58`): middle eigenvalue of
    S²+Ω², batched `eigvalsh` over the grid."""
    J = _jacobian_field(u)                       # (D, D, *sp)
    Jt = jnp.swapaxes(J, 0, 1)
    S, O = (J + Jt) / 2, (J - Jt) / 2
    A = jnp.einsum("ik...,kj...->ij...", S, S) + jnp.einsum("ik...,kj...->ij...", O, O)
    sp = A.shape[2:]
    Ab = jnp.moveaxis(A.reshape(3, 3, -1), -1, 0)
    ev = jnp.linalg.eigvalsh(Ab)                  # ascending
    return ev[:, 1].reshape(sp)


def _cyclic(i: int):
    return (i + 1) % 3, (i + 2) % 3


def curl_edge(i: int, u: jax.Array) -> jax.Array:
    """Component i of ∇×u at the cell *edge* (`curl`, `Metrics.jl:68-72`)."""
    j, k = _cyclic(i)
    return ((u[k] - shift(u[k], j, -1)) - (u[j] - shift(u[j], k, -1)))


def omega_field(u: jax.Array) -> jax.Array:
    """∇×u at cell centers (`ω`, `Metrics.jl:77-79`)."""
    comps = []
    for i in range(3):
        j, k = _cyclic(i)
        comps.append(dudx(k, j, u) - dudx(j, k, u))
    return jnp.stack(comps)


def omega_mag_field(u: jax.Array) -> jax.Array:
    """|∇×u| (`ω_mag`, `Metrics.jl:84-86`)."""
    w = omega_field(u)
    return jnp.sqrt(jnp.sum(w**2, axis=0))


def vorticity(u: jax.Array) -> jax.Array:
    """Dimension-dispatching vorticity scalar: 2D → ∂v/∂x − ∂u/∂y at cell
    centers; 3D → |∇×u| (the default plotted field of the reference viz
    extensions, `ext/WaterLilyPlotsExt.jl:47`, `ext/WaterLilyMakieExt.jl:200`)."""
    if u.shape[0] == 2:
        return dudx(1, 0, u) - dudx(0, 1, u)
    return omega_mag_field(u)


def omega_theta_field(u: jax.Array, z, center) -> jax.Array:
    """Azimuthal vorticity ω·θ̂ about axis ``z`` through ``center``
    (`ω_θ`, `Metrics.jl:91-97`)."""
    sp = u.shape[1:]
    x = loc_grid(None, sp, u.dtype)
    rel = x - jnp.asarray(center, u.dtype).reshape(3, 1, 1, 1)
    z = jnp.asarray(z, u.dtype).reshape(3, 1, 1, 1)
    theta = jnp.cross(jnp.broadcast_to(z, rel.shape), rel, axis=0)
    n = jnp.sqrt(jnp.sum(theta**2, axis=0))
    w = omega_field(u)
    dot = jnp.sum(theta * w, axis=0)
    return jnp.where(n <= jnp.finfo(u.dtype).eps, 0.0, dot / jnp.where(n == 0, 1.0, n))


def helicity_field(u: jax.Array, w: jax.Array) -> jax.Array:
    """Helicity density at collocated cells from velocity and a vorticity
    field (`helicity`, `Metrics.jl:99-109`)."""
    s = jnp.zeros(u.shape[1:], u.dtype)
    for d in range(3):
        d1, d2 = _cyclic(d)
        umid = u[d] + shift(u[d], d, 1)
        acc = jnp.zeros_like(s)
        for i1 in (0, 1):
            for i2 in (0, 1):
                acc = acc + shift(shift(w[d], d1, i1), d2, i2)
        s = s + umid * acc
    return s / 8


def strain_field(u: jax.Array) -> jax.Array:
    """Rate-of-strain tensor S at cell centers (`S`, `Metrics.jl:140`)."""
    D = u.shape[0]
    return jnp.stack([jnp.stack([(dudx(i, j, u) + dudx(j, i, u)) / 2
                                 for j in range(D)]) for i in range(D)])


# ------------------------------------------------------------------ forces
def nds_field(body: Body, shape: tuple[int, ...], t, dtype,
              offset=None) -> jax.Array:
    """BDIM-masked surface normal n·K(d) at every interior cell center
    (`nds`, `Metrics.jl:116-119`); ghosts zero.  Shape ``(D, *shape)``.
    ``offset`` shifts local shard indices to global coordinates under
    domain decomposition."""
    D = len(shape)
    coords = loc_grid(None, shape, dtype, offset)[(slice(None),) + (slice(1, -1),) * D]
    flat = coords.reshape(D, -1).T
    t = jnp.asarray(t, dtype)

    def f(x):
        d, n, _ = body.measure_at(x, t, 1.0)
        return n * kern(jnp.clip(d, -1.0, 1.0))

    vals = jax.vmap(f)(flat).T.reshape((D,) + tuple(n - 2 for n in shape))
    return jnp.stack([grow(vals[i]) for i in range(D)])


def pressure_force(p: jax.Array, body: Body, t=0.0, offset=None,
                   ctx=None) -> jax.Array:
    """∮ p n dS over the body (`pressure_force`, `Metrics.jl:126-133`);
    psum-reduced across shards when ``ctx`` is given."""
    from ..ops.dist import psum_all

    nds = nds_field(body, p.shape, t, p.dtype, offset)
    return psum_all(_fsum(p[None] * nds, 1), ctx)


def viscous_force(u: jax.Array, nu, body: Body, t=0.0, offset=None,
                  ctx=None) -> jax.Array:
    """-∮ 2ν S·n dS (`viscous_force`, `Metrics.jl:147-154`); under
    decomposition ``u`` ghosts must hold halo values (the stepped state
    does)."""
    from ..ops.dist import psum_all

    sp = u.shape[1:]
    nds = nds_field(body, sp, t, u.dtype, offset)
    S = strain_field(u)
    df = -2.0 * nu * jnp.einsum("ij...,j...->i...", S, nds)
    return psum_all(_fsum(df, 1), ctx)


def total_force(sim) -> jax.Array:
    """`total_force`, `Metrics.jl:160`.  A `DistSimulation` routes to its
    per-shard psum-reduced integral (its `sim.flow.state` is the stale
    pre-stepping copy — reading it here would silently integrate the initial
    condition)."""
    from .io import _is_dist

    if _is_dist(sim):
        return sim.total_force()
    return (pressure_force(sim.flow.state.p, sim.body, sim.time)
            + viscous_force(sim.flow.state.u, sim.flow.state.nu, sim.body, sim.time))


def _cross_field(a: jax.Array, b: jax.Array) -> jax.Array:
    """Cross product of (D,*sp) fields: scalar in 2D, vector in 3D."""
    if a.shape[0] == 2:
        return (a[0] * b[1] - a[1] * b[0])[None]
    return jnp.cross(a, b, axis=0)


def _rel_coords(shape, x0, dtype, offset=None):
    D = len(shape)
    x = loc_grid(None, shape, dtype, offset)
    return x - jnp.asarray(x0, dtype).reshape((D,) + (1,) * D)


def pressure_moment(x0, p: jax.Array, body: Body, t=0.0, offset=None,
                    ctx=None) -> jax.Array:
    """∮ p (x-x0)×n dS (`pressure_moment`, `Metrics.jl:166-173`)."""
    from ..ops.dist import psum_all

    nds = nds_field(body, p.shape, t, p.dtype, offset)
    rel = _rel_coords(p.shape, x0, p.dtype, offset)
    df = p[None] * _cross_field(rel, nds)
    return psum_all(_fsum(df, 1), ctx)


def viscous_moment(x0, u: jax.Array, nu, body: Body, t=0.0, offset=None,
                   ctx=None) -> jax.Array:
    """-∮ 2ν (x-x0)×(S·n) dS (`viscous_moment`, `Metrics.jl:179-190`)."""
    from ..ops.dist import psum_all

    sp = u.shape[1:]
    nds = nds_field(body, sp, t, u.dtype, offset)
    S = strain_field(u)
    Sn = jnp.einsum("ij...,j...->i...", S, nds)
    rel = _rel_coords(sp, x0, u.dtype, offset)
    df = -2.0 * nu * _cross_field(rel, Sn)
    return psum_all(_fsum(df, 1), ctx)


def total_moment(x0, sim) -> jax.Array:
    """Pressure + viscous moment about ``x0`` (`total_moment`,
    `Metrics.jl:195-197`); dist sims route like `total_force`."""
    from .io import _is_dist

    if _is_dist(sim):
        return sim.total_moment(x0)
    return (pressure_moment(x0, sim.flow.state.p, sim.body, sim.time)
            + viscous_moment(x0, sim.flow.state.u, sim.flow.state.nu, sim.body,
                             sim.time))


# ------------------------------------------------------------------ means
class MeanFlow:
    """Exponential-window running averages of P, U (and u⊗u Reynolds
    products) (`MeanFlow`, `Metrics.jl:205-257`).

    ``flow`` may be a `Flow` or a `parallel.dist.DistSimulation` — for the
    latter the averages live in the blocked sharded layout and `update`
    reads the live (`dsim.state`) fields, never the stale `sim.flow.state`
    copy; the blends stay sharded on device."""

    def __init__(self, shape=None, D=None, flow=None, t_init=0.0,
                 uu_stats: bool = False, dtype=jnp.float32):
        if flow is not None:
            st = flow.state    # for a DistSimulation: refreshed + sharded
            D = flow.cfg.D
            dtype = flow.cfg.dtype
            t_init = flow.time
            self.P = jnp.zeros_like(st.p)
            self.U = jnp.zeros_like(st.u)
            shape = st.p.shape
        else:
            shape = tuple(n + 2 for n in shape)  # interior dims like the ref
            D = D or len(shape)
            self.P = jnp.zeros(shape, dtype)
            self.U = jnp.zeros((D,) + shape, dtype)
        self.UU = jnp.zeros((D, D) + tuple(shape), dtype) if uu_stats else None
        self.t = [float(t_init)]
        self.uu_stats = uu_stats

    @property
    def time(self) -> float:
        return self.t[-1] - self.t[0]

    def reset(self, t_init: float = 0.0):
        """Zero the running averages and restart the window (`reset!`,
        `Metrics.jl:234-241`)."""
        self.P = jnp.zeros_like(self.P)
        self.U = jnp.zeros_like(self.U)
        if self.UU is not None:
            self.UU = jnp.zeros_like(self.UU)
        self.t = [float(t_init)]

    def update(self, flow):
        """Blend in the instantaneous fields (`update!`, `Metrics.jl:228-243`).
        ``flow``: the `Flow` (or `DistSimulation`) this MeanFlow was built
        from — both expose the live ``state``/``time``."""
        dt = flow.time - self.t[-1]
        eps_w = dt / (dt + self.time + float(jnp.finfo(self.P.dtype).eps))
        if len(self.t) == 1:
            eps_w = 1.0
        u, p = flow.state.u, flow.state.p
        self.P = eps_w * p + (1 - eps_w) * self.P
        self.U = eps_w * u + (1 - eps_w) * self.U
        if self.uu_stats:
            uu_now = jnp.einsum("i...,j...->ij...", u, u)
            self.UU = eps_w * uu_now + (1 - eps_w) * self.UU
        self.t.append(self.t[-1] + dt)

    def uu(self) -> jax.Array:
        """Reynolds-stress tensor u⊗u − Ū⊗Ū (`uu`, `Metrics.jl:246-253`)."""
        return self.UU - jnp.einsum("i...,j...->ij...", self.U, self.U)
