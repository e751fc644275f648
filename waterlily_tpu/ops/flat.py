"""Flat (x, y·z) field layout for the 3D TPU fast path.

XLA tiles the two minor dims of every array into (8, 128) physical tiles, so
a ghost-padded 3D field with Nz = N+2 = 258 lanes is physically padded to 384
— every elementwise op and every DMA pays ~49% wasted HBM bandwidth.  This
module stores 3D scalar fields as ``(Nx, S, 128)`` with the (y, z) plane
flattened row-major (``f = y*Nz + z``, sublane ``f // 128``, lane
``f % 128``, ``S = roundup(Ny*Nz, 1024) / 128``): ≤1.6% physical padding, and
the leading x dim is a plain batch dim so Pallas halo windows DMA at full
alignment with no repacking.

Stencil shifts in the flattened plane are compositions of a sublane roll and
a lane rotation (`fshift`); the flat wrap crosses (y, z) row boundaries only
into ghost cells, which every consumer masks or overwrites — the same
"wrap values are never observed" convention as `ops.grid.shift`.  The dead
tail ``f >= Ny*Nz`` is kept zero by masking every producer.

Only the single-device 3D hot path uses this layout (`models.flow` selects it
on TPU); the reference semantics being reproduced are cited per-op below
(`/root/reference/src/core.jl`, `src/Flow.jl`, `src/Poisson.jl`).
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = [
    "FlatGeom", "geom_of", "to_flat", "from_flat", "fshift", "xshift",
    "yz_planes", "bc_vector_flat", "per_bc_flat", "exit_bc_flat", "div_flat",
    "cfl_flat", "set_diag_flat", "mult_flat", "residual_flat", "norms_flat",
    "jacobi_flat", "gauss_seidel_rb_flat", "increment_flat",
    "proj_correct_flat", "interior_mean_flat",
]


class FlatGeom(NamedTuple):
    """Static geometry of a flat field (hashable; part of the jit cache key)."""
    shape3: tuple[int, int, int]     # padded (Nx, Ny, Nz) = N + 2
    S: int                           # sublane count (multiple of 8)

    @property
    def Nx(self):
        return self.shape3[0]

    @property
    def Ny(self):
        return self.shape3[1]

    @property
    def Nz(self):
        return self.shape3[2]

    @property
    def M(self):
        return self.shape3[1] * self.shape3[2]


def geom_of(shape3: tuple[int, int, int]) -> FlatGeom:
    """FlatGeom of a padded 3D shape: the y·z plane of M = Ny·Nz cells is
    flattened row-major onto (S, 128) with S the smallest sublane multiple of
    8 that fits — ≤1.6% pad, perfect (8, 128) XLA tiling."""
    M = shape3[1] * shape3[2]
    S = -(-M // 1024) * 8
    return FlatGeom(tuple(shape3), S)


def to_flat(a3: jax.Array, g: FlatGeom) -> jax.Array:
    """(…, Nx, Ny, Nz) → (…, Nx, S, 128); dead tail zero-filled."""
    lead = a3.shape[:-3]
    f = a3.reshape(lead + (g.Nx, g.M))
    f = jnp.pad(f, [(0, 0)] * len(lead) + [(0, 0), (0, g.S * 128 - g.M)])
    return f.reshape(lead + (g.Nx, g.S, 128))


def from_flat(a: jax.Array, g: FlatGeom) -> jax.Array:
    """(…, Nx, S, 128) → (…, Nx, Ny, Nz)."""
    lead = a.shape[:-3]
    f = a.reshape(lead + (g.Nx, g.S * 128))[..., :g.M]
    return f.reshape(lead + g.shape3)


def fshift(a: jax.Array, s: int) -> jax.Array:
    """Flat-plane shift: ``b[.., f_sub, f_lane] = a[.., f + s]`` with wrap over
    the whole (S·128) plane.  ``s = ±1`` is a z-shift, ``s = ±Nz`` a y-shift
    (`δ(i,N)` index steps, `src/core.jl:39-40`).  Wrapped/tail values land
    only in ghost cells."""
    if s == 0:
        return a
    q, r = divmod(s, 128)
    a1 = jnp.roll(a, -q, axis=-2)
    if r == 0:
        return a1
    a2 = jnp.roll(a, -(q + 1), axis=-2)
    return jnp.concatenate([a1[..., r:], a2[..., :r]], axis=-1)


def xshift(a: jax.Array, s: int) -> jax.Array:
    """x-direction shift (leading spatial dim): ``b[x] = a[x+s]``."""
    if s == 0:
        return a
    return jnp.roll(a, -s, axis=-3)


def shift_flat(a: jax.Array, g: FlatGeom, d: int, s: int) -> jax.Array:
    """`ops.grid.shift` in flat layout: dim 0 → x roll, dim 1 → ±s·Nz flat,
    dim 2 → ±s flat."""
    if d == 0:
        return xshift(a, s)
    return fshift(a, s * (g.Nz if d == 1 else 1))


def yz_planes(g: FlatGeom, dtype=jnp.float32):
    """Per-plane index/mask constants, shape (S, 128):

    ``y``, ``z`` integer coordinates, and ``inside_yz`` — 1.0 on valid
    non-ghost (1 <= y <= Ny-2, 1 <= z <= Nz-2) cells, 0 on ghosts and the
    dead tail.  Kernels combine with x-row masks for the full `inside`
    predicate (`src/core.jl:47`)."""
    f = (jax.lax.broadcasted_iota(jnp.int32, (g.S, 128), 0) * 128
         + jax.lax.broadcasted_iota(jnp.int32, (g.S, 128), 1))
    y = f // g.Nz
    z = f - y * g.Nz
    valid = f < g.M
    ins = valid & (y >= 1) & (y <= g.Ny - 2) & (z >= 1) & (z <= g.Nz - 2)
    return y, z, ins.astype(dtype)


def _masks(g: FlatGeom, dtype):
    y, z, ins = yz_planes(g, dtype)
    return y, z, ins


def _x_iota(a: jax.Array) -> jax.Array:
    return jax.lax.broadcasted_iota(jnp.int32, a.shape, a.ndim - 3)


def inside_mask_flat(g: FlatGeom, shape, dtype) -> jax.Array:
    """Full 3D interior mask broadcast to ``shape`` ((…,) Nx, S, 128)."""
    _, _, ins = yz_planes(g, dtype)
    ix = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 3)
    return jnp.where((ix >= 1) & (ix <= g.Nx - 2), ins, 0.0).astype(dtype)


def zero_ghost_flat(a: jax.Array, g: FlatGeom) -> jax.Array:
    return a * inside_mask_flat(g, a.shape, a.dtype)


# ------------------------------------------------------------------- BC
def sync_ghost_flat(a: jax.Array, perdir: tuple[int, ...], g: FlatGeom,
                    ctx=None, edge_zero: bool = True) -> jax.Array:
    """Ghost refresh of a flat field under optional x-decomposition.

    ``ctx`` is a 1-spatial-dim `ops.dist.DistCtx` over the x axis (the flat
    layout's leading spatial dim, array axis ``ndim-3``): x ghosts come from
    a ring `ppermute` halo exchange (physical-edge ghosts zeroed under
    ``edge_zero``, kept otherwise — the solver-field vs velocity-field
    conventions of `ops.dist.sync_scalar`), and the ring wrap IS the x
    periodicity.  y/z periodic wraps stay local (the plane is never split).
    """
    from .dist import sync_scalar

    if ctx is not None:
        a = sync_scalar(a, ctx, perdir=(0,) if 0 in perdir else (),
                        lead=a.ndim - 3, edge_zero=edge_zero)
        return per_bc_flat(a, tuple(d for d in perdir if d != 0), g)
    return per_bc_flat(a, perdir, g)


def x_parity(ctx, g: FlatGeom) -> int:
    """Global parity offset of local x row 0 (red-black coloring across
    shards; 0 when undistributed).  Uses THIS level's local interior extent
    ``g.Nx - 2`` — ctx.n_loc is the fine level's and would give the wrong
    checkerboard on coarse levels with odd local interiors (the 3D path's
    `parity_shift(ctx, x.shape)` analog)."""
    if ctx is None:
        return 0
    return (ctx.coords[0] * (g.Nx - 2)) % 2


def per_bc_flat(a: jax.Array, perdir: tuple[int, ...], g: FlatGeom
                ) -> jax.Array:
    """Periodic ghost update of a flat scalar field (`perBC!`,
    `src/core.jl:239-243`): ghost plane 0 ← interior n−2, ghost n−1 ←
    interior 1, per periodic direction.  Leading (component) axes broadcast.
    In-plane wraps are whole-plane `fshift`s masked to the ghost planes; the
    source planes are real rows so dead-tail garbage never propagates."""
    if not perdir:
        return a
    yv, zv, _ = yz_planes(g, a.dtype)
    for j in perdir:
        if j == 0:
            ix = _x_iota(a)
            a = jnp.where(ix == 0, slabx(a, g.Nx - 2),
                          jnp.where(ix == g.Nx - 1, slabx(a, 1), a))
        else:
            idx = yv if j == 1 else zv
            n = g.Ny if j == 1 else g.Nz
            step = g.Nz if j == 1 else 1
            a = jnp.where(idx == 0, fshift(a, (n - 2) * step),
                          jnp.where(idx == n - 1, fshift(a, -(n - 2) * step), a))
    return a


def bc_vector_flat(u: jax.Array, ubc, g: FlatGeom, save_exit: bool = False,
                   perdir: tuple[int, ...] = (), t=0.0, ctx=None,
                   ctx3=None) -> jax.Array:
    """`BC!` (`src/core.jl:199-224`) on a flat vector field (D, Nx, S, 128):
    Dirichlet on the normal component (ghost slab and first interior face),
    tangential ghosts copy the first interior value (the constant-spec
    cancellation of `ops.bc.bc_vector`), periodic wrap for directions in
    ``perdir``, and ``save_exit`` preserves the x-high exit plane of u_x for
    `exitBC!`.  The (i, j) update order matches the 3D path so corner ghosts
    agree.  Callable ``ubc(i, x, t)`` specs are evaluated on the 3D face grid
    and flattened (the constant path stays kernel-eligible)."""
    from . import pallas_flat as plf
    from .dist import edge_hi, edge_lo, fetch_hi, fetch_lo, offsets, sharded

    dist_x = ctx is not None and sharded(ctx, 0)
    if plf.use_pallas_flat(u) and not perdir and not callable(ubc) \
            and not dist_x:
        return plf.bc_k(u, ubc, g, save_exit)
    D = u.shape[0]
    yv, zv, _ = yz_planes(g, u.dtype)
    if callable(ubc):
        from .bc import bc_field

        off = offsets(ctx3, g.shape3) if ctx3 is not None else None
        Us = [to_flat(bc_field(ubc, i, g.shape3, t, u.dtype, off), g)
              for i in range(D)]
    else:
        Us = [jnp.asarray(ubc[i], u.dtype) for i in range(D)]

    comps = []
    for i in range(D):
        ui = u[i]
        Ui = Us[i]
        const = Ui.ndim == 0
        for j in range(D):
            per = j in perdir
            if j == 0 and dist_x:
                # sharded x: ring halos fill the ghosts; physical-edge shards
                # overwrite with the Dirichlet/Neumann values (mirrors the
                # sharded branch of `ops.bc.bc_vector`)
                ix = _x_iota(ui)
                n = g.Nx
                ax = ui.ndim - 3
                lo_h = fetch_lo(ctx, ui, ax, 0, n - 2)
                hi_h = fetch_hi(ctx, ui, ax, 0, 1)
                set_one = False
                if per:
                    lo, hi = lo_h, hi_h
                elif i == j:
                    lo_bc = Ui if const else slabx(Ui, 0)
                    one_bc = Ui if const else slabx(Ui, 1)
                    lo = jnp.where(edge_lo(ctx, 0),
                                   jnp.broadcast_to(lo_bc, lo_h.shape), lo_h)
                    one = jnp.where(edge_lo(ctx, 0),
                                    jnp.broadcast_to(one_bc, lo_h.shape),
                                    slabx(ui, 1))
                    set_one = True
                    if save_exit and i == 0:
                        hi = jnp.where(edge_hi(ctx, 0), slabx(ui, n - 1), hi_h)
                    else:
                        hi_bc = Ui if const else slabx(Ui, n - 1)
                        hi = jnp.where(edge_hi(ctx, 0),
                                       jnp.broadcast_to(hi_bc, hi_h.shape),
                                       hi_h)
                else:
                    if const:
                        lo_bc, hi_bc = slabx(ui, 1), slabx(ui, n - 2)
                    else:
                        lo_bc = slabx(Ui, 0) + slabx(ui, 1) - slabx(Ui, 1)
                        hi_bc = slabx(Ui, n - 1) + slabx(ui, n - 2) \
                            - slabx(Ui, n - 2)
                    lo = jnp.where(edge_lo(ctx, 0), lo_bc, lo_h)
                    hi = jnp.where(edge_hi(ctx, 0), hi_bc, hi_h)
                ui = jnp.where(ix == 0, lo, jnp.where(ix == n - 1, hi, ui))
                if set_one:
                    ui = jnp.where(ix == 1, one, ui)
            elif j == 0:
                ix = _x_iota(ui)
                n = g.Nx
                if per:
                    ui = jnp.where(ix == 0, slabx(ui, n - 2),
                                   jnp.where(ix == n - 1, slabx(ui, 1), ui))
                elif i == j:
                    lo = Ui if const else slabx(Ui, 0)
                    one = Ui if const else slabx(Ui, 1)
                    if save_exit and i == 0:
                        hi = slabx(ui, n - 1)
                    else:
                        hi = Ui if const else slabx(Ui, n - 1)
                    ui = jnp.where(ix == 0, lo,
                                   jnp.where(ix == n - 1, hi,
                                             jnp.where(ix == 1, one, ui)))
                else:
                    if const:
                        lo, hi = slabx(ui, 1), slabx(ui, n - 2)
                    else:
                        lo = slabx(Ui, 0) + slabx(ui, 1) - slabx(Ui, 1)
                        hi = slabx(Ui, n - 1) + slabx(ui, n - 2) - slabx(Ui, n - 2)
                    ui = jnp.where(ix == 0, lo, jnp.where(ix == n - 1, hi, ui))
            else:
                idx = yv if j == 1 else zv
                n = g.Ny if j == 1 else g.Nz
                step = g.Nz if j == 1 else 1
                if per:
                    ui = jnp.where(idx == 0, fshift(ui, (n - 2) * step),
                                   jnp.where(idx == n - 1,
                                             fshift(ui, -(n - 2) * step), ui))
                elif i == j:
                    # Ui is staggered-consistent on its own plane: plane-k
                    # values of a flat field need no shift for the write mask
                    ui = jnp.where(idx == 0, Ui,
                                   jnp.where(idx == n - 1, Ui,
                                             jnp.where(idx == 1, Ui, ui)))
                else:
                    if const:
                        ui = jnp.where(idx == 0, fshift(ui, step),
                                       jnp.where(idx == n - 1, fshift(ui, -step), ui))
                    else:
                        lo = Ui + fshift(ui, step) - fshift(Ui, step)
                        hi = Ui + fshift(ui, -step) - fshift(Ui, -step)
                        ui = jnp.where(idx == 0, lo,
                                       jnp.where(idx == n - 1, hi, ui))
        comps.append(ui)
    return jnp.stack(comps)


def slabx(a: jax.Array, idx: int) -> jax.Array:
    """Row slab a[..., idx:idx+1, :, :] (x hyperplane, keepdims)."""
    return a[..., idx:idx + 1, :, :]


def exit_bc_flat(u: jax.Array, u_old: jax.Array, dt, g: FlatGeom,
                 ctx=None) -> jax.Array:
    """`exitBC!` (`src/core.jl:226-233`): 1-D convective outlet on the x-high
    plane of u_x plus the global mass-flux correction, on flat fields.  Under
    x-decomposition the inflow/outflow plane means are edge-masked `psum`s
    and the exit update applies on the high-edge shard only."""
    from .dist import edge_hi, edge_lo, psum_all, sharded

    _, _, ins = yz_planes(g, u.dtype)
    cnt = (g.Ny - 2) * (g.Nz - 2)
    ix = _x_iota(u[0])
    if ctx is None or not sharded(ctx, 0):
        u_in = jnp.sum(slabx(u[0], 1) * ins) / cnt
        ue = slabx(u_old[0], g.Nx - 1)
        new = ue - u_in * dt * (ue - slabx(u_old[0], g.Nx - 2))
        new = new - (jnp.sum(new * ins) / cnt - u_in)
        return u.at[0].set(jnp.where((ix == g.Nx - 1) & (ins > 0), new, u[0]))
    lo0, hi0 = edge_lo(ctx, 0), edge_hi(ctx, 0)
    u_in = psum_all(jnp.sum(jnp.where(lo0, slabx(u[0], 1) * ins, 0.0)),
                    ctx) / cnt
    ue = slabx(u_old[0], g.Nx - 1)
    new = ue - u_in * dt * (ue - slabx(u_old[0], g.Nx - 2))
    corr = psum_all(jnp.sum(jnp.where(hi0, new * ins, 0.0)), ctx) / cnt - u_in
    new = new - corr
    return u.at[0].set(jnp.where((ix == g.Nx - 1) & (ins > 0) & hi0, new,
                                 u[0]))


# ------------------------------------------------------------- flow ops
def div_flat(u: jax.Array, g: FlatGeom) -> jax.Array:
    """Cell-centered divergence (`div`, `src/Flow.jl:17-23`); ghosts/tail
    zero."""
    from . import pallas_flat as plf

    if plf.use_pallas_flat(u):
        return plf.div_k(u, g)
    s = (xshift(u[0], 1) - u[0]) + (fshift(u[1], g.Nz) - u[1]) \
        + (fshift(u[2], 1) - u[2])
    return zero_ghost_flat(s, g)


def cfl_flat(u: jax.Array, nu, g: FlatGeom, dt_max: float = 10.0, ctx=None):
    """`CFL` (`src/Flow.jl:234-244`) on flat fields; `pmax` under
    decomposition."""
    from .dist import pmax_all

    s = jnp.zeros(u.shape[1:], u.dtype)
    for i, st in ((0, None), (1, g.Nz), (2, 1)):
        up = xshift(u[i], 1) if st is None else fshift(u[i], st)
        s = s + jnp.maximum(0.0, up) + jnp.maximum(0.0, -u[i])
    m = pmax_all(jnp.max(zero_ghost_flat(s, g)), ctx)
    return jnp.minimum(jnp.asarray(dt_max, u.dtype), 1.0 / (m + 5 * nu))


def proj_correct_flat(u: jax.Array, x: jax.Array, L: jax.Array, g: FlatGeom
                      ) -> jax.Array:
    """Projection velocity correction ``u_i -= L_i ∂_i x``
    (`mom_project!`, `src/Flow.jl:227-231`)."""
    comps = []
    for i, st in ((0, None), (1, g.Nz), (2, 1)):
        xm = xshift(x, -1) if st is None else fshift(x, -st)
        comps.append(u[i] - zero_ghost_flat(L[i] * (x - xm), g))
    return jnp.stack(comps)


# ---------------------------------------------------------- Poisson ops
def set_diag_flat(L: jax.Array, g: FlatGeom):
    """Diagonal + guarded inverse (`Poisson.jl:43-55`) on flat coefficients.
    The +e_i face reads come from L's ghost planes, which carry the periodic/
    boundary structure from the 3D `bc_vector` applied before flattening."""
    d = -(L[0] + xshift(L[0], 1) + L[1] + fshift(L[1], g.Nz)
          + L[2] + fshift(L[2], 1))
    d = zero_ghost_flat(d, g)
    iD = jnp.where(d == 0, jnp.zeros_like(d), 1.0 / jnp.where(d == 0, 1.0, d))
    return d, iD


def mult_flat(L: jax.Array, D: jax.Array, x: jax.Array, g: FlatGeom,
              perdir: tuple[int, ...] = (), ctx=None) -> jax.Array:
    """A·x (`mult`, `Poisson.jl:63-76`); ghosts/tail zero.  x's ghost planes
    are refreshed first (`perBC!(x)`, `Poisson.jl:65`; ring halos under
    x-decomposition) — with valid ghosts the kernel path covers periodic and
    distributed configs unchanged."""
    from . import pallas_flat as plf

    x = sync_ghost_flat(x, perdir, g, ctx)
    if plf.use_pallas_flat(x):
        return plf.mult_k(x, L, D, g)
    return _mult_synced(L, D, x, g)


def residual_flat(L, D, iD, x, z, g: FlatGeom,
                  perdir: tuple[int, ...] = (), ctx=None) -> jax.Array:
    """r = z − A·x with the null-space fixes (`Poisson.jl:92-98`)."""
    r = jnp.where(iD == 0, 0.0, z - mult_flat(L, D, x, g, perdir, ctx))
    return null_space_fix(zero_ghost_flat(r, g), g, ctx)


def null_space_fix(r: jax.Array, g: FlatGeom, ctx=None) -> jax.Array:
    """The mean-subtraction null-space fix of `residual!`
    (`Poisson.jl:92-98`) on a raw residual whose ghosts/dead-cell entries are
    already zero (`residual_flat`)."""
    from .dist import psum_all

    n = _global_n(g, ctx)
    s = psum_all(jnp.sum(r), ctx) / n
    eps2 = 2 * jnp.finfo(r.dtype).eps
    return r - jnp.where(jnp.abs(s) <= eps2, 0.0, s) * inside_mask_flat(g, r.shape, r.dtype)


def _global_n(g: FlatGeom, ctx) -> int:
    k = 1 if ctx is None else ctx.sizes[0]
    return (g.Nx - 2) * k * (g.Ny - 2) * (g.Nz - 2)


def norms_flat(r: jax.Array, ctx=None):
    """(L₁, L∞) of a residual whose ghosts/dead tail are zero (`L₁`/`L∞`,
    `Poisson.jl:188-191`), globally reduced under decomposition."""
    from .dist import pmax_all, psum_all

    a = jnp.abs(r)
    return psum_all(jnp.sum(a), ctx), pmax_all(jnp.max(a), ctx)


def interior_mean_flat(x: jax.Array, g: FlatGeom, ctx=None):
    """Mean over global interior cells (the null-space subtraction point of
    `residual!`, `Poisson.jl:92-98`)."""
    from .dist import psum_all

    return psum_all(jnp.sum(zero_ghost_flat(x, g)), ctx) / _global_n(g, ctx)


def increment_flat(L, D, x, r, eps, omega, g: FlatGeom,
                   perdir: tuple[int, ...] = (), ctx=None):
    """x += ω·eps, r −= ω·A·eps (`increment!`, `Poisson.jl:100-104`)."""
    from . import pallas_flat as plf

    eps = sync_ghost_flat(eps, perdir, g, ctx)
    if plf.use_pallas_flat(x):
        return plf.increment_k(x, r, eps, L, D, omega, g)
    r = r - omega * _mult_synced(L, D, eps, g)
    x = x + omega * zero_ghost_flat(eps, g)
    return x, r


def _mult_synced(L, D, x, g: FlatGeom) -> jax.Array:
    """A·x assuming x's ghosts already hold the right values (jnp path)."""
    s = x * D
    for i, st in ((0, None), (1, g.Nz), (2, 1)):
        if st is None:
            s = s + xshift(x, -1) * L[i] + xshift(x, 1) * xshift(L[i], 1)
        else:
            s = s + fshift(x, -st) * L[i] + fshift(x, st) * fshift(L[i], st)
    return zero_ghost_flat(s, g)


def jacobi_flat(L, D, iD, x, r, g: FlatGeom, it: int = 1, omega=1.0,
                perdir: tuple[int, ...] = (), ctx=None, mp: bool = False):
    """Jacobi smoother (`Jacobi!`, `Poisson.jl:111-114`).  ``mp``: bf16
    coefficient reads + correction on the kernel path (see
    `pallas_flat.gs_incr`)."""
    from . import pallas_flat as plf

    for _ in range(it):
        if plf.use_pallas_flat(x) and not perdir and ctx is None:
            x, r = plf.jacobi_incr(x, r, L, D, iD, omega, g, mp)
        else:
            eps = zero_ghost_flat(r * iD, g)
            x, r = increment_flat(L, D, x, r, eps, omega, g, perdir, ctx)
    return x, r


def gauss_seidel_rb_flat(L, D, iD, x, r, g: FlatGeom, it: int = 4, omega=1.0,
                         perdir: tuple[int, ...] = (), ctx=None,
                         mp: bool = False):
    """Red-black Gauss-Seidel + increment (`GaussSeidelRB!`,
    `Poisson.jl:124-148`): the k-plane coloring is the index-sum
    checkerboard; each half-sweep is a masked whole-plane update.  Under
    periodic directions / x-decomposition the correction's ghost planes are
    refreshed before every sweep (`perBC!(p.ϵ)`, `Poisson.jl:143`; ring halo
    per color like the 3D dist path), and the checkerboard parity carries the
    shard's global x offset."""
    from . import pallas_flat as plf

    Dim = 3
    colors = [(1 - Dim - k0) % 2 for k0 in range(1, it + 1)]
    if plf.use_pallas_flat(x) and not perdir and ctx is None:
        return plf.gs_incr(x, r, L, D, iD, colors, omega, g, mp)
    yv, zv, insf = yz_planes(g, x.dtype)
    ix = _x_iota(x)
    par = (ix + x_parity(ctx, g) + yv + zv) % 2
    ins = (insf > 0) & (ix >= 1) & (ix <= g.Nx - 2)
    eps = zero_ghost_flat(r * iD, g)
    for color in colors:
        eps = sync_ghost_flat(eps, perdir, g, ctx)
        s = r
        for i, st in ((0, None), (1, g.Nz), (2, 1)):
            if st is None:
                s = s - (xshift(eps, -1) * L[i] + xshift(eps, 1) * xshift(L[i], 1))
            else:
                s = s - (fshift(eps, -st) * L[i] + fshift(eps, st) * fshift(L[i], st))
        eps = jnp.where((par == color) & ins, s * iD, eps)
    return increment_flat(L, D, x, r, eps, omega, g, perdir, ctx)
