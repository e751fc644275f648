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
                   perdir: tuple[int, ...] = (), t=0.0) -> jax.Array:
    """`BC!` (`src/core.jl:199-224`) on a flat vector field (D, Nx, S, 128):
    Dirichlet on the normal component (ghost slab and first interior face),
    tangential ghosts copy the first interior value (the constant-spec
    cancellation of `ops.bc.bc_vector`), periodic wrap for directions in
    ``perdir``, and ``save_exit`` preserves the x-high exit plane of u_x for
    `exitBC!`.  The (i, j) update order matches the 3D path so corner ghosts
    agree.  Callable ``ubc(i, x, t)`` specs are evaluated on the 3D face grid
    and flattened (the constant path stays kernel-eligible)."""
    from . import pallas_flat as plf

    if plf.use_pallas_flat(u) and not perdir and not callable(ubc):
        return plf.bc_k(u, ubc, g, save_exit)
    D = u.shape[0]
    yv, zv, _ = yz_planes(g, u.dtype)
    if callable(ubc):
        from .bc import bc_field

        Us = [to_flat(bc_field(ubc, i, g.shape3, t, u.dtype), g)
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
            if j == 0:
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


def exit_bc_flat(u: jax.Array, u_old: jax.Array, dt, g: FlatGeom) -> jax.Array:
    """`exitBC!` (`src/core.jl:226-233`): 1-D convective outlet on the x-high
    plane of u_x plus the global mass-flux correction, on flat fields."""
    _, _, ins = yz_planes(g, u.dtype)
    cnt = (g.Ny - 2) * (g.Nz - 2)
    u_in = jnp.sum(slabx(u[0], 1) * ins) / cnt
    ue = slabx(u_old[0], g.Nx - 1)
    new = ue - u_in * dt * (ue - slabx(u_old[0], g.Nx - 2))
    new = new - (jnp.sum(new * ins) / cnt - u_in)
    ix = _x_iota(u[0])
    return u.at[0].set(jnp.where((ix == g.Nx - 1) & (ins > 0), new, u[0]))


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


def cfl_flat(u: jax.Array, nu, g: FlatGeom, dt_max: float = 10.0):
    """`CFL` (`src/Flow.jl:234-244`) on flat fields."""
    s = jnp.zeros(u.shape[1:], u.dtype)
    for i, st in ((0, None), (1, g.Nz), (2, 1)):
        up = xshift(u[i], 1) if st is None else fshift(u[i], st)
        s = s + jnp.maximum(0.0, up) + jnp.maximum(0.0, -u[i])
    m = jnp.max(zero_ghost_flat(s, g))
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
              perdir: tuple[int, ...] = ()) -> jax.Array:
    """A·x (`mult`, `Poisson.jl:63-76`); ghosts/tail zero.  ``perdir`` wraps
    x's ghost planes first (`perBC!(x)`, `Poisson.jl:65`)."""
    from . import pallas_flat as plf

    x = per_bc_flat(x, perdir, g)
    if plf.use_pallas_flat(x):
        return plf.mult_k(x, L, D, g)
    s = x * D
    for i, st in ((0, None), (1, g.Nz), (2, 1)):
        if st is None:
            s = s + xshift(x, -1) * L[i] + xshift(x, 1) * xshift(L[i], 1)
        else:
            s = s + fshift(x, -st) * L[i] + fshift(x, st) * fshift(L[i], st)
    return zero_ghost_flat(s, g)


def residual_flat(L, D, iD, x, z, g: FlatGeom,
                  perdir: tuple[int, ...] = ()) -> jax.Array:
    """r = z − A·x with the null-space fixes (`Poisson.jl:92-98`)."""
    r = jnp.where(iD == 0, 0.0, z - mult_flat(L, D, x, g, perdir))
    r = zero_ghost_flat(r, g)
    n = (g.Nx - 2) * (g.Ny - 2) * (g.Nz - 2)
    s = jnp.sum(r) / n
    eps2 = 2 * jnp.finfo(x.dtype).eps
    return r - jnp.where(jnp.abs(s) <= eps2, 0.0, s) * inside_mask_flat(g, r.shape, r.dtype)


def norms_flat(r: jax.Array):
    a = jnp.abs(r)
    return jnp.sum(a), jnp.max(a)


def interior_mean_flat(x: jax.Array, g: FlatGeom):
    n = (g.Nx - 2) * (g.Ny - 2) * (g.Nz - 2)
    return jnp.sum(zero_ghost_flat(x, g)) / n


def increment_flat(L, D, x, r, eps, omega, g: FlatGeom,
                   perdir: tuple[int, ...] = ()):
    """x += ω·eps, r −= ω·A·eps (`increment!`, `Poisson.jl:100-104`)."""
    from . import pallas_flat as plf

    if plf.use_pallas_flat(x) and not perdir:
        return plf.increment_k(x, r, eps, L, D, omega, g)
    r = r - omega * mult_flat(L, D, eps, g, perdir)
    x = x + omega * zero_ghost_flat(eps, g)
    return x, r


def jacobi_flat(L, D, iD, x, r, g: FlatGeom, it: int = 1, omega=1.0,
                perdir: tuple[int, ...] = ()):
    """Jacobi smoother (`Jacobi!`, `Poisson.jl:111-114`)."""
    from . import pallas_flat as plf

    for _ in range(it):
        if plf.use_pallas_flat(x) and not perdir:
            x, r = plf.jacobi_incr(x, r, L, D, iD, omega, g)
        else:
            eps = zero_ghost_flat(r * iD, g)
            x, r = increment_flat(L, D, x, r, eps, omega, g, perdir)
    return x, r


def gauss_seidel_rb_flat(L, D, iD, x, r, g: FlatGeom, it: int = 4, omega=1.0,
                         perdir: tuple[int, ...] = ()):
    """Red-black Gauss-Seidel + increment (`GaussSeidelRB!`,
    `Poisson.jl:124-148`): the k-plane coloring is the index-sum
    checkerboard; each half-sweep is a masked whole-plane update.  Under
    periodic directions the correction's ghost planes are re-wrapped before
    every sweep (`perBC!(p.ϵ)`, `Poisson.jl:143`), matching the 3D path."""
    from . import pallas_flat as plf

    Dim = 3
    colors = [(1 - Dim - k0) % 2 for k0 in range(1, it + 1)]
    if plf.use_pallas_flat(x) and not perdir:
        return plf.gs_incr(x, r, L, D, iD, colors, omega, g)
    yv, zv, insf = yz_planes(g, x.dtype)
    ix = _x_iota(x)
    par = (ix + yv + zv) % 2
    ins = (insf > 0) & (ix >= 1) & (ix <= g.Nx - 2)
    eps = zero_ghost_flat(r * iD, g)
    for color in colors:
        eps = per_bc_flat(eps, perdir, g)
        s = r
        for i, st in ((0, None), (1, g.Nz), (2, 1)):
            if st is None:
                s = s - (xshift(eps, -1) * L[i] + xshift(eps, 1) * xshift(L[i], 1))
            else:
                s = s - (fshift(eps, -st) * L[i] + fshift(eps, st) * fshift(L[i], st))
        eps = jnp.where((par == color) & ins, s * iD, eps)
    return increment_flat(L, D, x, r, eps, omega, g, perdir)
