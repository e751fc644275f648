"""Matrix-free variable-coefficient Poisson operator and smoothers.

TPU-native port of `/root/reference/src/Poisson.jl`.  The system is

    A x = [L + D + L'] x = z,   D[I] = -sum_i (L[I,i] + L[I+e_i,i])

with face coefficients ``L`` of shape ``(D, *Ng)`` (aliased to the BDIM moment
``mu0`` on the fine level, `src/WaterLily.jl:97`).  Every op is a pure function
over full padded arrays; residual/increment state lives in the caller.  All
stencils are roll-based shifts that XLA fuses into single VPU loops (the
red-black sweep is a masked two-color update — the coloring trick of
`Poisson.jl:124-148` expressed as a checkerboard select).

A level is the NamedTuple ``PoissonLevel(L, D, iD)``; ``x``/``r``/``eps`` are
transient arrays threaded by the solvers.
"""
from __future__ import annotations

import math
import os
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .bc import per_bc
from .dist import (global_inside_count, parity_shift, pmax_all, psum_all,
                   sync_scalar)
from .grid import index_sum_parity, interior, grow, shift

__all__ = [
    "PoissonLevel", "make_level", "set_diag", "mult", "residual", "increment",
    "jacobi", "gauss_seidel_rb", "pcg", "norms", "solve", "l1n_tol",
    "dense_pinv", "coarse_solve",
]


class PoissonLevel(NamedTuple):
    L: jax.Array    # (D, *Ng) lower-face coefficients
    D: jax.Array    # (*Ng) diagonal, 0 in ghosts
    iD: jax.Array   # (*Ng) 1/diagonal, 0 where D == 0
    Ainv: jax.Array | None = None   # dense pseudo-inverse over interior
                                    # cells — set on the COARSEST level only
                                    # (exact one-matmul coarse solve; see
                                    # `dense_pinv`/`coarse_solve`)


def _zero_ghost(a: jax.Array) -> jax.Array:
    """Zero the ghost layer of a scalar field.  Implemented as an iota-mask
    multiply so XLA fuses it into the producing stencil loop (a slice+pad
    would materialize an intermediate)."""
    m = None
    for d in range(a.ndim):
        i = jax.lax.broadcasted_iota(jnp.int32, a.shape, d)
        md = (i > 0) & (i < a.shape[d] - 1)
        m = md if m is None else (m & md)
    return jnp.where(m, a, 0.0)


def set_diag(L: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Diagonal and its guarded inverse (`Poisson.jl:43-55`)."""
    Dim = L.shape[0]
    d = jnp.zeros(L.shape[1:], L.dtype)
    for i in range(Dim):
        d = d - (L[i] + shift(L[i], i, 1))
    d = _zero_ghost(d)
    iD = jnp.where(d == 0, jnp.zeros_like(d), 1.0 / jnp.where(d == 0, 1.0, d))
    return d, iD


def make_level(L: jax.Array) -> PoissonLevel:
    """PoissonLevel from face coefficients: derive the operator diagonal and
    its guarded inverse (`Poisson` constructor, `Poisson.jl:43-55`)."""
    d, iD = set_diag(L)
    return PoissonLevel(L, d, iD)


def _mult_raw(p: PoissonLevel, x: jax.Array, ctx=None) -> jax.Array:
    """A·x on the interior assuming ghosts of ``x`` are already consistent
    (`mult`, `Poisson.jl:70-76`).  Routes big 3D single-device fields through
    the fused Pallas kernel."""
    from . import pallas3d as pl3

    if x.ndim == 3 and pl3.use_pallas(x, ctx):
        return pl3.mult3d(x, p.L, p.D)
    s = x * p.D
    for i in range(p.L.shape[0]):
        s = s + shift(x, i, -1) * p.L[i] + shift(x, i, 1) * shift(p.L[i], i, 1)
    return _zero_ghost(s)


def mult(p: PoissonLevel, x: jax.Array, perdir: tuple[int, ...] = (),
         ctx=None) -> jax.Array:
    """A·x with periodic/halo ghosts refreshed first (`mult!`,
    `Poisson.jl:63-68`).  Ghost entries of the result are zero."""
    return _mult_raw(p, sync_scalar(x, ctx, perdir), ctx)


def residual(p: PoissonLevel, x: jax.Array, z: jax.Array,
             perdir: tuple[int, ...] = (), ctx=None) -> jax.Array:
    """r = z - A·x with the two null-space fixes of `Poisson.jl:92-98`:
    r = 0 where iD == 0 (local satisfiability) and mean(r) subtracted
    (global satisfiability; a psum under sharding)."""
    r = jnp.where(p.iD == 0, 0.0, z - mult(p, x, perdir, ctx))
    r = _zero_ghost(r)
    n_inside = global_inside_count(ctx, x.shape)
    s = psum_all(jnp.sum(r), ctx) / n_inside
    eps2 = 2 * jnp.finfo(x.dtype).eps
    r = r - jnp.where(jnp.abs(s) <= eps2, 0.0, s) * _inside_ones(x)
    return r


def _inside_ones(x: jax.Array) -> jax.Array:
    return _zero_ghost(jnp.ones_like(x))


def increment(p: PoissonLevel, x: jax.Array, r: jax.Array, eps: jax.Array,
              omega=1.0, perdir: tuple[int, ...] = (), ctx=None):
    """x += ω·eps, r -= ω·A·eps on the interior (`increment!`,
    `Poisson.jl:100-104`)."""
    eps = sync_scalar(eps, ctx, perdir)
    r = r - omega * _mult_raw(p, eps, ctx)
    x = x + omega * _zero_ghost(eps)
    return x, r


def jacobi(p: PoissonLevel, x: jax.Array, r: jax.Array, it: int = 1, omega=1.0,
           perdir: tuple[int, ...] = (), ctx=None):
    """Jacobi smoother (`Jacobi!`, `Poisson.jl:111-114`)."""
    from . import pallas3d as pl3

    for _ in range(it):
        if x.ndim == 3 and pl3.use_pallas(x, ctx) and not perdir:
            x, r = pl3.jacobi_incr3d(x, r, p.L, p.D, p.iD, omega)
            continue
        eps = _zero_ghost(r * p.iD)
        x, r = increment(p, x, r, eps, omega, perdir, ctx)
    return x, r


def _gauss(p: PoissonLevel, r: jax.Array, eps: jax.Array) -> jax.Array:
    """Elementwise Gauss-Seidel update value (`gauss`, `Poisson.jl:116-123`)."""
    s = r
    for i in range(p.L.shape[0]):
        s = s - (shift(eps, i, -1) * p.L[i] + shift(eps, i, 1) * shift(p.L[i], i, 1))
    return s * p.iD


def gauss_seidel_rb(p: PoissonLevel, x: jax.Array, r: jax.Array, it: int = 4,
                    omega=1.0, perdir: tuple[int, ...] = (), ctx=None):
    """Red-black Gauss-Seidel smoother (`GaussSeidelRB!`, `Poisson.jl:141-148`).

    The reference's k-plane coloring (`gauss_rb`/`half_rangek`,
    `Poisson.jl:124-132`) updates, on sweep ``k0``, exactly the interior cells
    whose 1-based index sum is of parity ``(k0+1) % 2``; here that is a
    checkerboard-masked whole-array update — embarrassingly parallel by
    construction, which is why the reference chose RB in the first place.
    """
    from . import pallas3d as pl3

    Dim = p.L.shape[0]
    if Dim == 3 and pl3.use_pallas(x, ctx) and not perdir:
        # single communication-avoiding kernel: sweeps + increment fused
        colors = [(1 - Dim - k0) % 2 for k0 in range(1, it + 1)]
        return pl3.gs_incr3d(x, r, p.L, p.D, p.iD, colors, omega)
    eps = sync_scalar(_zero_ghost(r * p.iD), ctx, perdir)
    if Dim == 3 and pl3.use_pallas(x, ctx):
        # fused sweep kernels; arrays stay tail-padded across the sweeps
        colors = [(1 - Dim - k0) % 2 for k0 in range(1, it + 1)]
        eps = pl3.gauss_sweeps3d(eps, r, p.L, p.iD, colors, perdir)
        return increment(p, x, r, eps, omega, perdir, ctx)
    parity = index_sum_parity(x.shape)           # sum of 0-based indices % 2
    pshift = parity_shift(ctx, x.shape)          # global checkerboard offset
    inside = _inside_ones(x) > 0
    for k0 in range(1, it + 1):
        color = ((parity + pshift + Dim + k0) % 2 == 1) & inside
        eps = jnp.where(color, _gauss(p, r, eps), eps)
        if k0 < it:
            # refresh halos so each color sweep sees the fresh opposite color
            # (single-device ghosts are read through face coefficients the BC
            # zeroed, so this is a no-op there except for periodic wrap)
            eps = sync_scalar(eps, ctx, perdir)
    return increment(p, x, r, eps, omega, perdir, ctx)


# interior-cell cap for the dense coarse solve (the min_cells=64 floor
# bounds a floored coarsest at 2^D·64 ≤ 512 cells); raise it together with
# WLTPU_MIN_COARSE_CELLS to solve exactly at a larger level
_DENSE_COARSE_MAX = int(os.environ.get("WLTPU_DENSE_COARSE_MAX", "1024"))


def dense_pinv(p: PoissonLevel, perdir: tuple[int, ...] = ()) -> PoissonLevel:
    """Attach the dense pseudo-inverse of the level operator over its
    interior cells (the MXU-native exact coarse-grid solve; classic MG
    practice the reference approximates with recursion + GS sweeps,
    `MultiLevelPoisson.jl:96-99`).  A is assembled by applying the matrix-
    free stencil to the identity basis; `pinv` handles both null spaces
    (the all-Neumann constant mode and BDIM dead cells, whose rows/cols are
    zero).  The pinv is `stop_gradient`-ed: the solve's DERIVATIVE quality
    comes from residual convergence (implicit JVP / lagged tangents), not
    from differentiating the solver's internals — and the SVD JVP is
    undefined at A's structural zero singular values."""
    sp = p.D.shape
    n = math.prod(d - 2 for d in sp)
    if n > _DENSE_COARSE_MAX:
        return p
    dtype = p.D.dtype
    eye = jnp.eye(n, dtype=dtype)

    def col(e):
        x = grow(e.reshape(tuple(d - 2 for d in sp)))
        x = sync_scalar(x, None, perdir)
        s = x * p.D
        for i in range(p.L.shape[0]):
            s = s + shift(x, i, -1) * p.L[i] \
                + shift(x, i, 1) * shift(p.L[i], i, 1)
        return interior(s).reshape(-1)

    A = jax.vmap(col)(eye)       # symmetric, so row/col order is immaterial
    Ainv = jax.lax.stop_gradient(jnp.linalg.pinv(A))
    return PoissonLevel(p.L, p.D, p.iD, Ainv)


def coarse_solve(p: PoissonLevel, x: jax.Array, r: jax.Array, it: int = 4,
                 omega=1.0, perdir: tuple[int, ...] = (), ctx=None):
    """Coarsest-level solve: the exact dense correction ``eps = A⁺ r`` when
    the level carries `Ainv` (one matmul — no launch-latency-bound recursion
    into sub-100-cell levels), else the reference's red-black GS sweeps."""
    if p.Ainv is None:
        return gauss_seidel_rb(p, x, r, it, omega, perdir, ctx)
    sp = r.shape
    # matvec as broadcast-multiply + axis-reduce, NOT dot_general: the GEMM
    # reduction split depends on the executable context (threads/partitions),
    # so a dot here breaks bitwise parity between the single-device and
    # shard_map-replicated solves.  At this size (≤1024²) the VPU reduce is
    # free; determinism is the point.
    ri = interior(r).reshape(-1)
    eps = grow(jnp.sum(p.Ainv * ri[None, :], axis=1).reshape(
        tuple(d - 2 for d in sp)))
    # full correction (exact solve): ω-relaxation would only undo it
    return increment(p, x, r, eps, 1.0, perdir, ctx)


def _pdot(a: jax.Array, b: jax.Array) -> jax.Array:
    """Interior dot product (`perdot`, `Poisson.jl:153-158`).  Ghosts of the
    solver residual/source are zero by construction, so the interior dot is
    also the full dot for the non-periodic case."""
    return jnp.sum(interior(a) * interior(b))


def pcg(p: PoissonLevel, x: jax.Array, r: jax.Array, it: int = 6,
        perdir: tuple[int, ...] = (), ctx=None):
    """Jacobi-preconditioned conjugate-gradient smoother with the reference's
    early-exit guards (`pcg!`, `Poisson.jl:166-186`), restructured as a
    `lax.while_loop` so it can run inside a jitted solver."""
    dtype = x.dtype
    tiny = 10 * jnp.finfo(dtype).eps
    z0 = _zero_ghost(r * p.iD)
    rho0 = psum_all(jnp.sum(r * z0), ctx)
    go0 = jnp.abs(rho0) >= tiny

    def cond(c):
        return c[-1]

    def body(c):
        x, r, eps, rho, i, _ = c
        epsb = sync_scalar(eps, ctx, perdir)
        zz = _mult_raw(p, epsb, ctx)
        alpha = rho / psum_all(_pdot(zz, epsb), ctx)
        bad = (jnp.abs(alpha) < 1e-2) | (jnp.abs(alpha) > 1e2)  # alpha ~ O(1)
        a = jnp.where(bad, 0.0, alpha)
        x = x + a * _zero_ghost(epsb)
        r = r - a * zz
        z2 = _zero_ghost(r * p.iD)
        rho2 = psum_all(jnp.sum(r * z2), ctx)
        go = (~bad) & (i + 1 < it) & (jnp.abs(rho2) >= tiny)
        eps2 = _zero_ghost((rho2 / rho) * epsb + z2)
        eps = jnp.where(go, eps2, epsb)
        return (x, r, eps, rho2, i + 1, go)

    x, r, *_ = jax.lax.while_loop(cond, body, (x, r, z0, rho0, 0, go0))
    return x, r


def norms(r: jax.Array, ctx=None):
    """(L1, Linf) of the residual; ghosts are zero so full-array reductions
    equal the interior ones (`Poisson.jl:188-191`).  psum/pmax under
    sharding."""
    a = jnp.abs(r)
    return psum_all(jnp.sum(a), ctx), pmax_all(jnp.max(a), ctx)


def l1n_tol(shape: tuple[int, ...], tol: float) -> float:
    """Mean-residual tolerance: L1 < (tol/10)·N_inside (`Poisson.jl:194`)."""
    return (tol / 10.0) * math.prod(n - 2 for n in shape)


def solve(p: PoissonLevel, x: jax.Array, z: jax.Array, tol: float = 2e-3,
          itmx: int = 1000, perdir: tuple[int, ...] = (), ctx=None):
    """Standalone PCG Poisson solver (`solver!`, `Poisson.jl:212-223`).

    Returns ``(x, r, n_iters, stats)`` where ``stats[k] = (r_inf, r_1)`` after
    iteration ``k`` (row 0 = initial residual) — the device-resident analog of
    the `@log` pressure-solver channel (`src/core.jl:4-24`).
    """
    dtype = x.dtype
    r1tol = jnp.asarray((tol / 10.0) * global_inside_count(ctx, x.shape), dtype)
    rinf_tol = jnp.asarray(tol, dtype)
    r = residual(p, x, z, perdir, ctx)
    r1, rinf = norms(r, ctx)
    stats = jnp.zeros((itmx + 1, 2), dtype).at[0].set(jnp.stack([rinf, r1]))

    def cond(c):
        x, r, r1, rinf, n, stats = c
        # do-while like the reference `solver!` (`Poisson.jl:215-221`)
        return (n < itmx) & ((n == 0) | ~((r1 < r1tol) & (rinf < rinf_tol)))

    def body(c):
        x, r, r1, rinf, n, stats = c
        x, r = pcg(p, x, r, it=6, perdir=perdir, ctx=ctx)
        r1, rinf = norms(r, ctx)
        n = n + 1
        stats = jax.lax.dynamic_update_slice(stats, jnp.stack([rinf, r1])[None], (n, jnp.asarray(0, n.dtype)))
        return (x, r, r1, rinf, n, stats)

    x, r, r1, rinf, n, stats = jax.lax.while_loop(
        cond, body, (x, r, r1, rinf, jnp.asarray(0, jnp.int32), stats))
    return sync_scalar(x, ctx, perdir), r, n, stats
