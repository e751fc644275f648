"""Multigrid pressure solve with flat-layout levels.

Levels big enough to matter (≥ `_FLAT_MIN_CELLS` cells — for a 256³ problem
that is the 258³ fine level plus the 130³ and 66³ coarse levels, together
~99% of the V-cycle work) run on the (x, y·z) flat layout through the
`ops.pallas_flat` kernels; the remaining tiny levels reuse the plain 3D stack
of `ops.multigrid` unchanged.  Restriction/prolongation step through the 3D
layout at each transition (`to_flat`/`from_flat`) — one extra field pass per
level per V-cycle, a few % of the cycle cost.

Algorithm identical to `solver!` (`/root/reference/src/MultiLevelPoisson.jl:
88-128`): fine Jacobi pre-smooth, restrict, coarse V-cycle recursion,
prolongate+increment, fine red-black smooth, adaptive ω ∈ [0.2, 1], dual-norm
stop, plus the canonical zero-mean pressure gauge of `ops.multigrid.solve_mg`.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import multigrid as mg
from .flat import (FlatGeom, from_flat, gauss_seidel_rb_flat, geom_of,
                   increment_flat, inside_mask_flat, jacobi_flat, norms_flat,
                   residual_flat, set_diag_flat, to_flat)
from .poisson import PoissonLevel, coarse_solve

__all__ = ["FlatMG", "make_mg_flat", "update_mg_flat", "restack_band",
           "solve_mg_flat"]

_FLAT_MIN_CELLS = 100_000    # levels below this stay in the 3D layout


class FlatMG(NamedTuple):
    fine: PoissonLevel          # flat-layout (D,Nx,S,128) / (Nx,S,128) arrays
    mids: tuple                 # flat-layout PoissonLevels (levels 1..k)
    tail: tuple                 # 3D PoissonLevels (levels k+1..)
    # static data (masks, geoms) travels separately — pytree leaves only


@functools.lru_cache(maxsize=64)
def _level_geoms(g: FlatGeom, masks) -> tuple:
    """FlatGeom of every level, derived statically from the fine geom and the
    per-transition coarsening masks."""
    shapes = [g.shape3]
    for c in masks:
        shapes.append(mg.coarse_shape(shapes[-1], c))
    return tuple(geom_of(s) for s in shapes)


def _n_flat(g: FlatGeom, masks) -> int:
    geoms = _level_geoms(g, masks)
    n = 0
    for gl in geoms:
        if gl.Nx * gl.M < _FLAT_MIN_CELLS:
            break
        n += 1
    return max(1, n)


def make_mg_flat(mu0_3d: jax.Array, maxlevels: int = 10,
                 perdir: tuple[int, ...] = (),
                 min_cells: int = mg._MIN_COARSE_CELLS):
    """Build (flat_mg, masks, geom) from the fine 3D face coefficients.
    Defaults to the same coarse-level floor as `Simulation` (the flat engine
    IS the TPU flow path; the coarsest level gets the dense exact solve)."""
    levels, masks = mg.make_mg(mu0_3d, perdir, maxlevels, min_cells)
    g = geom_of(mu0_3d.shape[1:])
    return _flatten_stack(levels, g, masks), masks, g


def update_mg_flat(masks, mu0_3d: jax.Array, g: FlatGeom,
                   perdir: tuple[int, ...] = ()) -> FlatMG:
    """Re-restrict after a body re-measure (`update!`,
    `MultiLevelPoisson.jl:79-86`)."""
    levels = mg.update_mg(None, masks, mu0_3d, perdir)
    return _flatten_stack(levels, g, masks)


def _flatten_stack(levels, g: FlatGeom, masks=None, n_dist: int = 0) -> FlatMG:
    if masks is None:
        # legacy call signature: only the fine level flat
        nf = 1
    else:
        nf = _n_flat(g, tuple(masks))
    if n_dist:
        # distributed: flat levels never extend past the distributed prefix,
        # so the coarse-grid gather always lands on the flat -> tail boundary
        nf = max(1, min(nf, n_dist))
    geoms = [geom_of(lv.L.shape[1:]) for lv in levels[:nf]]

    def flat_level(lv, gl):
        L = to_flat(lv.L, gl)
        D, iD = set_diag_flat(L, gl)
        return PoissonLevel(L, D, iD)

    fine = flat_level(levels[0], geoms[0])
    mids = tuple(flat_level(lv, gl) for lv, gl in zip(levels[1:nf], geoms[1:]))
    return FlatMG(fine, mids, tuple(levels[nf:]))


def restack_band(prev: FlatMG, levels, g: FlatGeom, masks, box) -> FlatMG:
    """Band-limited `_flatten_stack` for the moving-body remeasure: after a
    banded measure the face coefficients L (= μ0) differ from ``prev`` only
    inside the band box, so only the box's x-slab rows are layout-converted
    per flat level (restriction shrinks the box level by level); D/iD are
    recomputed in full — a cheap fused shift pass (`set_diag_flat`) vs the
    layout repack that dominates `to_flat`.  Requires the ``prev`` invariant
    of `simulation._flat_moments`: prev was built by a full conversion (or a
    chain of band updates from one) and out-of-box rows carry the exact far
    field — guaranteed because the measure writes far-field values at every
    in-box out-of-band cell.  Tail (3D) levels are taken from ``levels``
    unchanged."""
    n_flat = 1 + len(prev.mids)
    geoms = [geom_of(lv.L.shape[1:]) for lv in levels[:n_flat]]
    lo, hi = int(box[0][0]), int(box[0][1])
    flat_levels = []
    for l, (lv, gl) in enumerate(zip(levels[:n_flat], geoms)):
        plv = prev.fine if l == 0 else prev.mids[l - 1]
        a = max(0, lo - 1)
        b = min(gl.Nx, hi + 1)
        if b <= a:
            flat_levels.append(plv)
        else:
            gsl = geom_of((b - a,) + gl.shape3[1:])
            L = plv.L.at[:, a:b].set(to_flat(lv.L[:, a:b], gsl))
            D, iD = set_diag_flat(L, gl)
            flat_levels.append(PoissonLevel(L, D, iD))
        if l < len(masks) and masks[l][0]:
            # padded fine row p -> coarse 1 + (p-1)//2; ±1 slack for the
            # face-coefficient halving at the box edge
            lo = max(1, (lo - 1) // 2)
            hi = hi // 2 + 2
    return FlatMG(flat_levels[0], tuple(flat_levels[1:]),
                  tuple(levels[n_flat:]))


def _level(fmg: FlatMG, l: int) -> PoissonLevel:
    return fmg.fine if l == 0 else fmg.mids[l - 1]


def _restrict_flat(r: jax.Array, gl: FlatGeom, mask, gc: FlatGeom):
    """Flat→flat residual restriction — algebraically identical to
    `to_flat(mg.restrict(from_flat(r), mask))` but the x pair-sum runs first,
    in flat layout (aligned row adds), so the layout-changing plane repack
    touches half the rows (`restrict`, `MultiLevelPoisson.jl:16-19,49`)."""
    a = r[1:-1]
    if mask[0]:
        a = a[0::2] + a[1::2]
    nxi = a.shape[0]
    a3 = a.reshape(nxi, gl.S * 128)[:, :gl.M].reshape(nxi, gl.Ny, gl.Nz)
    a3 = a3[:, 1:-1, 1:-1]
    if mask[1]:
        a3 = a3[:, 0::2] + a3[:, 1::2]
    if mask[2]:
        a3 = a3[:, :, 0::2] + a3[:, :, 1::2]
    a3 = jnp.pad(a3, ((0, 0), (1, 1), (1, 1)))
    f = a3.reshape(nxi, gc.M)
    f = jnp.pad(f, ((1, 1), (0, gc.S * 128 - gc.M)))
    return f.reshape(gc.Nx, gc.S, 128)


def _prolong_flat(xc: jax.Array, gc: FlatGeom, mask, gl: FlatGeom):
    """Flat→flat injection prolongation — identical to
    `to_flat(mg.prolongate(from_flat(xc), mask))` with the in-plane expansion
    done at the coarse x-count and the x doubling done last, on the flat
    layout (aligned row repeat), halving the repack traffic (`prolongate!`,
    `MultiLevelPoisson.jl:8,50`)."""
    c3 = xc.reshape(gc.Nx, gc.S * 128)[:, :gc.M].reshape(gc.shape3)
    a = c3[1:-1, 1:-1, 1:-1]
    if mask[1]:
        a = jnp.repeat(a, 2, axis=1)
    if mask[2]:
        a = jnp.repeat(a, 2, axis=2)
    a = jnp.pad(a, ((0, 0), (1, 1), (1, 1)))
    nxi = a.shape[0]
    f = a.reshape(nxi, gl.M)
    f = jnp.pad(f, ((0, 0), (0, gl.S * 128 - gl.M))).reshape(nxi, gl.S, 128)
    if mask[0]:
        f = jnp.repeat(f, 2, axis=0)
    return jnp.pad(f, ((1, 1), (0, 0), (0, 0)))


def _v_cycle_flat(fmg: FlatMG, masks, x, r, omega, g: FlatGeom,
                  smooth_it: int = 4, l: int = 0,
                  perdir: tuple[int, ...] = (), ctx=None, ctx3=None,
                  n_dist: int = 0, mp: bool = False,
                  defer_fine_inc: bool = False, presmooth: bool = True):
    """One V-cycle level step (`Vcycle!`, `MultiLevelPoisson.jl:88-101`) with
    levels < len(mids)+1 in flat layout.

    Distributed (x-decomposed) mode: ``ctx`` is the 1-dim flat ctx of the
    local blocks, ``ctx3`` the matching 3-dim ctx for the gather/slice at the
    coarse-grid transition.  Flat levels are capped at ``n_dist`` by the
    builder, so the all-gather transition always lands on the flat→tail
    boundary; a deeper distributed tail recurses into `mg.v_cycle`'s own
    distributed logic with the level-local ``n_dist`` offset."""
    from .dist import gather_scalar, slice_local

    geoms = _level_geoms(g, tuple(masks))
    lv, gl = _level(fmg, l), geoms[l]
    n_flat = 1 + len(fmg.mids)
    n_levels = n_flat + len(fmg.tail)

    if presmooth or l > 0:
        x, r = jacobi_flat(lv.L, lv.D, lv.iD, x, r, gl, it=1, omega=1.0,
                           perdir=perdir, ctx=ctx, mp=mp)
    if l + 1 < n_flat:
        clv, gc = _level(fmg, l + 1), geoms[l + 1]
        rc = _restrict_flat(r, gl, masks[l], gc)
        xc = jnp.zeros_like(rc)
        if l + 2 < n_levels:
            xc, rc = _v_cycle_flat(fmg, masks, xc, rc, omega, g, smooth_it,
                                   l + 1, perdir, ctx, ctx3, n_dist, mp)
        xc, rc = gauss_seidel_rb_flat(clv.L, clv.D, clv.iD, xc, rc, gc,
                                      it=smooth_it, omega=omega, perdir=perdir,
                                      ctx=ctx, mp=mp)
        eps = _prolong_flat(xc, gc, masks[l], gl)
        if defer_fine_inc and l == 0:
            # caller fuses this increment with the fine smooth (`incr_gs`)
            return x, r, eps
        return increment_flat(lv.L, lv.D, x, r, eps, omega, gl, perdir, ctx)
    elif ctx is not None and l == n_dist - 1:
        # coarse-grid gather: restrict the gathered residual, run the
        # replicated tail, slice the correction back (`v_cycle` transition)
        rg = gather_scalar(from_flat(r, gl), ctx3)
        rc3 = mg.restrict(rg, masks[l])
        xc = jnp.zeros_like(rc3)
        if len(fmg.tail) > 1:
            xc, rc3 = mg.v_cycle(fmg.tail, masks[l + 1:], xc, rc3, omega,
                                 perdir, 0, smooth_it)
        xc, _ = coarse_solve(fmg.tail[0], xc, rc3, it=smooth_it,
                             omega=omega, perdir=perdir)
        eps3 = slice_local(mg.prolongate(xc, masks[l]), ctx3)
    else:
        rc3 = mg.restrict(from_flat(r, gl), masks[l])
        xc = jnp.zeros_like(rc3)
        sub3 = ctx3 if (ctx is not None and l + 1 < n_dist) else None
        nd_tail = max(0, n_dist - (l + 1)) if ctx is not None else 0
        if len(fmg.tail) > 1:
            xc, rc3 = mg.v_cycle(fmg.tail, masks[l + 1:], xc, rc3, omega,
                                 perdir, 0, smooth_it, sub3, nd_tail)
        xc, _ = coarse_solve(fmg.tail[0], xc, rc3, it=smooth_it,
                             omega=omega, perdir=perdir, ctx=sub3)
        eps3 = mg.prolongate(xc, masks[l])
    eps = to_flat(eps3, gl)
    if defer_fine_inc and l == 0:
        return x, r, eps
    return increment_flat(lv.L, lv.D, x, r, eps, omega, gl, perdir, ctx)


def solve_mg_flat(fmg: FlatMG, masks, x, z, g: FlatGeom, tol: float = 2e-3,
                  itmx: int = 32, smooth_it: int = 4,
                  perdir: tuple[int, ...] = (), ctx=None, ctx3=None,
                  n_dist: int = 0, fine_smooth_it: int = 0,
                  mp: bool = False,
                  fine_presmooth: bool = True) -> mg.MGSolveResult:
    """Flat multigrid solve; same iteration/stopping/gauge semantics as
    `ops.multigrid.solve_mg` (pure `lax.while_loop`, Pallas kernels in the
    body — the measured-fastest and cheapest-to-compile solver form).
    ``smooth_it`` matches the reference smoother tunable
    (`GaussSeidelRB!(p; it=4)`, `Poisson.jl:135-141`); both knobs come from
    `FlowCfg` — no environment reads at trace time.  ``ctx``/``ctx3``/
    ``n_dist`` select the x-decomposed variant (see `_v_cycle_flat`).
    ``mp``: mixed-precision smoothing (bf16 coefficients + correction
    cascade, f32 x/r — see `pallas_flat.gs_incr`); the entry residual,
    norms, stop criterion and gauge all stay f32.

    The fused tail's in-kernel (L1, Linf) accumulate per-lane then fold
    (`pallas_flat._fold8`), a different reduction order from `norms_flat` —
    near the tolerance the fused and sequential (or distributed) forms may
    therefore differ by one iteration; physics is unaffected (the dual-norm
    stop is the only consumer)."""
    from .flat import _global_n

    f = fmg.fine
    dtype = x.dtype
    r1tol = jnp.asarray((tol / 10.0) * _global_n(g, ctx), dtype)
    rinf_tol = jnp.asarray(tol, dtype)
    r = residual_flat(f.L, f.D, f.iD, x, z, g, perdir, ctx)
    r1, rinf = norms_flat(r, ctx)
    omega = jnp.asarray(1.0, dtype)
    stats = jnp.zeros((itmx + 1, 3), dtype).at[0].set(jnp.stack([rinf, r1, omega]))

    def cond(c):
        x, r, r1, rinf, omega, n, stats = c
        conv = (r1 < r1tol) & (rinf < rinf_tol)
        return (n < itmx) & ((n == 0) | ~conv)

    import os as _os

    from . import pallas_flat as plf

    # fused V-cycle tail: the fine-level increment and the fine RB smooth
    # run as ONE window pass (`pallas_flat.incr_gs`) — saves an x/r HBM
    # round trip per solver iteration; numerics identical to the
    # sequential pair (WLTPU_FUSED_TAIL=0 restores it)
    fuse_tail = (plf.use_pallas_flat(x) and not perdir and ctx is None
                 and _os.environ.get("WLTPU_FUSED_TAIL", "1") == "1")
    it_fine = fine_smooth_it or smooth_it
    colors_fine = [(1 - 3 - k0) % 2 for k0 in range(1, it_fine + 1)]

    def body(c):
        x, r, r1, rinf, omega, n, stats = c
        if fuse_tail:
            x, r, eps = _v_cycle_flat(fmg, masks, x, r, omega, g, smooth_it,
                                      perdir=perdir, ctx=ctx, ctx3=ctx3,
                                      n_dist=n_dist, mp=mp,
                                      defer_fine_inc=True,
                                      presmooth=fine_presmooth)
            # in-kernel norms: the stop-criterion (L₁, L∞) accumulate inside
            # the fused tail pass — no separate full-r `norms_flat` read
            x, r, (rnew, rinf) = plf.incr_gs(x, r, eps, f.L, f.D, f.iD,
                                             colors_fine, omega, g, mp=mp,
                                             want_norms=True)
        else:
            x, r = _v_cycle_flat(fmg, masks, x, r, omega, g, smooth_it,
                                 perdir=perdir, ctx=ctx, ctx3=ctx3,
                                 n_dist=n_dist, mp=mp,
                                 presmooth=fine_presmooth)
            x, r = gauss_seidel_rb_flat(f.L, f.D, f.iD, x, r, g,
                                        it=it_fine, omega=omega,
                                        perdir=perdir, ctx=ctx, mp=mp)
            rnew, rinf = norms_flat(r, ctx)
        omega = jnp.where(rnew >= r1,
                          jnp.maximum(jnp.asarray(0.2, dtype), 0.9 * omega),
                          jnp.minimum(jnp.asarray(1.0, dtype), 1.02 * omega))
        n = n + 1
        stats = jax.lax.dynamic_update_slice(
            stats, jnp.stack([rinf, rnew, omega])[None],
            (n, jnp.asarray(0, n.dtype)))
        return (x, r, rnew, rinf, omega, n, stats)

    carry = (x, r, r1, rinf, omega, jnp.asarray(0, jnp.int32), stats)
    carry = jax.lax.while_loop(cond, body, carry)
    x, r, r1, rinf, omega, n, stats = carry
    # canonical pressure gauge: zero mean on active cells, zero at dead
    # cells, ghosts kept (see `ops.multigrid.canonical_gauge`)
    from .dist import psum_all
    from .flat import sync_ghost_flat

    ins = inside_mask_flat(g, x.shape, x.dtype)
    act = jnp.where(f.iD != 0, ins, 0.0)
    m = psum_all(jnp.sum(x * act), ctx) / jnp.maximum(
        psum_all(jnp.sum(act), ctx), 1.0)
    x = jnp.where(act > 0, x - m, x * (1.0 - ins))
    return mg.MGSolveResult(sync_ghost_flat(x, perdir, g, ctx), r, n, stats)
