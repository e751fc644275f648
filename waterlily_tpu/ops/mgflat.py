"""Multigrid pressure solve with a flat-layout fine level.

The fine level (≥ 85% of the V-cycle bandwidth) runs on the (x, y·z) flat
layout through the `ops.pallas_flat` kernels; coarser levels are ≤ 1/8 the
size and reuse the plain 3D stack of `ops.multigrid` unchanged.  Transitions
convert between layouts (`to_flat`/`from_flat`) — one extra fine-field pass
per V-cycle, ~5% of the cycle cost.

Algorithm identical to `solver!` (`/root/reference/src/MultiLevelPoisson.jl:
88-128`): fine Jacobi pre-smooth, restrict, coarse V-cycle recursion,
prolongate+increment, fine red-black smooth, adaptive ω ∈ [0.2, 1], dual-norm
stop, plus the canonical zero-mean pressure gauge of `ops.multigrid.solve_mg`.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import multigrid as mg
from .flat import (FlatGeom, from_flat, gauss_seidel_rb_flat, geom_of,
                   increment_flat, interior_mean_flat, inside_mask_flat,
                   jacobi_flat, norms_flat, residual_flat, set_diag_flat,
                   to_flat)
from .poisson import PoissonLevel, gauss_seidel_rb

__all__ = ["FlatMG", "make_mg_flat", "update_mg_flat", "solve_mg_flat"]


class FlatMG(NamedTuple):
    fine: PoissonLevel          # flat-layout (D,Nx,S,128) / (Nx,S,128) arrays
    tail: tuple                 # 3D PoissonLevels (levels 1..)
    # static data (masks, geom) travels separately — pytree leaves above only


def make_mg_flat(mu0_3d: jax.Array, maxlevels: int = 10):
    """Build (flat_mg, masks, geom) from the fine 3D face coefficients."""
    levels, masks = mg.make_mg(mu0_3d, (), maxlevels)
    g = geom_of(mu0_3d.shape[1:])
    return _flatten_stack(levels, g), masks, g


def update_mg_flat(masks, mu0_3d: jax.Array, g: FlatGeom) -> FlatMG:
    """Re-restrict after a body re-measure (`update!`,
    `MultiLevelPoisson.jl:79-86`)."""
    levels = mg.update_mg(None, masks, mu0_3d, ())
    return _flatten_stack(levels, g)


def _flatten_stack(levels, g: FlatGeom) -> FlatMG:
    L = to_flat(levels[0].L, g)
    D, iD = set_diag_flat(L, g)
    return FlatMG(PoissonLevel(L, D, iD), tuple(levels[1:]))


def _v_cycle_flat(fmg: FlatMG, masks, x, r, omega, g: FlatGeom,
                  smooth_it: int = 4):
    """One V-cycle with the flat fine level (`Vcycle!`,
    `MultiLevelPoisson.jl:88-101`)."""
    f = fmg.fine
    x, r = jacobi_flat(f.L, f.D, f.iD, x, r, g, it=1, omega=1.0)
    rc = mg.restrict(from_flat(r, g), masks[0])
    xc = jnp.zeros_like(rc)
    if len(fmg.tail) > 1:
        xc, rc = mg.v_cycle(fmg.tail, masks[1:], xc, rc, omega, (), 0,
                            smooth_it)
    xc, rc = gauss_seidel_rb(fmg.tail[0], xc, rc, it=smooth_it, omega=omega)
    eps = to_flat(mg.prolongate(xc, masks[0]), g)
    return increment_flat(f.L, f.D, x, r, eps, omega, g)


def solve_mg_flat(fmg: FlatMG, masks, x, z, g: FlatGeom, tol: float = 2e-3,
                  itmx: int = 32, smooth_it: int = 4,
                  unroll: int | None = None) -> mg.MGSolveResult:
    """Flat-fine multigrid solve; same iteration/stopping/gauge semantics as
    `ops.multigrid.solve_mg` (cond-unrolled do-while so the Pallas fine-level
    kernels stay out of `lax.while_loop`, which de-pipelines them on the
    tunneled backend)."""
    f = fmg.fine
    dtype = x.dtype
    n_in = (g.Nx - 2) * (g.Ny - 2) * (g.Nz - 2)
    r1tol = jnp.asarray((tol / 10.0) * n_in, dtype)
    rinf_tol = jnp.asarray(tol, dtype)
    r = residual_flat(f.L, f.D, f.iD, x, z, g)
    r1, rinf = norms_flat(r)
    omega = jnp.asarray(1.0, dtype)
    stats = jnp.zeros((itmx + 1, 3), dtype).at[0].set(jnp.stack([rinf, r1, omega]))

    def cond(c):
        x, r, r1, rinf, omega, n, stats = c
        return (n < itmx) & ((n == 0) | ~((r1 < r1tol) & (rinf < rinf_tol)))

    def body(c):
        x, r, r1, rinf, omega, n, stats = c
        x, r = _v_cycle_flat(fmg, masks, x, r, omega, g, smooth_it)
        x, r = gauss_seidel_rb_flat(f.L, f.D, f.iD, x, r, g, it=smooth_it,
                                    omega=omega)
        rnew, rinf = norms_flat(r)
        omega = jnp.where(rnew >= r1,
                          jnp.maximum(jnp.asarray(0.2, dtype), 0.9 * omega),
                          jnp.minimum(jnp.asarray(1.0, dtype), 1.02 * omega))
        n = n + 1
        stats = jax.lax.dynamic_update_slice(
            stats, jnp.stack([rinf, rnew, omega])[None],
            (n, jnp.asarray(0, n.dtype)))
        return (x, r, rnew, rinf, omega, n, stats)

    carry = (x, r, r1, rinf, omega, jnp.asarray(0, jnp.int32), stats)
    from . import pallas_flat as plf

    if unroll is None:
        import os
        unroll = int(os.environ.get("WLTPU_MG_UNROLL", "8"))
    k_unroll = min(itmx, unroll) if plf.use_pallas_flat(x) else 0
    for _ in range(k_unroll):
        carry = jax.lax.cond(cond(carry), body, lambda c: c, carry)
    if itmx > k_unroll:
        plf._IN_LOOP = True   # jnp flat path inside the while_loop tail
        try:
            carry = jax.lax.while_loop(cond, body, carry)
        finally:
            plf._IN_LOOP = False
    x, r, r1, rinf, omega, n, stats = carry
    # canonical pressure gauge: zero mean on active cells, zero at dead
    # cells, ghosts kept (see `ops.multigrid.canonical_gauge`)
    ins = inside_mask_flat(g, x.shape, x.dtype)
    act = jnp.where(f.iD != 0, ins, 0.0)
    m = jnp.sum(x * act) / jnp.maximum(jnp.sum(act), 1.0)
    x = jnp.where(act > 0, x - m, x * (1.0 - ins))
    return mg.MGSolveResult(x, r, n, stats)
