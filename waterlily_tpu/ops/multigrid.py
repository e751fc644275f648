"""Geometric multigrid with semi-coarsening for the pressure Poisson equation.

TPU-native port of `/root/reference/src/MultiLevelPoisson.jl`.  The level stack
is a tuple of `PoissonLevel`s whose shapes/coarsening masks are computed in
Python (static under jit); restriction/prolongation are reshape/`repeat` ops on
the interior slabs, which XLA lowers to layout changes fused with the
neighbouring smoother sweeps.  Anisotropic (channel/duct) domains coarsen only
the still-divisible directions (`coarsen_mask`, `MultiLevelPoisson.jl:29-54`).

The V-cycle recursion is unrolled over the static level list; the outer
iteration with the adaptive relaxation ω and the dual-norm stopping criterion
(`MultiLevelPoisson.jl:108-128`) runs as a `lax.while_loop` on device scalars,
so a full pressure solve is a single XLA computation with no host round trips.
"""
from __future__ import annotations

import math
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .bc import bc_vector, per_bc
from .dist import (DistCtx, gather_scalar, global_inside_count, psum_all,
                   slice_local, sync_scalar)
from .grid import grow, interior
from .poisson import (PoissonLevel, coarse_solve, gauss_seidel_rb, jacobi,
                      increment, make_level, l1n_tol, norms, residual)

__all__ = [
    "divisible", "coarsen_mask", "coarse_shape", "level_shapes",
    "restrict", "prolongate", "restrict_L", "make_mg", "update_mg",
    "v_cycle", "solve_mg", "solve_mg_implicit", "MGSolveResult",
]


def divisible(n: int) -> bool:
    """A padded dimension can be coarsened if even and > 4
    (`MultiLevelPoisson.jl:52`)."""
    return n % 2 == 0 and n > 4


def coarsen_mask(shape: tuple[int, ...]) -> tuple[bool, ...]:
    """Per-direction semi-coarsening decision for a padded shape
    (`coarsen_mask`, `MultiLevelPoisson.jl:29-31`)."""
    return tuple(divisible(n) for n in shape)


def coarse_shape(shape: tuple[int, ...], c: tuple[bool, ...]) -> tuple[int, ...]:
    """Padded shape one level down: halve interior extent where ``c`` holds
    (`MultiLevelPoisson.jl:52-54`)."""
    return tuple(1 + n // 2 if ci else n for n, ci in zip(shape, c))


# flow-path interior-cell floor for coarse levels; env knob for perf tuning
# (the coarsest floored level gets the dense exact solve — see
# `poisson.dense_pinv` — so raising the floor trades tiny-kernel launch
# latency for a larger one-matvec coarse solve)
_MIN_COARSE_CELLS = int(os.environ.get("WLTPU_MIN_COARSE_CELLS", "64"))


def level_shapes(shape: tuple[int, ...], maxlevels: int = 10,
                 min_cells: int = 0):
    """Shapes and per-transition coarsening masks of the level stack
    (`MultiLevelPoisson.jl:68-77`).

    By default the stack coarsens to indivisibility like the reference —
    required for COLD solves of global-mode-rich right-hand sides (the
    manufactured-solution gates stall without the deep coarse levels).
    ``min_cells > 0`` stops coarsening before a level would drop below that
    interior-cell count (once ≥3 levels exist): sub-100-cell levels are pure
    kernel-launch latency on an accelerator — measured on the 2D README
    circle (384×256), cutting the 8-level stack to 6 is 23.9 → 1.7 ms/step
    at identical iteration counts.  `Simulation`/`DistSimulation` pass
    ``_MIN_COARSE_CELLS``: their solves are warm-started every step and the
    dual-norm stop guarantees solve quality regardless of cycle strength
    (a too-weak cycle costs iterations, never silent inaccuracy) — every
    physics gate (TGV 1e-4, added-mass ±0.04, ≤2-iteration caps) holds."""
    shapes, masks = [tuple(shape)], []
    while any(coarsen_mask(shapes[-1])) and len(shapes) <= maxlevels:
        c = coarsen_mask(shapes[-1])
        nxt = coarse_shape(shapes[-1], c)
        if (len(shapes) >= 3
                and math.prod(n - 2 for n in nxt) < min_cells):
            break
        masks.append(c)
        shapes.append(nxt)
    if len(shapes) <= 2:
        raise ValueError("MultiLevelPoisson requires size=a2^n, where n>2")
    return shapes, masks


def _pair_sum(a: jax.Array, axis: int) -> jax.Array:
    """Sum adjacent pairs along ``axis`` (length must be even)."""
    n = a.shape[axis]
    lo = (slice(None),) * axis + (slice(0, n, 2),)
    hi = (slice(None),) * axis + (slice(1, n, 2),)
    return a[lo] + a[hi]


def restrict(b: jax.Array, c: tuple[bool, ...]) -> jax.Array:
    """Residual restriction: sum the 2^k fine children of each coarse cell in
    the coarsened directions (`restrict`, `MultiLevelPoisson.jl:16-19,49`).
    Fine interior index pairs (2ic-1, 2ic) map to coarse interior cell ic."""
    a = interior(b)
    for d, ci in enumerate(c):
        if ci:
            a = _pair_sum(a, d)
    return grow(a)


def prolongate(b: jax.Array, c: tuple[bool, ...]) -> jax.Array:
    """Injection prolongation: each fine interior cell copies its coarse
    parent (`prolongate!`/`down`, `MultiLevelPoisson.jl:8,50`).  Ghosts zero."""
    a = interior(b)
    for d, ci in enumerate(c):
        if ci:
            a = jnp.repeat(a, 2, axis=d)
    return grow(a)


def restrict_L(Lf: jax.Array, c: tuple[bool, ...],
               perdir: tuple[int, ...] = (), ctx=None) -> jax.Array:
    """Restrict face coefficients (`restrictL`/`restrictL!`,
    `MultiLevelPoisson.jl:10-26,42-47`): a coarse ``i``-face sums the fine
    faces composing it — the face-normal direction keeps only the fine face at
    the coarse-face position (odd fine interior index) and is halved when
    coarsened; tangential coarsened directions pair-sum.  Boundary faces are
    fixed by the zero-velocity vector BC, exactly like the reference."""
    D = Lf.shape[0]
    comps = []
    for i in range(D):
        a = interior(Lf[i])
        for d, ci in enumerate(c):
            if not ci:
                continue
            if d == i:  # face-normal: take the face at the pair start
                n = a.shape[d]
                a = a[(slice(None),) * d + (slice(0, n, 2),)]
            else:
                a = _pair_sum(a, d)
        if c[i]:
            a = a / 2
        comps.append(grow(a))
    Lc = jnp.stack(comps)
    return bc_vector(Lc, (0.0,) * D, save_exit=False, perdir=perdir, ctx=ctx)


def make_mg(mu0: jax.Array, perdir: tuple[int, ...] = (), maxlevels: int = 10,
            min_cells: int = 0):
    """Build the level stack from the fine face coefficients (= the BDIM
    zeroth moment ``mu0``, `src/WaterLily.jl:97`).  Returns
    ``(levels, masks)``; ``masks`` is static python data.  The coarsest
    level carries the dense exact-solve pseudo-inverse (`dense_pinv`)."""
    shapes, masks = level_shapes(mu0.shape[1:], maxlevels, min_cells)
    return update_mg(None, tuple(masks), mu0, perdir), tuple(masks)


def update_mg(levels, masks, mu0: jax.Array, perdir: tuple[int, ...] = ()):
    """Re-restrict the coefficients down every level after a body re-measure
    (`update!`, `MultiLevelPoisson.jl:79-86`); re-derives the coarsest
    level's dense pseudo-inverse."""
    from .poisson import dense_pinv

    new = [make_level(mu0)]
    L = mu0
    for c in masks:
        L = restrict_L(L, c, perdir)
        new.append(make_level(L))
    new[-1] = dense_pinv(new[-1], perdir)
    return tuple(new)


def v_cycle(levels, masks, x: jax.Array, r: jax.Array, omega,
            perdir: tuple[int, ...] = (), l: int = 0, smooth_it: int = 4,
            ctx=None, n_dist: int = 0, presmooth: bool = True):
    """One V-cycle (`Vcycle!`, `MultiLevelPoisson.jl:88-101`): fine Jacobi
    pre-smooth, restrict residual, recurse, coarse red-black Gauss-Seidel,
    prolongate + increment.  Unrolled over the static level list.

    Distributed mode: levels ``< n_dist`` hold per-shard local blocks and use
    halo-synced smoothers; at the transition the residual is all-gathered and
    the replicated coarse tail runs the plain single-device code (the
    coarse-grid-gather strategy), with the correction sliced back per shard.
    """
    fine, coarse = levels[l], levels[l + 1]
    c = masks[l]
    if ctx is not None and l == n_dist - 1:
        # transition: fine is the last distributed level, coarse is replicated
        x, r = jacobi(fine, x, r, it=1, omega=1.0, perdir=perdir, ctx=ctx)
        rg = gather_scalar(r, ctx)
        rc = restrict(rg, c)
        xc = jnp.zeros_like(rc)
        if l + 1 < len(levels) - 1:
            xc, rc = v_cycle(levels, masks, xc, rc, omega, perdir, l + 1,
                             smooth_it)
        xc, rc = coarse_solve(coarse, xc, rc, it=smooth_it, omega=omega,
                              perdir=perdir)
        eps = slice_local(prolongate(xc, c), ctx)
        return increment(fine, x, r, eps, omega, perdir, ctx)
    sub = ctx if (ctx is not None and l + 1 < n_dist) else None
    if presmooth or l > 0:
        x, r = jacobi(fine, x, r, it=1, omega=1.0, perdir=perdir,
                      ctx=ctx if l < n_dist else None)
    rc = restrict(r, c)
    xc = jnp.zeros_like(rc)
    if l + 1 < len(levels) - 1:
        xc, rc = v_cycle(levels, masks, xc, rc, omega, perdir, l + 1,
                         smooth_it, ctx, n_dist)
    xc, rc = coarse_solve(coarse, xc, rc, it=smooth_it, omega=omega,
                          perdir=perdir, ctx=sub)
    eps = prolongate(xc, c)
    return increment(fine, x, r, eps, omega, perdir,
                     ctx if l < n_dist else None)


def dist_n_levels(global_shape: tuple[int, ...], sizes: tuple[int, ...],
                  maxlevels: int = 10,
                  min_cells: int = 0) -> tuple[list, list, int]:
    """Level shapes/masks plus the distributed-prefix length: a level stays
    distributed while every mesh-split dim keeps an even split with >= 2
    interior cells per shard; coarser levels are replicated (coarse-grid
    gather)."""
    shapes, masks = level_shapes(global_shape, maxlevels, min_cells)

    def dist_ok(shape):
        for d, k in enumerate(sizes):
            if k > 1:
                n = shape[d] - 2
                if n % k != 0 or n // k < 2:
                    return False
        return True

    n_dist = 0
    for sh in shapes:
        if dist_ok(sh):
            n_dist += 1
        else:
            break
    # the coarsest level always joins the replicated tail: it carries the
    # dense exact coarse solve, which must see the GLOBAL grid — and the
    # single-device stack does the same, keeping iteration-count parity
    n_dist = min(n_dist, len(shapes) - 1)
    return shapes, masks, n_dist


def make_mg_dist(mu0_local: jax.Array, ctx, masks, n_dist: int,
                 perdir: tuple[int, ...] = ()):
    """Build the level stack from a *local-block* mu0 inside `shard_map`:
    levels < ``n_dist`` are per-shard local blocks (halo-consistent ghosts via
    the distributed zero-velocity BC), the tail is gathered to the replicated
    global grid and built with the plain code (`update!`,
    `MultiLevelPoisson.jl:79-86`)."""
    D = mu0_local.shape[0]
    levels = [make_level(mu0_local)]
    L = mu0_local
    distributed = True
    for idx, c in enumerate(masks):
        if distributed and idx + 1 >= n_dist:
            # transition: gather the fine coefficients, restore the global
            # ghost convention, continue replicated
            Lg = jnp.stack([gather_scalar(L[i], ctx) for i in range(D)])
            L = bc_vector(Lg, (0.0,) * D, save_exit=False, perdir=perdir)
            distributed = False
        if distributed:
            L = restrict_L(L, c, perdir, ctx)
        else:
            L = restrict_L(L, c, perdir)
        levels.append(make_level(L))
    if not distributed:
        # exact dense coarse solve on the replicated coarsest (a distributed
        # coarsest keeps the GS fallback — `dist_n_levels` caps n_dist so
        # this only happens on meshes too large to ever gather)
        from .poisson import dense_pinv

        levels[-1] = dense_pinv(levels[-1], perdir)
    return tuple(levels)


class MGSolveResult(NamedTuple):
    x: jax.Array
    r: jax.Array
    iters: jax.Array          # int32 scalar
    stats: jax.Array          # (itmx+1, 3): r_inf, r_1, omega per iteration


def solve_mg(levels, masks, x: jax.Array, z: jax.Array, tol: float = 2e-3,
             itmx: int = 32, perdir: tuple[int, ...] = (),
             smooth_it: int = 4, ctx=None,
             n_dist: int = 0, fine_smooth_it: int = 0,
             fine_presmooth: bool = True) -> MGSolveResult:
    """Multigrid pressure solve (`solver!`, `MultiLevelPoisson.jl:108-128`):
    V-cycle + fine smooth per iteration, adaptive relaxation
    ω ∈ [0.2, 1] (×0.9 on stall, ×1.02 on progress) and the dual-norm stop
    ``L1 < tol/10·N`` ∧ ``Linf < tol``, all on device scalars.
    ``smooth_it`` matches the reference smoother tunable (`GaussSeidelRB!`
    ``it=4``, `Poisson.jl:135-141`); both knobs come from `FlowCfg` — no
    environment reads at trace time."""
    p = levels[0]
    dtype = x.dtype
    fine_ctx = ctx if n_dist > 0 else None
    r1tol = jnp.asarray((tol / 10.0) * global_inside_count(fine_ctx, x.shape),
                        dtype)
    rinf_tol = jnp.asarray(tol, dtype)
    r = residual(p, x, z, perdir, fine_ctx)
    r1, rinf = norms(r, fine_ctx)
    omega = jnp.asarray(1.0, dtype)
    stats = jnp.zeros((itmx + 1, 3), dtype).at[0].set(jnp.stack([rinf, r1, omega]))

    def cond(c):
        x, r, r1, rinf, omega, n, stats = c
        # do-while: the reference always runs the first V-cycle before
        # testing convergence (`MultiLevelPoisson.jl:113-124`)
        conv = (r1 < r1tol) & (rinf < rinf_tol)
        return (n < itmx) & ((n == 0) | ~conv)

    def body(c):
        x, r, r1, rinf, omega, n, stats = c
        x, r = v_cycle(levels, masks, x, r, omega, perdir, 0, smooth_it,
                       ctx, n_dist, presmooth=fine_presmooth)
        x, r = gauss_seidel_rb(p, x, r, it=fine_smooth_it or smooth_it,
                               omega=omega, perdir=perdir, ctx=fine_ctx)
        rnew, rinf = norms(r, fine_ctx)
        omega = jnp.where(rnew >= r1,
                          jnp.maximum(jnp.asarray(0.2, dtype), 0.9 * omega),
                          jnp.minimum(jnp.asarray(1.0, dtype), 1.02 * omega))
        n = n + 1
        stats = jax.lax.dynamic_update_slice(
            stats, jnp.stack([rinf, rnew, omega])[None], (n, jnp.asarray(0, n.dtype)))
        return (x, r, rnew, rinf, omega, n, stats)

    carry = (x, r, r1, rinf, omega, jnp.asarray(0, jnp.int32), stats)
    # pure while_loop, Pallas kernels enabled in the body: measured both the
    # fastest and the cheapest-to-compile solver form (round 1's "while_loop
    # de-pipelines Pallas 15x" was an artifact of the div_k race; see
    # docs/performance.md "Solver iteration structure — corrected")
    carry = jax.lax.while_loop(cond, body, carry)
    x, r, r1, rinf, omega, n, stats = carry
    x = canonical_gauge(x, p.iD, fine_ctx)
    return MGSolveResult(sync_scalar(x, fine_ctx, perdir), r, n, stats)


def canonical_gauge(x: jax.Array, iD: jax.Array, ctx=None) -> jax.Array:
    """Pin the pressure representative: the all-Neumann operator is singular
    (solution defined up to a constant, plus *dead* cells deep inside a body
    — ``iD == 0``, `Poisson.jl:92-98` — that the smoothers never touch).  The
    reference leaves both floating at whatever the warm-started iteration
    drifts to — physically equivalent (only ∇p enters the momentum equation,
    and dead cells are decoupled: all their face coefficients are zero) but
    algorithm-defined, which makes derivatives of mean/dead-sensitive
    functionals (e.g. Σp, `test_forwarddiff.jl:58-78`) iteration-dependent.
    Canonical rule: active interior cells get zero mean, dead interior cells
    get zero, ghosts keep their (warm-start) values — under which the
    implicit JVP (`solve_mg_implicit`) is exact."""
    from .poisson import _zero_ghost, _inside_ones

    act = jnp.where(iD != 0, _inside_ones(x), 0.0)
    n_act = psum_all(jnp.sum(act), ctx)
    m = psum_all(jnp.sum(x * act), ctx) / jnp.maximum(n_act, 1.0)
    inside = _inside_ones(x)
    return jnp.where(act > 0, x - m, x * (1.0 - inside))


def solve_mg_implicit(levels, masks, x: jax.Array, z: jax.Array,
                      tol: float = 2e-3, itmx: int = 32,
                      perdir: tuple[int, ...] = (), smooth_it: int = 4,
                      ctx=None, n_dist: int = 0,
                      fine_smooth_it: int = 0,
                      fine_presmooth: bool = True) -> MGSolveResult:
    """`solve_mg` with implicit forward-mode differentiation.

    Differentiating *through* the iterative solver gives lagged tangents: the
    `lax.while_loop` stops when the PRIMAL residual converges, so once warm
    starts make the primal cheap (1-2 V-cycles per projection late in a run)
    the tangent never catches up — measured 20% derivative error on the
    spinning-cylinder lift test (`test_forwarddiff.jl:46-56`).  Here the JVP
    rule is the exact implicit one: for ``A(L) x = z``,

        A ẋ = ż − Ȧ(L̇) x

    solved with the SAME multigrid solver/tolerance (coarse levels are
    preconditioner-only, so only the fine-level tangent coefficients enter;
    ``A`` is linear in ``L`` — including its diagonal — so ``Ȧ`` is just the
    operator built from ``(L̇, Ḋ)``).  The tangent of the warm start is used
    to warm-start the tangent solve but does not bias the result.
    """
    import numpy as np
    from .poisson import _mult_raw
    from .dist import sync_scalar as _sync

    @jax.custom_jvp
    def _solve(levels, x, z):
        return solve_mg(levels, masks, x, z, tol=tol, itmx=itmx,
                        perdir=perdir, smooth_it=smooth_it,
                        ctx=ctx, n_dist=n_dist, fine_smooth_it=fine_smooth_it,
                        fine_presmooth=fine_presmooth)

    @_solve.defjvp
    def _solve_jvp(primals, tangents):
        levels, x0, z = primals
        dlevels, dx0, dz = tangents
        res = _solve(levels, x0, z)
        fine, dfine = levels[0], dlevels[0]
        fine_ctx = ctx if n_dist > 0 else None
        xs = _sync(res.x, fine_ctx, perdir)
        dA_x = _mult_raw(PoissonLevel(dfine.L, dfine.D, dfine.iD), xs, fine_ctx)
        rhs = dz - dA_x
        dres = solve_mg(levels, masks, dx0, rhs, tol=tol, itmx=itmx,
                        perdir=perdir, smooth_it=smooth_it,
                        ctx=ctx, n_dist=n_dist, fine_smooth_it=fine_smooth_it,
                        fine_presmooth=fine_presmooth)
        f0 = np.zeros(res.iters.shape, jax.dtypes.float0)
        dout = MGSolveResult(dres.x, dres.r, f0, jnp.zeros_like(res.stats))
        return res, dout

    return _solve(levels, x, z)
