"""Flat-layout momentum step — the single-device 3D TPU fast path.

Same numerics as `models.flow.mom_step_impl` (`mom_step!`,
`/root/reference/src/Flow.jl:156-167`) with every field in the (x, y·z) flat
layout of `ops.flat` and the hot stencils in `ops.pallas_flat` kernels.
Supported configuration: D == 3, constant-tuple boundary velocity,
non-periodic, no body acceleration/udf (the general path falls back to
`mom_step_impl`).  The convective-outlet exit BC is supported.

The boundary-slab flux logic of `conv_diff` reduces to two in-stencil
selects (see `ops.pallas_flat.conv_diff_k`); the jnp versions here are the
kernel-independent reference implementations used on CPU and for kernel
parity tests.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..ops import mgflat
from ..ops.flat import (FlatGeom, bc_vector_flat, cfl_flat, div_flat,
                        exit_bc_flat, fshift, from_flat, geom_of,
                        inside_mask_flat, proj_correct_flat, slabx, to_flat,
                        xshift, yz_planes, zero_ghost_flat)
from .flow import FlowCfg, FlowState

__all__ = ["flat_supported", "state_to_flat", "state_from_flat",
           "conv_diff_flat", "bdim_flat", "mom_step_flat"]


def flat_supported(cfg: FlowCfg, g=None, udf=None, solve_fn=None) -> bool:
    """The flat engine covers every single-device 3D configuration: periodic
    directions, body acceleration ``g``, callable boundary velocity, udf
    forcing (native ``udf.flat`` or via layout conversion) and the convective
    exit BC.  Only custom pressure-solver injection (``solve_fn`` /
    ``psolver='pcg'``) stays on the generic 3D path."""
    return cfg.D == 3 and solve_fn is None


def state_to_flat(state: FlowState, g: FlatGeom) -> FlowState:
    """Convert every field of a FlowState to the (x, y·z) flat layout."""
    return FlowState(u=to_flat(state.u, g), u0=to_flat(state.u0, g),
                     p=to_flat(state.p, g), V=to_flat(state.V, g),
                     mu0=to_flat(state.mu0, g), mu1=to_flat(state.mu1, g),
                     nu=state.nu)


def state_from_flat(state: FlowState, g: FlatGeom) -> FlowState:
    """Convert a flat-layout FlowState back to dense (Nx, Ny, Nz) fields."""
    return FlowState(u=from_flat(state.u, g), u0=from_flat(state.u0, g),
                     p=from_flat(state.p, g), V=from_flat(state.V, g),
                     mu0=from_flat(state.mu0, g), mu1=from_flat(state.mu1, g),
                     nu=state.nu)


def _axis_meta(g: FlatGeom, dtype):
    """Per-direction (index plane, extent, flat step or None-for-x)."""
    yv, zv, _ = yz_planes(g, dtype)
    return ((None, g.Nx, None), (yv.astype(dtype), g.Ny, g.Nz),
            (zv.astype(dtype), g.Nz, 1))


def _shift(a, st, s):
    """shift by s grid cells along a direction: st None → x rows, else flat."""
    return xshift(a, s) if st is None else fshift(a, s * st)


def conv_diff_flat(u: jax.Array, scheme, nu, g: FlatGeom,
                   perdir: tuple[int, ...] = (), ctx=None) -> jax.Array:
    """`conv_diff!` (`src/Flow.jl:38-62`) on flat fields.

    Boundary-slab fixes in-stencil: non-periodic UP → central at j-index 1
    (`ϕuL`), DN → central at j-index n−1 (`ϕuR`); periodic directions keep
    the full scheme with the wrapped second-upwind/downwind reads (`ϕuP`,
    `Flow.jl:60-62` — the slab-1 second-upwind comes from index n−3 and the
    top-ghost downwind from index 2; the single-ghost reads come from the
    periodic-filled ghost planes).  Ghost cells of the result are zero (the
    reference zero-fills `a.f`)."""
    from ..ops import pallas_flat as plf
    from ..ops.dist import edge_hi, edge_lo, fetch_hi, fetch_lo, sharded

    if plf.use_pallas_flat(u) and not perdir and ctx is None:
        return plf.conv_diff_k(u, nu, scheme, g)
    meta = _axis_meta(g, u.dtype)
    gx = jax.lax.broadcasted_iota(u.dtype, u.shape[1:], 0)
    ins = inside_mask_flat(g, u.shape[1:], u.dtype)
    dist_x = ctx is not None and sharded(ctx, 0)
    out = []
    for i in range(3):
        f = u[i]
        ax = f.ndim - 3           # x axis of a flat scalar field
        ri = jnp.zeros_like(f)
        for j in range(3):
            jf, n_j, st = meta[j]
            if jf is None:
                jf = gx
            f_m1 = _shift(f, st, -1)
            f_m2 = _shift(f, st, -2)
            f_p1 = _shift(f, st, 1)
            uadv = 0.5 * (u[j] + _shift(u[j], meta[i][2], -1))
            per = j in perdir
            if j == 0 and dist_x:
                # ring variant: slab-1 second-upwind from the left neighbor's
                # row n-3 (self-wrap == the periodic phi_uP read); edge shards
                # of non-periodic x keep the phi_uL/phi_uR one-sided fluxes
                cds_b = 0.5 * (f + f_m1)
                f_mm = fetch_lo(ctx, f, ax, 0, n_j - 3)
                up = scheme(jnp.where(jf == 1, f_mm, f_m2), f_m1, f)
                if not per:
                    up = jnp.where((jf == 1) & edge_lo(ctx, 0), cds_b, up)
                dn = jnp.where(jf == n_j - 1, cds_b, scheme(f_p1, f, f_m1))
                phi = uadv * jnp.where(uadv > 0, up, dn) - nu * (f - f_m1)
                # top ghost flux: right neighbor's first flux plane (ring),
                # except the physical outlet which keeps its phi_uR value
                phi_wrap = fetch_hi(ctx, phi, ax, 0, 1)
                if not per:
                    phi_wrap = jnp.where(edge_hi(ctx, 0),
                                         slabx(phi, n_j - 1), phi_wrap)
                phi = jnp.where(jf == n_j - 1, phi_wrap, phi)
            elif per:
                f_m2 = jnp.where(jf == 1, _shift(f, st, n_j - 4), f_m2)
                f_p1 = jnp.where(jf == n_j - 1, _shift(f, st, -(n_j - 3)),
                                 f_p1)
                up = scheme(f_m2, f_m1, f)
                dn = scheme(f_p1, f, f_m1)
                phi = uadv * jnp.where(uadv > 0, up, dn) - nu * (f - f_m1)
            else:
                cds_b = 0.5 * (f + f_m1)
                up = jnp.where(jf == 1, cds_b, scheme(f_m2, f_m1, f))
                dn = jnp.where(jf == n_j - 1, cds_b, scheme(f_p1, f, f_m1))
                phi = uadv * jnp.where(uadv > 0, up, dn) - nu * (f - f_m1)
            ri = ri + (phi - _shift(phi, st, 1))
        out.append(ri * ins)
    return jnp.stack(out)


def bdim_flat(u, u0, f, V, mu0, mu1, dt, g: FlatGeom,
              perdir: tuple[int, ...] = (), ctx=None,
              band_x=None) -> jax.Array:
    """`BDIM!` (`src/Flow.jl:176-180`) on flat fields.  Under x-decomposition
    f's halo rows are ring-refreshed first so the μ1·∇f* gradient is correct
    for bodies straddling shard boundaries (the 3D path syncs f* itself,
    `models.flow.bdim_update`; u0/V ghosts already carry halo values)."""
    from ..ops import pallas_flat as plf
    from ..ops.dist import sync_scalar

    if ctx is not None:
        # edge_zero=False: physical-edge x ghost rows keep their local values
        # (the accelerate()/g contribution lives there — matches the 3D dist
        # path's `sync_vector(fp, edge_zero=False)`, `models.flow.bdim_update`)
        f = sync_scalar(f, ctx, perdir=(0,) if 0 in perdir else (),
                        lead=f.ndim - 3, edge_zero=False)
    if plf.use_pallas_flat(u):
        if band_x is not None and ctx is None:
            return plf.bdim_band(u, u0, f, V, mu0, mu1, dt, g, band_x, perdir)
        return plf.bdim_k(u, u0, f, V, mu0, mu1, dt, g)
    meta = _axis_meta(g, u.dtype)
    fp = u0 + dt * f - V
    terms = []
    for i in range(3):
        acc = jnp.zeros_like(fp[i])
        for j in range(3):
            st = meta[j][2]
            acc = acc + mu1[i, j] * (_shift(fp[i], st, 1) - _shift(fp[i], st, -1))
        terms.append(0.5 * acc + V[i] + mu0[i] * fp[i])
    return u + zero_ghost_flat(jnp.stack(terms), g)


def _scale_interior_flat(u: jax.Array, s, g: FlatGeom) -> jax.Array:
    """`scale_u!` (`src/Flow.jl:211-214`): scale interior cells only."""
    m = inside_mask_flat(g, u.shape[1:], u.dtype)
    return u * (1.0 + (s - 1.0) * m)


def _kernel_bc_ok(cfg: FlowCfg, u, ctx) -> bool:
    """The fused BC-epilogue kernels cover the same configs as `bc_k`."""
    from ..ops import pallas_flat as plf

    return (plf.use_pallas_flat(u) and not cfg.perdir
            and not callable(cfg.ubc) and ctx is None)


def _project_flat(u, p, fmg, masks, dt_w, cfg: FlowCfg, g: FlatGeom, t=0.0,
                  ctx=None, ctx3=None, n_dist: int = 0, z=None,
                  want_cfl: bool = False):
    """`mom_project!` (`src/Flow.jl:223-232`) on flat fields.  ``z`` may be
    supplied by the fused BC+div kernel; with ``want_cfl`` the projection
    tail also emits the CFL summand field (`projbc_k`)."""
    from ..ops import pallas_flat as plf

    if z is None:
        z = div_flat(u, g)
    x = p * dt_w
    res = mgflat.solve_mg_flat(fmg, masks, x, z, g, tol=cfg.tol,
                               itmx=cfg.itmx, smooth_it=cfg.smooth_it,
                               perdir=cfg.perdir,
                               ctx=ctx, ctx3=ctx3, n_dist=n_dist,
                               fine_smooth_it=cfg.fine_smooth_it,
                               mp=cfg.mp_smooth,
                               fine_presmooth=cfg.fine_presmooth)
    p = res.x / dt_w
    s_cfl = None
    if _kernel_bc_ok(cfg, u, ctx):
        out = plf.projbc_k(u, res.x, fmg.fine.L, cfg.ubc, g,
                           save_exit=cfg.exit_bc, want_cfl=want_cfl)
        if want_cfl:
            u, s_cfl = out
        else:
            u = out
    else:
        u = proj_correct_flat(u, res.x, fmg.fine.L, g)
        u = bc_vector_flat(u, cfg.ubc, g, save_exit=cfg.exit_bc,
                           perdir=cfg.perdir, t=t, ctx=ctx, ctx3=ctx3)
    return u, p, res.iters, res.stats, s_cfl


def accelerate_flat(f: jax.Array, t, cfg: FlowCfg, g: FlatGeom,
                    ctx3=None) -> jax.Array:
    """`accelerate!` (`src/Flow.jl:69-73`) for flat fields: the body force
    ``g(i,x,t)`` and the dU/dt frame term are evaluated by the 3D
    implementation (`models.flow.accelerate` vmaps the user callables over
    the face grids) and the increment converted — two layout passes, only on
    configs that use acceleration.  ``ctx3`` supplies global coordinate
    offsets under decomposition."""
    if cfg.g is None and not callable(cfg.ubc):
        return f
    from .flow import accelerate

    f3 = accelerate(from_flat(f, g), t, cfg.g, cfg.ubc, cfg.dtype, ctx3)
    return to_flat(f3, g)


def _apply_udf_flat(udf, f, state, u_into, u_adv, t, g: FlatGeom, ctx=None):
    """`udf!` (`src/Flow.jl:255-257`) on the flat engine.  A udf carrying a
    ``flat`` attribute (e.g. `utils.les.sgs`) runs natively on flat fields
    (and receives the halo ctx under decomposition); otherwise the
    3D-contract udf runs through layout conversion of the fields it sees
    (f, state.u, u_adv) — per-shard under decomposition, so only
    position-independent forcings are decomposition-safe on that path."""
    if hasattr(udf, "flat"):
        return udf.flat(f, dataclasses.replace(state, u=u_into), u_adv, t, g,
                        ctx)
    st3 = state_from_flat(dataclasses.replace(state, u=u_into), g)
    f3 = udf(from_flat(f, g), st3, from_flat(u_adv, g), t)
    return to_flat(f3, g)


def _half_step(u_adv, u_base, u0, state, cfg, dt, f_t, keep_base, scale, g,
               udf=None, ctx=None, ctx3=None):
    """conv_diff → udf → accelerate → BDIM → interior scale (one momentum
    phase, `mom_predict!`/`mom_correct!`, `src/Flow.jl:190-210`).  (A fully-
    fused predictor/corrector kernel was measured and removed: full-field μ
    reads ate the fusion gain — 13.1 vs 9.8 ms for the separate pair at
    256³, docs/performance.md negative results.)"""
    from ..ops import pallas_flat as plf

    plain = (udf is None and cfg.g is None and not callable(cfg.ubc)
             and not cfg.perdir and ctx is None)
    # fused conv_diff + band-exterior update: both `mom_step!` phases call
    # with u_adv == u_base, so the far-field BDIM (μ₀=1, μ₁=0, V=0) plus
    # interior scaling lands in the convection kernel's output pass and only
    # the body's x-slab runs the full μ-weighted update (`bdim_band` split)
    if (plf.use_pallas_flat(u_adv) and plain and cfg.band_x is not None
            and u_adv is u_base):
        lo, hi = cfg.band_x
        # ONE slab bound drives both the write-skip range and the consumer
        # slice below — they must not drift apart (rows outside the written
        # range are uninitialized HBM)
        slab_lo, slab_hi = lo - 1, hi + 1
        # f is consumed only on the band slab rows: skip its write-back DMA
        # outside them — safe only when the slab stays clear of the
        # never-written ghost rows 0 / Nx−1
        f_rows = ((slab_lo, slab_hi)
                  if (1 <= slab_lo < slab_hi <= g.Nx - 1) else None)
        u, f = plf.conv_diff_k(u_adv, state.nu, cfg.scheme, g,
                               cheap=(u0, dt, float(keep_base), float(scale)),
                               f_rows=f_rows)
        if hi > lo:
            sl = slice(slab_lo, slab_hi)
            gs = geom_of((hi - lo + 2, g.Ny, g.Nz))
            m_s = inside_mask_flat(gs, (hi - lo + 2, g.S, 128), u.dtype)
            u_pre = u_base[:, sl] if keep_base else u_base[:, sl] * (1.0 - m_s)
            slab = plf.bdim_k(u_pre, u0[:, sl], f[:, sl], state.V[:, sl],
                              state.mu0[:, sl], state.mu1[:, :, sl], dt, gs)
            if scale != 1.0:
                slab = slab * (1.0 + (scale - 1.0) * m_s)
            u = u.at[:, lo:hi].set(slab[:, 1:-1])
        return u
    f = conv_diff_flat(u_adv, cfg.scheme, state.nu, g, cfg.perdir, ctx)
    if udf is not None:
        u_into = u_base if keep_base else _scale_interior_flat(u_base, 0.0, g)
        f = _apply_udf_flat(udf, f, state, u_into, u_adv, f_t, g, ctx)
    f = accelerate_flat(f, f_t, cfg, g, ctx3)
    u = u_base if keep_base else _scale_interior_flat(u_base, 0.0, g)
    u = bdim_flat(u, u0, f, state.V, state.mu0, state.mu1, dt, g,
                  cfg.perdir, ctx, band_x=cfg.band_x if ctx is None else None)
    if scale != 1.0:
        u = _scale_interior_flat(u, scale, g)
    return u


def mom_step_flat_impl(cfg: FlowCfg, state: FlowState, fmg, masks,
                       g: FlatGeom, dt, t0, udf=None, ctx=None, ctx3=None,
                       n_dist: int = 0):
    """One full time step on flat state (`mom_step!`, `src/Flow.jl:156-167`).
    ``ctx`` (1-dim flat x ctx) / ``ctx3`` (3-dim) / ``n_dist`` select the
    x-decomposed shard_map variant (`parallel.dist.DistFlat`)."""
    from ..ops import pallas_flat as plf

    t1 = t0 + dt
    u0 = state.u
    state = dataclasses.replace(state, u0=u0)
    fuse_bc = _kernel_bc_ok(cfg, u0, ctx) and not cfg.exit_bc

    def _bc_div(u):
        """post-half-step BC (+ divergence, fused when kernel-eligible)."""
        if fuse_bc:
            return plf.bc_div_k(u, cfg.ubc, g, save_exit=False)
        u = bc_vector_flat(u, cfg.ubc, g, save_exit=cfg.exit_bc,
                           perdir=cfg.perdir, t=t1, ctx=ctx, ctx3=ctx3)
        return u, None

    # predictor (`Flow.jl:157-161`)
    u = _half_step(u0, u0, u0, state, cfg, dt, t0, 0.0, 1.0, g, udf, ctx, ctx3)
    u, z = _bc_div(u)
    if cfg.exit_bc:
        u = exit_bc_flat(u, u0, dt, g, ctx)
    u, p, n1, s1, _ = _project_flat(u, state.p, fmg, masks, dt, cfg, g, t1,
                                    ctx, ctx3, n_dist, z=z)
    # corrector (`Flow.jl:163-165`)
    u = _half_step(u, u, u0, state, cfg, dt, t1, 1.0, 0.5, g, udf, ctx, ctx3)
    u, z = _bc_div(u)
    u, p, n2, s2, s_cfl = _project_flat(u, p, fmg, masks, 0.5 * dt, cfg, g,
                                        t1, ctx, ctx3, n_dist, z=z,
                                        want_cfl=_kernel_bc_ok(cfg, u, ctx))
    state = dataclasses.replace(state, u=u, p=p)
    if s_cfl is not None:
        dt_next = jnp.minimum(jnp.asarray(10.0, u.dtype),
                              1.0 / (jnp.max(s_cfl) + 5 * state.nu))
    else:
        dt_next = cfl_flat(u, state.nu, g, ctx=ctx)
    return state, dt_next, jnp.stack([n1, n2]), jnp.stack([s1, s2])


@partial(jax.jit, static_argnames=("cfg", "masks", "g", "udf"))
def mom_step_flat(cfg: FlowCfg, state: FlowState, fmg, masks, g: FlatGeom,
                  dt, t0, udf=None):
    """Jitted single-device entry of `mom_step_flat_impl` (one XLA program
    per time step; solver stacks travel as arguments, not constants)."""
    return mom_step_flat_impl(cfg, state, fmg, masks, g, dt, t0, udf)
