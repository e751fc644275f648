"""Flow state and the BDIM predictor-corrector momentum step.

TPU-native port of `/root/reference/src/Flow.jl`.  The reference's per-cell
`@loop` kernels (conv_diff!, BDIM!, projection, CFL) become whole-array shift
expressions over a `FlowState` pytree; one `mom_step` traces to a single XLA
program containing both momentum phases and both multigrid pressure solves, so
a time step leaves the device exactly once (the CFL scalar — same single
device→host sync as the reference, `Flow.jl:166`).

Layout: velocity ``u[i, x, y(, z)]`` component-first (spatial dims minor →
TPU lanes), pressure ``p[x, y(, z)]``, BDIM moments ``mu0`` like ``u`` and
``mu1[i, j, spatial]``.  The time-step history lives on the host (`Flow.dt`),
mirroring `Flow.jl:127`.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ..ops import multigrid as mg
from ..ops.bc import apply_vector, bc_vector, exit_bc, per_bc
from ..ops.dist import (edge_hi, edge_lo, fetch_hi, fetch_lo, offsets,
                        pmax_all, sharded, sync_vector)
from ..ops.grid import grow, interior, loc_grid, set_interior, shift

__all__ = [
    "quick", "cds", "vanleer", "median3",
    "FlowState", "FlowCfg", "Flow",
    "conv_diff", "bdim_update", "accelerate", "project", "cfl", "mom_step",
    "div_field", "scale_interior",
]


# ---------------------------------------------------------------- schemes
def median3(a, b, c):
    """Elementwise median of three (`median`, `Flow.jl:28-37`)."""
    return jnp.maximum(jnp.minimum(a, b), jnp.minimum(jnp.maximum(a, b), c))


def quick(u, c, d):
    """Median-limited QUICK (`Flow.jl:4`): u=upstream, c=center, d=downstream."""
    return median3((5 * c + 2 * d - u) / 6, c, median3(10 * c - 9 * u, c, d))


def cds(u, c, d):
    """Central difference (`Flow.jl:6`)."""
    return (c + d) / 2


def vanleer(u, c, d):
    """van Leer limiter (`Flow.jl:5`) with a divide-safe guard so AD tangents
    never see the 0/0 branch."""
    denom = d - u
    safe = jnp.where(denom == 0, 1.0, denom)
    lim = c + (d - c) * (c - u) / safe
    revert = (c <= jnp.minimum(u, d)) | (c >= jnp.maximum(u, d))
    return jnp.where(revert, c, lim)


# ---------------------------------------------------------------- state
@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FlowState:
    """Device-resident fields of a flow (`Flow{D,T}`, `Flow.jl:114-131`).

    ``u0`` is the previous velocity; ``V``/``mu0``/``mu1`` the BDIM body
    velocity and kernel moments.  ``nu`` is carried as a traced scalar so whole
    simulations stay differentiable w.r.t. viscosity."""
    u: jax.Array
    u0: jax.Array
    p: jax.Array
    V: jax.Array
    mu0: jax.Array
    mu1: jax.Array
    nu: jax.Array


@dataclasses.dataclass(frozen=True)
class FlowCfg:
    """Static (hashable) configuration — the jit cache key."""
    shape: tuple[int, ...]          # padded grid Ng = N + 2
    ubc: Any                        # tuple of floats or callable (i, x, t)
    g: Optional[Callable] = None    # body acceleration g(i, x, t)
    perdir: tuple[int, ...] = ()
    exit_bc: bool = False
    scheme: Callable = quick
    dtype: Any = jnp.float32
    tol: float = 2e-3               # pressure solver tolerance
    itmx: int = 32                  # pressure solver max iterations
    smooth_it: int = 4              # MG smoother sweeps (`it`, `Poisson.jl:135`).
                                    # The default keeps the reference's V-cycle
                                    # strength (its ≤2/≤3 iteration-cap gates
                                    # depend on it); perf-tuned TPU configs pass
                                    # smooth_it=3 explicitly (256³: 79.2→72.6
                                    # ms/step at equal V-cycle counts — bench.py)
    fine_smooth_it: int = 0         # fine-level post-V-cycle sweeps override
                                    # (0 → smooth_it); the fine sweep is the
                                    # costliest kernel of the solve — fewer
                                    # fine sweeps can win wall-clock when the
                                    # dual-norm stop still converges in the
                                    # same iteration count
    band_x: Optional[tuple[int, int]] = None
                                    # static x-row range [lo, hi) containing
                                    # every cell with nontrivial BDIM moments
                                    # (μ0≠1 | μ1≠0 | V≠0); set at measure time
                                    # by `Simulation`, enables the band-sparse
                                    # BDIM fast path (`pallas_flat.bdim_band`)
    band_box: Optional[tuple] = None
                                    # per-dim static (lo, hi) pairs bounding
                                    # the same deviating cells in EVERY dim —
                                    # the measure-time narrow-band box
                                    # (`models.body.measure_fill(band_box=)`);
                                    # maintained alongside band_x by
                                    # `Simulation._set_band`
    band_k: Optional[int] = None    # gather-sparse measure capacity (static
                                    # candidate-band-cell count bound,
                                    # `measure_fill(sparse_k=)`); power-of-2
                                    # quantized and escape-grown by
                                    # `Simulation` alongside band_box —
                                    # measure state, not a tuning knob
    mp_smooth: bool = False         # mixed-precision MG smoothing on the flat
                                    # kernel path: bf16 coefficients +
                                    # correction cascade, f32 x/r updates
                                    # (`pallas_flat.gs_incr`).  Perf opt-in
                                    # (bench config); the library default
                                    # keeps every op at `dtype`.
    fine_presmooth: bool = True     # run the fine-level Jacobi pre-smooth of
                                    # each V-cycle (`Vcycle!` smooths every
                                    # level on the way down,
                                    # `MultiLevelPoisson.jl:88-101`).  False
                                    # drops ONLY the l=0 pass — the costliest
                                    # smoother call of the solve — leaving
                                    # restriction to act on the raw residual;
                                    # the dual-norm stop keeps solve quality,
                                    # so this is a pure cost/strength knob.

    @property
    def D(self) -> int:
        return len(self.shape)


def _inside_mask(shape, nd):
    m = None
    for d in range(nd):
        i = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - nd + d)
        md = (i > 0) & (i < shape[len(shape) - nd + d] - 1)
        m = md if m is None else (m & md)
    return m


def _zg_s(a: jax.Array) -> jax.Array:
    """Zero the ghost layer of a scalar field (iota-mask: fully fusible)."""
    return jnp.where(_inside_mask(a.shape, a.ndim), a, 0.0)


def _zg_v(a: jax.Array) -> jax.Array:
    """Zero the ghost layer of a vector field (trailing spatial dims)."""
    return jnp.where(_inside_mask(a.shape, a.ndim - 1), a, 0.0)


def scale_interior(u: jax.Array, s) -> jax.Array:
    """u *= s on interior faces only (`scale_u!`, `Flow.jl:211-214`)."""
    d = u.ndim - 1
    return set_interior(u, interior(u, d) * s, d)


def div_field(u: jax.Array) -> jax.Array:
    """Cell-centered divergence (`div`, `Flow.jl:17-23`); ghost entries zero."""
    D = u.shape[0]
    s = jnp.zeros(u.shape[1:], u.dtype)
    for i in range(D):
        s = s + (shift(u[i], i, 1) - u[i])
    return _zg_s(s)


# ---------------------------------------------------------------- conv-diff
def _slab_ix(axis: int, idx: int):
    return (slice(None),) * axis + (slice(idx, idx + 1),)


def _phi_slabs(u, f, i, j, scheme, nu, perdir, ctx):
    """Boundary-slab flux values for pair (i, j): the fixed first-interior and
    top-ghost fluxes (`ϕuL`/`ϕuR`/`ϕuP`, `Flow.jl:56-62`) plus the generic
    formula evaluated on the same slabs (needed to correct the fused kernel).

    Returns (phi_lo, phi_gen_lo, phi_hi, phi_gen_hi) — 2-D slabs (dim j kept
    with extent 1)."""
    n = f.shape[j]
    per = j in perdir
    lo, hi = _slab_ix(j, 1), _slab_ix(j, n - 1)

    def uadv_slab(sl):
        # slab-local advecting velocity: shift dim i commutes with the dim-j
        # slab when i != j; for i == j the shifted slab is the slab below
        if i == j:
            idx = sl[j].start
            return 0.5 * (u[j][sl] + u[j][_slab_ix(j, idx - 1)])
        return 0.5 * (u[j][sl] + shift(u[j][sl], i, -1))

    f0, f1, f2 = f[_slab_ix(j, 0)], f[lo], f[_slab_ix(j, 2)]
    ua = uadv_slab(lo)
    # second-upwind value for the first interior slab: ring fetch
    # (self-wrap when unsharded == the periodic ϕuP index n-3)
    f_mm = fetch_lo(ctx, f, j, j, n - 3) if (ctx is not None and sharded(ctx, j)) \
        else f[_slab_ix(j, n - 3)]
    phi_gen_lo = (ua * jnp.where(ua > 0, scheme(f_mm, f0, f1), scheme(f2, f1, f0))
                  - nu * (f1 - f0))
    # the fused kernel's generic value at this slab reads the roll-wrap
    # second-upwind value f[n-1] (not the periodic ϕuP index n-3)
    f_wrap = f[_slab_ix(j, n - 1)]
    phi_gen_lo_roll = (ua * jnp.where(ua > 0, scheme(f_wrap, f0, f1), scheme(f2, f1, f0))
                       - nu * (f1 - f0))
    if per:
        phi_lo = phi_gen_lo
    else:
        phi_l = (ua * jnp.where(ua > 0, 0.5 * (f1 + f0), scheme(f2, f1, f0))
                 - nu * (f1 - f0))
        if ctx is not None and sharded(ctx, j):
            phi_lo = jnp.where(edge_lo(ctx, j), phi_l, phi_gen_lo)
        else:
            phi_lo = phi_l

    # top ghost slab: neighbor's first flux plane (ring) or ϕuR at the
    # physical high boundary
    fm1, fm2, fm3 = f[hi], f[_slab_ix(j, n - 2)], f[_slab_ix(j, n - 3)]
    ua_h = uadv_slab(hi)
    phi_gen_hi = (ua_h * jnp.where(ua_h > 0, scheme(fm3, fm2, fm1),
                                   scheme(f0, fm1, fm2))
                  - nu * (fm1 - fm2))
    if ctx is not None and sharded(ctx, j):
        phi_wrap = jax.lax.ppermute(phi_lo, ctx.axes[j],
                                    [(s_, (s_ - 1) % ctx.sizes[j])
                                     for s_ in range(ctx.sizes[j])])
    else:
        phi_wrap = phi_lo
    if per:
        phi_hi = phi_wrap
    else:
        phi_r = (ua_h * jnp.where(ua_h < 0, 0.5 * (fm1 + fm2), scheme(fm3, fm2, fm1))
                 - nu * (fm1 - fm2))
        if ctx is not None and sharded(ctx, j):
            phi_hi = jnp.where(edge_hi(ctx, j), phi_r, phi_wrap)
        else:
            phi_hi = phi_r
    return phi_lo, phi_gen_lo_roll, phi_hi, phi_gen_hi


def conv_diff(u: jax.Array, scheme: Callable, nu, perdir: tuple[int, ...] = (),
              ctx=None):
    """Convective + diffusive momentum RHS (`conv_diff!`, `Flow.jl:38-62`).

    For every (component i, direction j) pair the flux

        Φ = uadv · λ(upwind stencil of u_i) − ν ∂u_i/∂x_j

    is evaluated with roll shifts; the first interior slab is fixed up (the
    generic 3-point upwind stencil would reach past the single ghost layer)
    and the top ghost slab receives the flux of the cell above — one-sided
    `ϕuL`/`ϕuR` at physical boundaries, wrapped `ϕuP` for periodic dirs, the
    ring-fetched neighbor values at subdomain boundaries.  The flux difference
    ``r_i = Σ_j Φ − Φ(+e_j)`` accumulates the RHS; ghost values of ``r`` are
    garbage but never read (BDIM updates the interior).

    3D single-device fields route the generic part through the fused Pallas
    kernel (`ops.pallas3d`) and add the slab corrections on top.
    """
    from ..ops import pallas3d as pl3

    D = u.shape[0]
    if D == 3 and pl3.use_pallas(u[0], ctx):
        return _conv_diff_pallas(u, scheme, nu, perdir)
    out = []
    for i in range(D):
        f = u[i]
        ri = jnp.zeros_like(f)
        for j in range(D):
            n = f.shape[j]
            uadv = 0.5 * (u[j] + shift(u[j], i, -1))
            up = scheme(shift(f, j, -2), shift(f, j, -1), f)
            dn = scheme(shift(f, j, 1), f, shift(f, j, -1))
            phi = uadv * jnp.where(uadv > 0, up, dn) - nu * (f - shift(f, j, -1))
            phi_lo, _, phi_hi, _ = _phi_slabs(u, f, i, j, scheme, nu, perdir, ctx)
            jdx = jax.lax.broadcasted_iota(jnp.int32, f.shape, j)
            phi = jnp.where(jdx == 1, phi_lo,
                            jnp.where(jdx == n - 1, phi_hi, phi))
            ri = ri + (phi - shift(phi, j, 1))
        out.append(ri)
    return jnp.stack(out)


def _conv_diff_pallas(u: jax.Array, scheme: Callable, nu,
                      perdir: tuple[int, ...]):
    """Fused-kernel path: generic RHS from `conv_diff3d_generic`, slab-flux
    corrections (`r(1) += Δφ(1)``, ``r(n-2) -= Δφ(n-1)`` per direction) and
    ghost zeroing composed in one additional elementwise pass."""
    from ..ops import pallas3d as pl3

    D = u.shape[0]
    r = pl3.conv_diff3d_generic(u, nu, scheme)
    shape = u.shape[1:]
    out = []
    for i in range(D):
        ri = r[i]
        corr = jnp.zeros((), u.dtype)
        for j in range(D):
            n = shape[j]
            phi_lo, gen_lo, phi_hi, gen_hi = _phi_slabs(
                u, u[i], i, j, scheme, nu, perdir, None)
            jdx = jax.lax.broadcasted_iota(jnp.int32, shape, j)
            corr = corr + jnp.where(jdx == 1, phi_lo - gen_lo, 0.0) \
                        - jnp.where(jdx == n - 2, phi_hi - gen_hi, 0.0)
        # zero the x/y ghost rows the kernel never writes (uninitialized)
        g = None
        for dd, nn in ((0, shape[0]), (1, shape[1])):
            idx = jax.lax.broadcasted_iota(jnp.int32, shape, dd)
            gd = (idx == 0) | (idx == nn - 1)
            g = gd if g is None else (g | gd)
        out.append(jnp.where(g, 0.0, ri + corr))
    return jnp.stack(out)


# ---------------------------------------------------------------- forcing
def accelerate(f: jax.Array, t, g: Optional[Callable], ubc,
               dtype, ctx=None) -> jax.Array:
    """Applied + reference-frame acceleration ``f += g(i,x,t) + dU/dt``
    (`accelerate!`, `Flow.jl:69-73`).  ``dU/dt`` is the exact `jax.jvp` time
    derivative of a callable boundary spec — the JAX-native version of the
    reference's ForwardDiff `derivative` seeding (`src/core.jl:268`)."""
    has_ubc_t = callable(ubc)
    if g is None and not has_ubc_t:
        return f
    D = f.shape[0]
    shape = f.shape[1:]
    off = offsets(ctx, shape) if ctx is not None else None
    t = jnp.asarray(t, dtype)
    for i in range(D):
        coords = loc_grid(i, shape, dtype, off).reshape(D, -1).T
        add = 0.0
        if g is not None:
            add = add + jax.vmap(lambda x: g(i, x, t))(coords)
        if has_ubc_t:
            dudt = jax.vmap(lambda x: jax.jvp(lambda tt: ubc(i, x, tt),
                                              (t,), (jnp.ones_like(t),))[1])(coords)
            add = add + dudt
        f = f.at[i].add(add.reshape(shape).astype(f.dtype))
    return f


# ---------------------------------------------------------------- BDIM
def bdim_update(u: jax.Array, u0: jax.Array, f: jax.Array, V: jax.Array,
                mu0: jax.Array, mu1: jax.Array, dt, ctx=None) -> jax.Array:
    """BDIM convolution (`BDIM!`, `Flow.jl:176-180`):

        f* = u0 + dt·f − V
        u += μ1·∇f* + V + μ0·f*   (interior faces only)

    The μ1·∇f* gradient reads the halos of f*, so they are ring-refreshed
    under decomposition (bodies straddling shard boundaries).
    """
    from ..ops import pallas3d as pl3

    D = u.shape[0]
    fp = u0 + dt * f - V
    fp = sync_vector(fp, ctx)
    if D == 3 and pl3.use_pallas(u[0], ctx):
        return pl3.bdim3d(u, fp, V, mu0, mu1)
    terms = []
    for i in range(D):
        mu_ddn = jnp.zeros_like(fp[i])
        for j in range(D):
            mu_ddn = mu_ddn + mu1[i, j] * (shift(fp[i], j, 1) - shift(fp[i], j, -1))
        terms.append(0.5 * mu_ddn + V[i] + mu0[i] * fp[i])
    return u + _zg_v(jnp.stack(terms))


# ---------------------------------------------------------------- projection
def project(u: jax.Array, p: jax.Array, levels, masks, dt_w,
            cfg: "FlowCfg", t, solve_fn=None, ctx=None, n_dist: int = 0):
    """Pressure projection (`mom_project!`, `Flow.jl:223-232`): solve
    ``A x = div(u)`` with the dt-scaled previous pressure as warm start, then
    ``u_i -= L_i ∂_i x`` and unscale ``p = x/dt``.  ``solve_fn`` is the
    pressure-solver injection point (`pois_ctor`, `src/WaterLily.jl:96-97`)."""
    z = div_field(u)
    x = p * dt_w
    solver = solve_fn if solve_fn is not None else (
        lambda lv, mk, x, z, tol, itmx, perdir: mg.solve_mg_implicit(
            lv, mk, x, z, tol=tol, itmx=itmx, perdir=perdir,
            smooth_it=cfg.smooth_it,
            ctx=ctx, n_dist=n_dist, fine_smooth_it=cfg.fine_smooth_it,
            fine_presmooth=cfg.fine_presmooth))
    res = solver(levels, masks, x, z, cfg.tol, cfg.itmx, cfg.perdir)
    x = res.x
    L = levels[0].L
    for i in range(cfg.D):
        gradp = x - shift(x, i, -1)
        u = u.at[i].add(-_zg_s(L[i] * gradp))
    p = x / dt_w
    u = bc_vector(u, cfg.ubc, t, cfg.exit_bc, cfg.perdir, ctx)
    return u, p, res.iters, res.stats


# ---------------------------------------------------------------- CFL
def cfl(u: jax.Array, nu, dt_max: float = 10.0, ctx=None):
    """New time step from the max outflow flux (`CFL`, `Flow.jl:234-244`);
    a pmax under sharding."""
    D = u.shape[0]
    s = jnp.zeros(u.shape[1:], u.dtype)
    for i in range(D):
        s = s + jnp.maximum(0.0, shift(u[i], i, 1)) + jnp.maximum(0.0, -u[i])
    m = pmax_all(jnp.max(interior(s)), ctx)
    return jnp.minimum(jnp.asarray(dt_max, u.dtype), 1.0 / (m + 5 * nu))


# ---------------------------------------------------------------- mom_step
def _phase(state: FlowState, u_adv: jax.Array, u_into: jax.Array, f_t,
           dt, cfg: FlowCfg, udf, ctx=None):
    """One momentum phase (shared predictor/corrector body,
    `mom_predict!`/`mom_correct!`, `Flow.jl:190-210`)."""
    f = conv_diff(u_adv, cfg.scheme, state.nu, cfg.perdir, ctx)
    if udf is not None:
        # the udf sees the in-progress u (zeroed interior in the predictor)
        # and the advecting field, matching `udf!` (`Flow.jl:255-257`)
        f = udf(f, dataclasses.replace(state, u=u_into), u_adv, f_t)
    f = accelerate(f, f_t, cfg.g, cfg.ubc, cfg.dtype, ctx)
    u = bdim_update(u_into, state.u0, f, state.V, state.mu0, state.mu1, dt, ctx)
    return u


def mom_step_impl(cfg: FlowCfg, state: FlowState, levels, masks, dt, t0,
                  udf=None, solve_fn=None, ctx=None, n_dist: int = 0):
    """One full time step (`mom_step!`, `Flow.jl:156-167`): predictor advected
    by u0, projection (w=1), trapezoidal corrector advected by the projected u,
    projection (w=0.5), then the CFL limit for the next step.

    ``ctx``/``n_dist`` select the distributed (shard_map) variant; the
    numerics are shared.  Returns ``(state', dt_next, pois_iters(2,),
    solver_stats(2, itmx+1, 3))``.
    """
    t1 = t0 + dt
    u0 = state.u
    state = dataclasses.replace(state, u0=u0)
    # predictor: u zeroed in the interior, advect with u0 (`Flow.jl:157-161`)
    u = scale_interior(u0, 0.0)
    u = _phase(state, u0, u, t0, dt, cfg, udf, ctx)
    u = bc_vector(u, cfg.ubc, t1, cfg.exit_bc, cfg.perdir, ctx)
    if cfg.exit_bc:
        u = exit_bc(u, u0, dt, ctx)
    u, p, n1, s1 = project(u, state.p, levels, masks, dt, cfg, t1, solve_fn,
                           ctx, n_dist)
    # corrector: advect with the projected u, blend 0.5 (`Flow.jl:163-165`)
    u = _phase(state, u, u, t1, dt, cfg, udf, ctx)
    u = scale_interior(u, 0.5)
    u = bc_vector(u, cfg.ubc, t1, cfg.exit_bc, cfg.perdir, ctx)
    u, p, n2, s2 = project(u, p, levels, masks, 0.5 * dt, cfg, t1, solve_fn,
                           ctx, n_dist)
    state = dataclasses.replace(state, u=u, p=p)
    dt_next = cfl(u, state.nu, ctx=ctx)
    return state, dt_next, jnp.stack([n1, n2]), jnp.stack([s1, s2])


@partial(jax.jit, static_argnames=("cfg", "masks", "udf", "solve_fn"))
def mom_step(cfg: FlowCfg, state: FlowState, levels, masks, dt, t0,
             udf=None, solve_fn=None):
    """Single-device jitted `mom_step_impl` (distributed callers wrap the
    impl in `shard_map`, see `parallel.dist`)."""
    return mom_step_impl(cfg, state, levels, masks, dt, t0, udf, solve_fn)


# ---------------------------------------------------------------- host wrapper
def init_state(cfg: "FlowCfg", nu, u0=None) -> "FlowState":
    """Pure constructor of the initial `FlowState` (`Flow`, `Flow.jl:133-147`):
    apply the initial condition over all faces, enforce BCs, run the
    constructor-time `exitBC!`, and zero the BDIM moments.  Kept free of side
    effects so the whole thing traces into ONE device program
    (`_init_state_jit`) — eager op-by-op construction costs a tunnel round
    trip per op on remote backends."""
    D, shape, dtype = cfg.D, cfg.shape, cfg.dtype
    ubc = cfg.ubc
    if u0 is None:
        if callable(ubc):
            u = apply_vector(lambda i, x: ubc(i, x, jnp.asarray(0.0, dtype)),
                             D, shape, dtype)
        else:
            u = jnp.broadcast_to(
                jnp.asarray(ubc, dtype).reshape((D,) + (1,) * D),
                (D,) + shape).astype(dtype)
    elif callable(u0):
        u = apply_vector(u0, D, shape, dtype)
    else:
        u = jnp.broadcast_to(jnp.asarray(u0, dtype).reshape((D,) + (1,) * D),
                             (D,) + shape).astype(dtype)
    u = bc_vector(u, ubc, 0.0, cfg.exit_bc, cfg.perdir)
    u = exit_bc_init(u)
    mu0 = bc_vector(jnp.ones((D,) + shape, dtype), (0.0,) * D,
                    save_exit=False, perdir=cfg.perdir)
    return FlowState(
        u=u, u0=u, p=jnp.zeros(shape, dtype),
        V=jnp.zeros((D,) + shape, dtype), mu0=mu0,
        mu1=jnp.zeros((D, D) + shape, dtype),
        nu=jnp.asarray(nu, dtype))


@partial(jax.jit, static_argnames=("cfg", "u0"))
def _init_state_jit(cfg, nu, u0=None):
    return init_state(cfg, nu, u0)


class Flow:
    """Host-side flow container: a `FlowState` pytree + static `FlowCfg` +
    the CPU time-step history (`Flow`, `Flow.jl:131-148`)."""

    def __init__(self, N: tuple[int, ...], ubc, dt: float = 0.25, nu: float = 0.0,
                 g: Optional[Callable] = None, u0=None, perdir: tuple[int, ...] = (),
                 exit_bc: bool = False, scheme: Callable = quick,
                 dtype=jnp.float32, tol: float = 2e-3, itmx: int = 32,
                 smooth_it: Optional[int] = None,
                 fine_smooth_it: Optional[int] = None,
                 mp_smooth: Optional[bool] = None,
                 fine_presmooth: Optional[bool] = None):
        shape = tuple(n + 2 for n in N)
        self.cfg = FlowCfg(shape=shape, ubc=_norm_ubc(ubc), g=g,
                           perdir=tuple(perdir), exit_bc=bool(exit_bc),
                           scheme=scheme, dtype=dtype, tol=tol, itmx=itmx,
                           smooth_it=_env_int("WLTPU_SMOOTH_IT", smooth_it, 4),
                           fine_smooth_it=_env_int("WLTPU_FINE_SMOOTH_IT",
                                                   fine_smooth_it, 0),
                           mp_smooth=bool(_env_int("WLTPU_MP_SMOOTH",
                                                   mp_smooth, 0)),
                           fine_presmooth=bool(_env_int(
                               "WLTPU_FINE_PRESMOOTH", fine_presmooth, 1)))
        if u0 is not None and not callable(u0):
            u0 = tuple(float(v) for v in u0)   # hashable jit key
        self._refresh = None            # lazy-sync hook (flat-engine backed)
        # nu stays traced (not float()ed): whole-simulation differentiation
        # builds Simulations under jacfwd with nu a tracer (`Flow{D,T}`
        # Dual-typed fields, `src/Flow.jl:114-131`)
        self.state = _init_state_jit(self.cfg, nu, u0)
        self.dt = [float(dt)]           # host-side Δt history (`Flow.jl:127`)
        self.pois_n: list[int] = []     # pressure iterations per projection

    @property
    def state(self) -> "FlowState":
        """The `FlowState` pytree.  When an alternate-layout engine is active
        (`Simulation._flat`), the authoritative fields live in that layout and
        are converted here on first access after a step (lazy sync keeps the
        per-step hot loop free of layout copies)."""
        if self._refresh is not None:
            self._refresh()
        return self._state

    @state.setter
    def state(self, value: "FlowState"):
        self._state = value

    # convenience accessors mirroring the reference field names
    @property
    def u(self):
        return self.state.u

    @property
    def p(self):
        return self.state.p

    @property
    def mu0(self):
        return self.state.mu0

    @property
    def V(self):
        return self.state.V

    @property
    def nu(self):
        return float(self.state.nu)

    @property
    def time(self) -> float:
        """Current flow time = sum(dt[:-1]) (`time`, `Flow.jl:174`)."""
        return float(sum(self.dt[:-1]))


def exit_bc_init(u: jax.Array) -> jax.Array:
    """Constructor-time `exitBC!(u,u,0)` (`Flow.jl:141`)."""
    return exit_bc(u, u, 0.0)


def _env_int(name: str, explicit, default: int) -> int:
    """Explicit kwarg > environment variable > default — resolved once at
    construction time so no `os.environ` read happens inside traced code."""
    import os

    if explicit is not None:
        return int(explicit)
    return int(os.environ.get(name, default))


def _norm_ubc(ubc):
    """Normalize a boundary spec: tuples of numbers become float tuples."""
    if callable(ubc):
        return ubc
    return tuple(float(v) for v in ubc)
