"""Sub-grid-scale LES forcing through the udf hook.

TPU-native port of `sgs!` (`/root/reference/src/util.jl:45-76`): the Boussinesq
SGS stress -2·νt·S̄ is added to the momentum RHS as a flux-difference body
force, evaluated on the phase's advecting velocity (u0 in the predictor, the
projected u in the corrector — the advecting-velocity semantics the reference
fixed in its udf machinery, `test/test_les.jl`).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..ops.grid import interior, grow, shift
from .metrics import strain_field

__all__ = ["smagorinsky", "sgs"]


def smagorinsky(Cs: float = 0.17, delta: float = 1.0) -> Callable:
    """Standard Smagorinsky-Lilly eddy viscosity νt = (Cs·Δ)²·√(S:S)
    (`util.jl:57-63`; matches the reference implementation's norm)."""

    def nu_t(S):
        return (Cs * delta) ** 2 * jnp.sqrt(jnp.sum(S**2, axis=(0, 1)))

    return nu_t


def sgs(nu_t_fn: Callable = None):
    """Build a udf adding the SGS stress divergence to the RHS
    (`sgs!`, `util.jl:66-76`).  Use as ``sim.sim_step(..., udf=sgs(...))``.

    The returned udf also carries a ``flat`` attribute — a native flat-layout
    implementation so the LES configs stay on the flat TPU engine with no
    per-step layout conversions (`models.flowflat._apply_udf_flat`)."""
    nu_t_fn = nu_t_fn or smagorinsky()

    def udf(f, state, u_adv, t):
        D = f.shape[0]
        S = strain_field(u_adv)
        nu_t = nu_t_fn(S)
        for i in range(D):
            for j in range(D):
                flux = -nu_t * (u_adv[i] - shift(u_adv[i], j, -1))
                # restrict the flux to the reference's inside_u(N, j) range:
                # zero at the first interior and ghost slabs of dim j
                n = flux.shape[j]
                idx = jax.lax.broadcasted_iota(jnp.int32, flux.shape, j)
                flux = jnp.where((idx >= 2) & (idx <= n - 2), flux, 0.0)
                f = f.at[i].add(flux - shift(flux, j, 1))
        return f

    def udf_flat(f, state, u_adv, t, g, ctx=None):
        from ..ops.dist import edge_hi, edge_lo, fetch_hi, sharded
        from ..ops.flat import shift_flat, yz_planes

        def dudx(i, j):
            # `∂(i,j,I,u)` (`Metrics.jl:42-44`) on flat fields
            if i == j:
                return shift_flat(u_adv[i], g, i, 1) - u_adv[i]
            a = shift_flat(u_adv[i], g, j, 1)
            b = shift_flat(u_adv[i], g, j, -1)
            return (a + shift_flat(a, g, i, 1) - b - shift_flat(b, g, i, 1)) / 4

        S = jnp.stack([jnp.stack([(dudx(i, j) + dudx(j, i)) / 2
                                  for j in range(3)]) for i in range(3)])
        nu_t = nu_t_fn(S)
        yv, zv, _ = yz_planes(g, f.dtype)
        gx = jax.lax.broadcasted_iota(jnp.int32, f.shape[1:], 0)
        planes = ((gx, g.Nx), (yv, g.Ny), (zv, g.Nz))
        dist_x = ctx is not None and sharded(ctx, 0)
        for i in range(3):
            for j in range(3):
                flux = -nu_t * (u_adv[i] - shift_flat(u_adv[i], g, j, -1))
                idx, n = planes[j]
                if j == 0 and dist_x:
                    # inside_u restriction applies at the PHYSICAL x
                    # boundaries only; interior shard edges keep the flux,
                    # and the ghost-row flux comes from the right neighbor
                    keep = (idx <= n - 2) & jnp.where(edge_lo(ctx, 0),
                                                      idx >= 2, idx >= 1)
                    flux = jnp.where(keep, flux, 0.0)
                    ax = flux.ndim - 3
                    ghost = jnp.where(edge_hi(ctx, 0), 0.0,
                                      fetch_hi(ctx, flux, ax, 0, 1))
                    flux = jnp.where(idx == n - 1, ghost, flux)
                else:
                    flux = jnp.where((idx >= 2) & (idx <= n - 2), flux, 0.0)
                f = f.at[i].add(flux - shift_flat(flux, g, j, 1))
        return f

    udf.flat = udf_flat
    return udf
