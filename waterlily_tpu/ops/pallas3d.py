"""Pallas TPU kernels for the hot 3D stencils.

XLA's roll-based stencil fusion bottoms out ~2x off memory bandwidth and will
not fuse the 9-flux conv_diff chain (measured 38 ms at 256^3 vs a ~1.2 ms
bandwidth bound); these kernels read each field once per pass.

Pattern: a grid over x-row blocks with the full (y, z) planes resident in
VMEM — Mosaic constrains HBM DMA slices to 8-aligned sizes on the sublane dim
and 128-aligned extents on the lane dim (unaligned ones crash the worker), so
only the unconstrained leading dim is windowed; z is zero-padded to a lane
multiple.  Each program DMAs its halo window HBM→VMEM (window start = block
start − halo, always in-bounds because the generic stencil only covers rows
[h, N−h) — the outermost rows are owned by the jnp boundary-fix pass),
computes with in-VMEM concat-shifts (y/z shifts wrap over the full extent,
matching the global roll semantics), and DMAs the result block back.  Edge
blocks are clamped to overlap, so duplicate writes carry identical values.

Numerics match the jnp path exactly on the covered region; the callers
(`models.flow.conv_diff`, `ops.poisson`) compose the boundary slabs on top.
"""
from __future__ import annotations

import os
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["use_pallas", "conv_diff3d_generic", "gauss_sweep3d", "gauss_sweeps3d", "mult3d", "bdim3d", "gs_incr3d", "jacobi_incr3d"]

_BLK = 32    # x/y rows per output block
_INTERPRET = False   # set True to run kernels in interpreter mode (tests)
_IN_LOOP = False     # manual switch to the jnp reference path (tests/bench);
                     # the round-1 "de-pipelines 15x in while_loop" claim was
                     # an artifact of the div_k race — solver code no longer
                     # sets this (see ops.pallas_flat._IN_LOOP)


def use_pallas(a: jax.Array, ctx=None) -> bool:
    """Pallas gate: big 3D f32 fields, single device, TPU backend; disable
    with WLTPU_PALLAS=0."""
    if os.environ.get("WLTPU_PALLAS", "1") == "0":
        return False
    if _IN_LOOP:
        return False
    if ctx is not None:
        return False
    if a.dtype != jnp.float32 or a.ndim < 3:
        return False
    sp = a.shape[-3:]
    if len(sp) != 3 or min(sp) < 18:
        return False
    if _INTERPRET:
        return True
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:  # pragma: no cover
        return False


def _nblocks(n_cov: int, b: int) -> int:
    return max(1, -(-n_cov // b))


def _roundup(n: int, m: int) -> int:
    return -(-n // m) * m


def _pad_tail(a: jax.Array, wrap: bool = False) -> jax.Array:
    """Pad the sublane (y) dim to a multiple of 8 and the lane (z) dim to a
    multiple of 128 — Mosaic DMA slices of unaligned extents crash the TPU
    worker (measured empirically).

    With ``wrap`` the final pad entry of each padded dim holds the global
    wrap value (row/col N-1): it is the only padded entry an in-window wrap
    shift can reach from a covered row, which keeps the fused generic formula
    identical to the jnp roll semantics at the slab rows the fix pass owns.
    """
    Ny, Nz = a.shape[-2], a.shape[-1]
    Nyp, Nzp = _roundup(Ny, 8), _roundup(Nz, 128)
    if Nyp - Ny == 1:   # need distinct first/last pad entries for wrap values
        Nyp += 8
    if Nzp - Nz == 1:
        Nzp += 128
    if (Nyp, Nzp) == (Ny, Nz):
        return a
    pad = [(0, 0)] * (a.ndim - 2) + [(0, Nyp - Ny), (0, Nzp - Nz)]
    out = jnp.pad(a, pad)
    if wrap:
        # in-window wrap reads from covered rows touch exactly two padded
        # entries per dim: index N (a +1/+2 read past the top ghost → global
        # roll value = row 0) and index Np-1 (a -1/-2 read below row 1 →
        # global roll value = row N-1)
        if Nzp != Nz:
            out = out.at[..., Nz].set(out[..., 0])
            out = out.at[..., -1].set(out[..., Nz - 1])
        if Nyp != Ny:
            out = out.at[..., Ny, :].set(out[..., 0, :])
            out = out.at[..., -1, :].set(out[..., Ny - 1, :])
    return out


def _halo_map(body: Callable, n_win: int, n_scalar: int, n_out: int,
              shape, h: int, out_shape=None, out_shift: int = 0,
              bx: int = 4, halos=None):
    """Run ``body(win_list, scalars, xs) -> out_list`` over x-row halo
    windows with the full (y, z) extent resident.

    ``win_list[k]``: (bx+2*halos[k], Ny, Nz) arrays; ``scalars``: SMEM values;
    ``xs``: window start (for global parity).  ``halos`` gives a per-input
    halo depth (default ``h`` everywhere); inputs that are only read at the
    output rows can use 0.  Outputs must be (bx, Ny, Nz), written at row
    ``xs+h+out_shift`` (the ``out_shift`` maps a wrap-extended input grid back
    onto the original one).
    """
    Nx, Ny, Nz = shape
    out_shape = out_shape or shape
    bx = min(bx, Nx - 2 * h)
    wx = bx + 2 * h
    nbx = _nblocks(Nx - 2 * h, bx)
    halos = list(halos) if halos is not None else [h] * n_win

    def kernel(*refs):
        scal = refs[:n_scalar]
        ins = refs[n_scalar:n_scalar + n_win]
        outs = refs[n_scalar + n_win:n_scalar + n_win + n_out]
        k0 = n_scalar + n_win + n_out
        win = refs[k0:k0 + n_win]
        obuf = refs[k0 + n_win:k0 + n_win + n_out]
        sem_in = refs[-2]
        sem_out = refs[-1]
        ix = pl.program_id(0)
        xs = jnp.minimum(h + ix * bx, Nx - h - bx) - h

        in_copies = [pltpu.make_async_copy(
            ins[k].at[pl.ds(xs + h - halos[k], bx + 2 * halos[k])],
            win[k], sem_in.at[k])
            for k in range(n_win)]
        for c in in_copies:
            c.start()
        for c in in_copies:
            c.wait()
        scalars = [s[0, 0] for s in scal]
        results = body([w[:] for w in win], scalars, xs)
        out_copies = []
        for k in range(n_out):
            obuf[k][:] = results[k]
            c = pltpu.make_async_copy(
                obuf[k], outs[k].at[pl.ds(xs + h + out_shift, bx)],
                sem_out.at[k])
            c.start()
            out_copies.append(c)
        for c in out_copies:
            c.wait()

    out_shapes = tuple(jax.ShapeDtypeStruct(tuple(out_shape), jnp.float32)
                       for _ in range(n_out))

    def call(*arrays):
        outs = pl.pallas_call(
            kernel,
            grid=(nbx,),
            in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)] * n_scalar
                      + [pl.BlockSpec(memory_space=pltpu.ANY)] * n_win),
            out_specs=tuple(pl.BlockSpec(memory_space=pltpu.ANY)
                            for _ in range(n_out)),
            out_shape=out_shapes,
            scratch_shapes=([pltpu.VMEM((bx + 2 * halos[k], Ny, Nz), jnp.float32)
                             for k in range(n_win)]
                            + [pltpu.VMEM((bx, Ny, Nz), jnp.float32)
                               for _ in range(n_out)]
                            + [pltpu.SemaphoreType.DMA((n_win,)),
                               pltpu.SemaphoreType.DMA((n_out,))]),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=_INTERPRET,
        )(*arrays)
        return list(outs) if isinstance(outs, (tuple, list)) else [outs]

    return call


def _halo_map_all(body: Callable, n_win: int, n_scalar: int, n_out: int,
                  shape, h: int, bx: int = 4, halos=None):
    """Like `_halo_map`, but covers ALL interior rows [1, Nx-1): window starts
    clamp into the array and the body receives the dynamic center offset
    ``co`` (output rows = window rows [co, co+bx)) plus the raw VMEM refs so
    it can do dynamic-offset reads.  ``body(win_refs, scalars, xs, co) ->
    out_list`` with outputs (bx, Ny, Nz) written at row ``xs + co``.
    """
    Nx, Ny, Nz = shape
    n_cov = Nx - 2
    bx = min(bx, n_cov)
    wx = bx + 2 * h
    if wx > Nx:
        wx = Nx
    nbx = _nblocks(n_cov, bx)
    halos = list(halos) if halos is not None else [h] * n_win

    def kernel(*refs):
        scal = refs[:n_scalar]
        ins = refs[n_scalar:n_scalar + n_win]
        outs = refs[n_scalar + n_win:n_scalar + n_win + n_out]
        k0 = n_scalar + n_win + n_out
        win = refs[k0:k0 + n_win]
        obuf = refs[k0 + n_win:k0 + n_win + n_out]
        sem_in = refs[-2]
        sem_out = refs[-1]
        ix = pl.program_id(0)
        ox = jnp.minimum(1 + ix * bx, Nx - 1 - bx)       # output start row
        in_copies = []
        cos = []
        for k in range(n_win):
            wk = bx + 2 * halos[k] if bx + 2 * halos[k] <= Nx else Nx
            ws = jnp.clip(ox - halos[k], 0, Nx - wk)
            cos.append(ox - ws)
            in_copies.append(pltpu.make_async_copy(
                ins[k].at[pl.ds(ws, wk)], win[k], sem_in.at[k]))
        for c in in_copies:
            c.start()
        for c in in_copies:
            c.wait()
        scalars = [sc[0, 0] for sc in scal]
        results = body(win, scalars, ox, cos)
        out_copies = []
        for k in range(n_out):
            obuf[k][:] = results[k]
            c = pltpu.make_async_copy(
                obuf[k], outs[k].at[pl.ds(ox, bx)], sem_out.at[k])
            c.start()
            out_copies.append(c)
        for c in out_copies:
            c.wait()

    out_shapes = tuple(jax.ShapeDtypeStruct(tuple(shape), jnp.float32)
                       for _ in range(n_out))

    def call(*arrays):
        outs = pl.pallas_call(
            kernel,
            grid=(nbx,),
            in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)] * n_scalar
                      + [pl.BlockSpec(memory_space=pltpu.ANY)] * n_win),
            out_specs=tuple(pl.BlockSpec(memory_space=pltpu.ANY)
                            for _ in range(n_out)),
            out_shape=out_shapes,
            scratch_shapes=([pltpu.VMEM((min(bx + 2 * halos[k], Nx), Ny, Nz),
                                        jnp.float32) for k in range(n_win)]
                            + [pltpu.VMEM((bx, Ny, Nz), jnp.float32)
                               for _ in range(n_out)]
                            + [pltpu.SemaphoreType.DMA((n_win,)),
                               pltpu.SemaphoreType.DMA((n_out,))]),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024),
            interpret=_INTERPRET,
        )(*arrays)
        return list(outs) if isinstance(outs, (tuple, list)) else [outs]

    return call


def _wshift(a: jax.Array, d: int, s: int) -> jax.Array:
    """In-window shift with wraparound: b[I] = a[I + s e_d] (same semantics
    as `grid.shift`; for the full-extent z dim the wrap IS the global roll)."""
    if s == 0:
        return a
    sl_hi = (slice(None),) * d + (slice(s % a.shape[d], None),)
    sl_lo = (slice(None),) * d + (slice(None, s % a.shape[d]),)
    return jnp.concatenate([a[sl_hi], a[sl_lo]], axis=d)


def conv_diff3d_generic(u: jax.Array, nu, scheme: Callable) -> jax.Array:
    """Fused generic convective-diffusive RHS over every interior row
    (x/y in [1, N-1), full z) — the roll-based generic formula of
    `models.flow.conv_diff` including the global wraparound reads, achieved by
    wrap-padding x/y by one row so the halo windows never leave the array.
    Ghost rows of the result are unwritten; the caller composes the
    per-direction slab-flux corrections and zeroes/ignores the ghosts."""
    shape = u.shape[1:]
    Ny, Nz = shape[1], shape[2]
    # wrap-pad x so the generic rolls see the global wrap values
    u_ext = jnp.pad(u, [(0, 0), (1, 1), (0, 0), (0, 0)], mode="wrap")
    u_ext = _pad_tail(u_ext, wrap=True)

    def body(win, scalars, xs):
        nu_s = scalars[0]
        w = (win[0], win[1], win[2])
        outs = []
        for i in range(3):
            f = w[i]
            ri = jnp.zeros_like(f)
            for j in range(3):
                uadv = 0.5 * (w[j] + _wshift(w[j], i, -1))
                fm1 = _wshift(f, j, -1)
                up = scheme(_wshift(f, j, -2), fm1, f)
                dn = scheme(_wshift(f, j, 1), f, fm1)
                phi = uadv * jnp.where(uadv > 0, up, dn) - nu_s * (f - fm1)
                ri = ri + (phi - _wshift(phi, j, 1))
            outs.append(ri[2:-2])
        return outs

    out_shape = (shape[0],) + u_ext.shape[2:]
    call = _halo_map(body, 3, 1, 3, u_ext.shape[1:], h=2,
                     out_shape=out_shape, out_shift=-1, bx=8)
    nu1 = jnp.asarray(nu, jnp.float32).reshape(1, 1)
    r = call(nu1, u_ext[0], u_ext[1], u_ext[2])
    return jnp.stack(r)[:, :, :Ny, :Nz]


def gauss_sweeps3d(eps: jax.Array, r: jax.Array, L: jax.Array, iD: jax.Array,
                   colors, perdir: tuple[int, ...] = ()) -> jax.Array:
    """Run a sequence of red-black Gauss-Seidel color sweeps
    (`gauss`/`gauss_rb`, `Poisson.jl:116-132`): per sweep,
    eps[cells with index-sum parity == color] = (r − Σ L-weighted
    neighbors)·iD on the interior; everything else keeps its value.

    All arrays are tail-padded once and stay padded across the sweeps (the
    periodic ghost refresh between sweeps runs on the real slab indices).
    """
    Nx, Ny, Nz = eps.shape
    eps_p, r_p, iD_p = _pad_tail(eps), _pad_tail(r), _pad_tail(iD)
    L_p = _pad_tail(L)
    shape = eps_p.shape

    def make_body(color):
        def body(win, scalars, xs):
            e, rr, l0, l1, l2, idw = win
            Ls = (l0, l1, l2)
            s = rr
            for d in range(3):
                s = s - (_wshift(e, d, -1) * Ls[d] + _wshift(e, d, 1) * _wshift(Ls[d], d, 1))
            s = s * idw
            par = (jax.lax.broadcasted_iota(jnp.int32, e.shape, 0)
                   + jax.lax.broadcasted_iota(jnp.int32, e.shape, 1)
                   + jax.lax.broadcasted_iota(jnp.int32, e.shape, 2)
                   + xs)
            ydx = jax.lax.broadcasted_iota(jnp.int32, e.shape, 1)
            zdx = jax.lax.broadcasted_iota(jnp.int32, e.shape, 2)
            mask = ((par % 2) == (color % 2)) & (zdx >= 1) & (zdx <= Nz - 2) \
                   & (ydx >= 1) & (ydx <= Ny - 2)
            return [jnp.where(mask, s, e)[1:-1]]
        return body

    ghost_lo, ghost_hi = eps_p[0:1], eps_p[-1:]
    for k, color in enumerate(colors):
        call = _halo_map(make_body(int(color)), 6, 0, 1, shape, h=1, bx=2)
        eps_p = call(eps_p, r_p, L_p[0], L_p[1], L_p[2], iD_p)[0]
        # the kernel never writes the x-ghost rows: restore them (the raw
        # output rows are uninitialized device memory — even multiplied by a
        # zero face coefficient a NaN would poison the stencil)
        eps_p = eps_p.at[0:1].set(ghost_lo).at[-1:].set(ghost_hi)
        if k + 1 < len(colors) and perdir:
            for j in perdir:   # periodic ghost refresh at the REAL slabs
                n = (Nx, Ny, Nz)[j]
                sl0 = (slice(None),) * j + (slice(0, 1),)
                sl1 = (slice(None),) * j + (slice(1, 2),)
                slm = (slice(None),) * j + (slice(n - 2, n - 1),)
                slg = (slice(None),) * j + (slice(n - 1, n),)
                eps_p = eps_p.at[sl0].set(eps_p[slm])
                eps_p = eps_p.at[slg].set(eps_p[sl1])
    return eps_p[:, :Ny, :Nz]


def gauss_sweep3d(eps: jax.Array, r: jax.Array, L: jax.Array, iD: jax.Array,
                  color: int) -> jax.Array:
    """Single color sweep (see `gauss_sweeps3d`)."""
    return gauss_sweeps3d(eps, r, L, iD, [color])


def bdim3d(u: jax.Array, fp: jax.Array, V: jax.Array, mu0: jax.Array,
           mu1: jax.Array) -> jax.Array:
    """Fused BDIM update (`BDIM!`, `Flow.jl:176-180`) for one velocity
    component ``i`` at a time:

        u_i += 0.5·Σ_j mu1[i,j]·(fp_i(+e_j) − fp_i(−e_j)) + V_i + mu0_i·fp_i

    on the interior (ghost faces untouched).  ``fp = u0 + dt·f − V`` is
    precomputed (single fused elementwise pass)."""
    D3, shape = u.shape[0], u.shape[1:]
    Ny, Nz = shape[1], shape[2]
    out = []
    for i in range(D3):
        ins = [_pad_tail(u[i]), _pad_tail(fp[i], wrap=True), _pad_tail(V[i]),
               _pad_tail(mu0[i])] + [_pad_tail(mu1[i, j]) for j in range(D3)]
        pshape = ins[0].shape

        def body(win, scalars, xs):
            ui, fpi, vi, m0, m10, m11, m12 = win
            m1 = (m10, m11, m12)
            # center rows of the halo-1 fp window
            c = fpi[1:-1]
            acc = jnp.zeros_like(ui)
            for j in range(3):
                if j == 0:
                    dj = fpi[2:] - fpi[:-2]
                else:
                    dj = _wshift(c, j, 1) - _wshift(c, j, -1)
                acc = acc + m1[j] * dj
            upd = 0.5 * acc + vi + m0 * c
            ydx = jax.lax.broadcasted_iota(jnp.int32, ui.shape, 1)
            zdx = jax.lax.broadcasted_iota(jnp.int32, ui.shape, 2)
            inside = (ydx >= 1) & (ydx <= Ny - 2) & (zdx >= 1) & (zdx <= Nz - 2)
            return [jnp.where(inside, ui + upd, ui)]

        call = _halo_map(body, 7, 0, 1, pshape, h=1, bx=4,
                         halos=[0, 1, 0, 0, 0, 0, 0])
        o = call(*ins)[0]
        # x-ghost rows are never written: keep the input values there
        o = o.at[0:1].set(ins[0][0:1]).at[-1:].set(ins[0][-1:])
        out.append(o[:, :Ny, :Nz])
    return jnp.stack(out)


def gs_incr3d(x: jax.Array, r: jax.Array, L: jax.Array, D: jax.Array,
              iD: jax.Array, colors, omega) -> tuple[jax.Array, jax.Array]:
    """Communication-avoiding fused red-black smoother + increment
    (`GaussSeidelRB!` + `increment!`, `Poisson.jl:100-148`, non-periodic):

        eps = (r · iD) with zero ghosts
        for color in colors: eps[colored interior] = gauss(eps)
        x += ω·eps;  r -= ω·A·eps        (interior)

    One kernel pass: each x-block recomputes the sweep cascade inside its halo
    (depth = n_sweeps + 1), so sweeps never need cross-block communication —
    every block reproduces its neighbors' values exactly.  Near the physical
    boundaries the cascade reads zero ghosts (face coefficients are zero
    there), so clamped windows stay exact.
    """
    Nx, Ny, Nz = x.shape
    it = len(colors)
    h = it + 1
    x_p, r_p, iD_p, D_p = _pad_tail(x), _pad_tail(r), _pad_tail(iD), _pad_tail(D)
    L_p = _pad_tail(L)
    shape = x_p.shape
    omega = jnp.asarray(omega, jnp.float32).reshape(1, 1)
    bx = 4

    def body(win, scalars, ox, cos):
        om = scalars[0]
        xw, rw, idww, dw, l0w, l1w, l2w = win
        rr, idw = rw[:], idww[:]
        Ls = [l0w[:], l1w[:], l2w[:]]
        co = cos[1]                       # halo inputs share one offset
        gx = (jax.lax.broadcasted_iota(jnp.int32, rr.shape, 0) + ox - co)
        ydx = jax.lax.broadcasted_iota(jnp.int32, rr.shape, 1)
        zdx = jax.lax.broadcasted_iota(jnp.int32, rr.shape, 2)
        inside = ((gx >= 1) & (gx <= Nx - 2) & (ydx >= 1) & (ydx <= Ny - 2)
                  & (zdx >= 1) & (zdx <= Nz - 2))
        par = gx + ydx + zdx
        eps = jnp.where(inside, rr * idw, 0.0)
        for color in colors:
            sweep = rr
            for d in range(3):
                sweep = sweep - (_wshift(eps, d, -1) * Ls[d]
                                 + _wshift(eps, d, 1) * _wshift(Ls[d], d, 1))
            sweep = sweep * idw
            eps = jnp.where(((par % 2) == (color % 2)) & inside, sweep, eps)
        # increment on the center rows [co, co+bx): route eps through a
        # scratch ref for the dynamic-offset reads
        def inner(esc):
            esc[:] = eps
            e_c = esc[pl.ds(co, bx)]
            e_m = esc[pl.ds(co - 1, bx)]
            e_p = esc[pl.ds(co + 1, bx)]
            lc = [Lk[pl.ds(co, bx)] for Lk in (l0w, l1w, l2w)]
            l0p = l0w[pl.ds(co + 1, bx)]
            aeps = e_c * dw[:]
            aeps = aeps + e_m * lc[0] + e_p * l0p
            for d in (1, 2):
                aeps = aeps + (_wshift(e_c, d, -1) * lc[d]
                               + _wshift(e_c, d, 1) * _wshift(lc[d], d, 1))
            return e_c, aeps

        e_c, aeps = pl.run_scoped(inner, pltpu.VMEM(rr.shape, jnp.float32))
        # interior mask on the center rows
        gxc = jax.lax.broadcasted_iota(jnp.int32, e_c.shape, 0) + ox
        ydc = jax.lax.broadcasted_iota(jnp.int32, e_c.shape, 1)
        zdc = jax.lax.broadcasted_iota(jnp.int32, e_c.shape, 2)
        ins_c = ((gxc >= 1) & (gxc <= Nx - 2) & (ydc >= 1) & (ydc <= Ny - 2)
                 & (zdc >= 1) & (zdc <= Nz - 2))
        x_new = xw[:] + om * jnp.where(ins_c, e_c, 0.0)
        r_new = rw[pl.ds(co, bx)] - om * jnp.where(ins_c, aeps, 0.0)
        return [x_new, r_new]

    call = _halo_map_all(body, 7, 1, 2, shape, h=h, bx=bx,
                         halos=[0, h, h, 0, h, h, h])
    xo, ro = call(omega, x_p, r_p, iD_p, D_p, L_p[0], L_p[1], L_p[2])
    # unwritten x-ghost rows: x keeps its input ghosts, r ghosts are zero
    xo = xo.at[0:1].set(x_p[0:1]).at[-1:].set(x_p[-1:])
    zrow = jnp.zeros_like(ro[0:1])
    ro = ro.at[0:1].set(zrow).at[-1:].set(zrow)
    return xo[:, :Ny, :Nz], ro[:, :Ny, :Nz]


def jacobi_incr3d(x: jax.Array, r: jax.Array, L: jax.Array, D: jax.Array,
                  iD: jax.Array, omega) -> tuple[jax.Array, jax.Array]:
    """Fused Jacobi smoother (`Jacobi!` + `increment!`, `Poisson.jl:100-114`,
    non-periodic): eps = r·iD (zero ghosts); x += ω·eps; r -= ω·A·eps."""
    return gs_incr3d(x, r, L, D, iD, [], omega)


def mult3d(x: jax.Array, L: jax.Array, D: jax.Array) -> jax.Array:
    """A·x on x/y rows [1, N−1) and z interior (`mult`, `Poisson.jl:70-76`);
    unwritten edge rows are composed/zeroed by the caller."""
    Ny, Nz = x.shape[1], x.shape[2]
    x, L, D = _pad_tail(x), _pad_tail(L), _pad_tail(D)
    shape = x.shape

    def body(win, scalars, xs):
        xx, l0, l1, l2, dd = win
        Ls = (l0, l1, l2)
        s = xx * dd
        for d in range(3):
            s = s + _wshift(xx, d, -1) * Ls[d] + _wshift(xx, d, 1) * _wshift(Ls[d], d, 1)
        ydx = jax.lax.broadcasted_iota(jnp.int32, xx.shape, 1)
        zdx = jax.lax.broadcasted_iota(jnp.int32, xx.shape, 2)
        s = jnp.where((zdx >= 1) & (zdx <= Nz - 2)
                      & (ydx >= 1) & (ydx <= Ny - 2), s, 0.0)
        return [s[1:-1]]

    call = _halo_map(body, 5, 0, 1, shape, h=1, bx=2)
    out = call(x, L[0], L[1], L[2], D)[0]
    # zero the unwritten x-ghost rows (uninitialized memory otherwise)
    zrow = jnp.zeros_like(out[0:1])
    out = out.at[0:1].set(zrow).at[-1:].set(zrow)
    return out[:, :Ny, :Nz]
