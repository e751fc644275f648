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

__all__ = ["use_pallas", "conv_diff3d_generic", "gauss_sweep3d", "gauss_sweeps3d", "mult3d"]

_BLK = 32    # x/y rows per output block
_INTERPRET = False   # set True to run kernels in interpreter mode (tests)
_IN_LOOP = False     # trace-time flag: inside a lax.while_loop body, pallas
                     # custom calls de-pipeline catastrophically on the
                     # tunneled backend (measured 15x), so the gate disables
                     # them there


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
              bx: int = 4):
    """Run ``body(win_list, scalars, xs) -> out_list`` over x-row halo
    windows with the full (y, z) extent resident.

    ``win_list[k]``: (bx+2h, Ny, Nz) arrays; ``scalars``: SMEM values;
    ``xs``: window start (for global parity).  Outputs must be
    (bx, Ny, Nz), written at row ``xs+h+out_shift`` (the ``out_shift`` maps a
    wrap-extended input grid back onto the original one).
    """
    Nx, Ny, Nz = shape
    out_shape = out_shape or shape
    bx = min(bx, Nx - 2 * h)
    wx = bx + 2 * h
    nbx = _nblocks(Nx - 2 * h, bx)

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
            ins[k].at[pl.ds(xs, wx)], win[k], sem_in.at[k])
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
            scratch_shapes=([pltpu.VMEM((wx, Ny, Nz), jnp.float32)
                             for _ in range(n_win)]
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
                     out_shape=out_shape, out_shift=-1, bx=4)
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
