"""Pallas TPU kernels on the flat (x, y·z) layout (`ops.flat`).

Each kernel runs a grid over x-row blocks with the full flattened (y, z)
plane resident in VMEM: rows of a ``(Nx, S, 128)`` array are (S, 128)
tile-aligned planes, so the manual HBM→VMEM halo-window DMAs need no
repacking or tail padding (the killers of the 3D-layout kernels in
`ops.pallas3d`: XLA's physical lane padding at Nz=258 → 384 plus a full
pad/unpad copy per call).

Window starts are clamped into the array; the body receives the dynamic
center offset ``co`` (output rows = window rows [co, co+bx)) and global row
start ``ox``, and routes dynamic-offset row reads through scratch refs.
In-plane (y/z) stencil shifts are sublane/lane rotations (`_pshift`) whose
wrap values land only in ghost cells; x shifts inside a window use row
concat-shifts whose edge garbage stays outside the center rows (halo depth
covers the stencil reach).

Numerics are exactly `models.flow.conv_diff` / `ops.poisson` — reference
semantics cited there (`src/Flow.jl:38-62`, `src/Poisson.jl:92-148`).
"""
from __future__ import annotations

import os
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flat import FlatGeom, yz_planes

__all__ = ["use_pallas_flat", "conv_diff_k", "bdim_k", "bdim_band",
           "jacobi_incr", "gs_incr", "mult_k", "increment_k",
           "div_k", "bc_k"]

_INTERPRET = False
_IN_LOOP = False     # manual switch to the jnp flat reference path (used by
                     # benchmarks/stress_kernels.py).  NOTE: round 1 claimed
                     # Pallas "de-pipelines 15x inside lax.while_loop" and
                     # gated the kernels off there — that measurement was an
                     # artifact of the div_k race; re-measured after the fix,
                     # pallas-in-while_loop is the FASTEST solver variant
                     # (10.9 ms vs 12.3 cond-unrolled at 128^3) and compiles
                     # 2.4x faster, so the solvers no longer set this flag.


def use_pallas_flat(a: jax.Array) -> bool:
    """Gate: f32 flat fields on TPU; disable with WLTPU_PALLAS=0; interpret
    mode (tests) forces on."""
    if os.environ.get("WLTPU_PALLAS", "1") == "0":
        return False
    if _IN_LOOP:
        return False
    if a.dtype != jnp.float32:
        return False
    if _INTERPRET:
        return True
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:  # pragma: no cover
        return False


# default OFF until validated on real hardware by benchmarks/stress_kernels
# (interpret mode cannot see Mosaic-only failure modes; an unvalidated
# kernel variant in the driver's benchmark run risks a zero result)
_USE_ROLL = os.environ.get("WLTPU_PSHIFT_ROLL", "0") == "1"


def _pshift(a: jax.Array, s: int) -> jax.Array:
    """Flat-plane shift of (..., S, 128) window data: b[f] = a[f + s].

    Two code paths (trace-time switch WLTPU_PSHIFT_ROLL): `pltpu.roll`
    (hardware circular shift) or slice+concat (Mosaic copies).  The lane
    remainder needs values from BOTH the q- and (q+1)-sublane-rolled arrays —
    a lane-index select stitches them."""
    if s == 0:
        return a
    q, r = divmod(s, 128)
    S = a.shape[-2]
    q = q % S

    if _USE_ROLL:
        def sroll(x, k):
            return pltpu.roll(x, -k % S, axis=x.ndim - 2) if k % S else x
    else:
        def sroll(x, k):
            if k % S == 0:
                return x
            k = k % S
            return jnp.concatenate([x[..., k:, :], x[..., :k, :]], axis=-2)

    a1 = sroll(a, q)
    if r == 0:
        return a1
    a2 = sroll(a, q + 1)
    if _USE_ROLL:
        lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, a.ndim - 1)
        return jnp.where(lane < 128 - r,
                         pltpu.roll(a1, 128 - r, axis=a.ndim - 1),
                         pltpu.roll(a2, 128 - r, axis=a.ndim - 1))
    return jnp.concatenate([a1[..., r:], a2[..., :r]], axis=-1)


def _rshift(a: jax.Array, s: int) -> jax.Array:
    """x-row shift within a window: b[k] = a[k + s] (wrap garbage at window
    edges — callers keep center rows clear of it)."""
    if s == 0:
        return a
    n = a.shape[0]
    s = s % n
    if _USE_ROLL:
        return pltpu.roll(a, n - s, axis=0)
    return jnp.concatenate([a[s:], a[:s]], axis=0)


def _halo_call(body: Callable, Nx: int, S: int, *, n_scalar: int,
               halos: list[int], n_aux: int, n_out: int, bx: int,
               vmem_mb: int = 100, cover_all: bool = False,
               pipeline: bool = False, in_dtypes=None, small=(),
               out_rows=None):
    """Run ``body(win_refs, aux, scalars, ox, cos, bx) -> [(bx, S, 128)] *
    n_out`` over clamped x-row halo windows covering output rows [1, Nx-1)
    (or [0, Nx) with ``cover_all``).

    ``win_refs[k]`` is the raw VMEM ref of input k's window (min(bx+2·halos[k],
    Nx) rows); ``aux`` are (S, 128) plane constants resident per-kernel;
    ``cos[k]`` the per-input center offset.  Output k is written at rows
    [ox, ox+bx).

    With ``pipeline`` the window/output buffers are double-buffered: grid step
    ix prefetches step ix+1's windows while computing on ix's, so HBM DMAs
    overlap compute (2x VMEM; use for DMA-bound kernels).

    ``small`` declares extra REDUCED outputs: for each entry ("sum"|"max")
    the body must return one additional (8, 128) per-block partial after the
    big outputs; the TPU grid is sequential, so the wrapper accumulates the
    partials in persistent VMEM scratch across blocks and writes each result
    once at the last block — a full-field reduction (norms, CFL max) for free
    inside a window kernel, no extra HBM pass.  Bodies must mask re-covered
    rows of the clamped last block themselves (`_fresh_mask`).

    ``out_rows`` (list of None | static (lo, hi) per big output): when given,
    output k's HBM write-back DMA is SKIPPED for blocks not intersecting
    global rows [lo, hi) — rows outside the range keep whatever HBM held
    (uninitialized for a fresh buffer!); callers must guarantee no consumer
    reads them (e.g. the band-sparse BDIM only reads the body band of f)."""
    n_cov = Nx if cover_all else Nx - 2
    lo_row = 0 if cover_all else 1
    bx = min(bx, n_cov)
    nbx = max(1, -(-n_cov // bx))
    n_win = len(halos)
    n_small = len(small)
    out_rows = out_rows or [None] * n_out
    wk = [min(bx + 2 * h, Nx) for h in halos]
    n_slot = 2 if pipeline else 1

    def ox_of(step):
        return jnp.minimum(lo_row + step * bx, lo_row + n_cov - bx)

    def kernel(*refs):
        scal = refs[:n_scalar]
        ins = refs[n_scalar:n_scalar + n_win]
        aux = refs[n_scalar + n_win:n_scalar + n_win + n_aux]
        base = n_scalar + n_win + n_aux
        outs = refs[base:base + n_out]
        souts = refs[base + n_out:base + n_out + n_small]
        k0 = base + n_out + n_small
        win = refs[k0:k0 + n_slot * n_win]
        obuf = refs[k0 + n_slot * n_win:k0 + n_slot * (n_win + n_out)]
        sacc = refs[k0 + n_slot * (n_win + n_out):
                    k0 + n_slot * (n_win + n_out) + n_small]
        sem_in = refs[-2]
        sem_out = refs[-1]
        ix = pl.program_id(0)

        def small_step(results):
            if not n_small:
                return
            parts = results[n_out:]

            @pl.when(ix == 0)
            def _():
                for k in range(n_small):
                    sacc[k][:] = parts[k]

            @pl.when(ix > 0)
            def _():
                for k in range(n_small):
                    if small[k] == "sum":
                        sacc[k][:] = sacc[k][:] + parts[k]
                    else:
                        sacc[k][:] = jnp.maximum(sacc[k][:], parts[k])

            @pl.when(ix == nbx - 1)
            def _():
                for k in range(n_small):
                    souts[k][:] = sacc[k][:]

        def in_copy(step, buf_slot, sem_slot, k):
            # buf_slot must be a Python int (list index); sem_slot may be
            # traced — a `.wait()` only needs the semaphore + the byte count,
            # and both slots' buffers are identically shaped
            ws = jnp.clip(ox_of(step) - halos[k], 0, Nx - wk[k])
            return pltpu.make_async_copy(ins[k].at[pl.ds(ws, wk[k])],
                                         win[n_slot * k + buf_slot],
                                         sem_in.at[sem_slot, k])

        def out_copy(step, buf_slot, sem_slot, k):
            return pltpu.make_async_copy(obuf[n_slot * k + buf_slot],
                                         outs[k].at[pl.ds(ox_of(step), bx)],
                                         sem_out.at[sem_slot, k])

        def out_act(step, buf_slot, sem_slot, k, act):
            """start/wait output k's DMA for ``step``, skipped when the block
            misses the output's static live-row range (`out_rows`)."""
            orng = out_rows[k]
            if orng is None:
                getattr(out_copy(step, buf_slot, sem_slot, k), act)()
                return

            @pl.when((ox_of(step) + bx > orng[0]) & (ox_of(step) < orng[1]))
            def _():
                getattr(out_copy(step, buf_slot, sem_slot, k), act)()

        ox = ox_of(ix)
        cos = []
        for k in range(n_win):
            ws = jnp.clip(ox - halos[k], 0, Nx - wk[k])
            cos.append(ox - ws)
        # cos[-1] (beyond the per-window offsets): the fresh-row threshold —
        # global rows < it were already covered by an earlier block (only the
        # clamped last block re-covers rows); small-output "sum" partials
        # must mask them (`_fresh_mask`).  program_id is only legal here,
        # not inside run_scoped bodies.
        cos.append(lo_row + ix * bx)
        scalars = [s[0, 0] for s in scal]

        if not pipeline:
            copies = [in_copy(ix, 0, 0, k) for k in range(n_win)]
            for c in copies:
                c.start()
            for c in copies:
                c.wait()
            results = body(win, [a[:] for a in aux], scalars, ox, cos, bx)
            for k in range(n_out):
                obuf[k][:] = results[k]
                out_act(ix, 0, 0, k, "start")
            small_step(results)
            for k in range(n_out):
                out_act(ix, 0, 0, k, "wait")
            return

        slot = ix % 2
        nxt = (ix + 1) % 2

        @pl.when(ix == 0)
        def _():
            for k in range(n_win):
                in_copy(0, 0, 0, k).start()

        # prefetch next step's windows into the other slot (parity-guarded so
        # buffer list indices stay Python ints)
        @pl.when((ix + 1 < nbx) & (nxt == 0))
        def _():
            for k in range(n_win):
                in_copy(ix + 1, 0, 0, k).start()

        @pl.when((ix + 1 < nbx) & (nxt == 1))
        def _():
            for k in range(n_win):
                in_copy(ix + 1, 1, 1, k).start()

        for k in range(n_win):
            in_copy(ix, 0, slot, k).wait()

        def compute_and_emit(s):
            # drain the out-DMA issued for this buffer slot two steps ago
            @pl.when(ix >= 2)
            def _():
                for k in range(n_out):
                    out_act(ix - 2, s, s, k, "wait")
            ws_list = [win[n_slot * k + s] for k in range(n_win)]
            results = body(ws_list, [a[:] for a in aux], scalars, ox, cos, bx)
            for k in range(n_out):
                obuf[n_slot * k + s][:] = results[k]
                out_act(ix, s, s, k, "start")
            small_step(results)

        @pl.when(slot == 0)
        def _():
            compute_and_emit(0)

        @pl.when(slot == 1)
        def _():
            compute_and_emit(1)

        @pl.when(ix == nbx - 1)
        def _():
            for k in range(n_out):
                out_act(ix, 0, slot, k, "wait")
            @pl.when(nbx >= 2)
            def _():
                for k in range(n_out):
                    out_act(ix - 1, 0, nxt, k, "wait")

    in_dtypes = in_dtypes or [jnp.float32] * n_win
    out_shapes = (tuple(jax.ShapeDtypeStruct((Nx, S, 128), jnp.float32)
                        for _ in range(n_out))
                  + tuple(jax.ShapeDtypeStruct((8, 128), jnp.float32)
                          for _ in range(n_small)))
    win_scratch = [pltpu.VMEM((wk[k], S, 128), in_dtypes[k])
                   for k in range(n_win) for _ in range(n_slot)]
    out_scratch = [pltpu.VMEM((bx, S, 128), jnp.float32)
                   for _ in range(n_out) for _ in range(n_slot)]
    sml_scratch = [pltpu.VMEM((8, 128), jnp.float32) for _ in range(n_small)]

    def call(scalars, arrays, aux_planes):
        outs = pl.pallas_call(
            kernel,
            grid=(nbx,),
            in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)] * n_scalar
                      + [pl.BlockSpec(memory_space=pl.ANY)] * n_win
                      + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_aux),
            out_specs=tuple([pl.BlockSpec(memory_space=pl.ANY)] * n_out
                            + [pl.BlockSpec(memory_space=pltpu.VMEM)]
                            * n_small),
            out_shape=out_shapes,
            scratch_shapes=(win_scratch + out_scratch + sml_scratch
                            + [pltpu.SemaphoreType.DMA((n_slot, n_win)),
                               pltpu.SemaphoreType.DMA((n_slot, n_out))]),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_mb * 1024 * 1024),
            interpret=_INTERPRET,
        )(*scalars, *arrays, *aux_planes)
        return list(outs) if isinstance(outs, (tuple, list)) else [outs]

    return call


def _fresh_mask(ox, thr, shape, dtype=jnp.float32):
    """1.0 on rows this block covers for the FIRST time, 0.0 on rows a
    clamped last block re-covers (its ``ox`` shifts below the threshold when
    the coverage count is not a multiple of bx) — small-output "sum"
    partials must be masked with this so overlap rows aren't double-reduced.
    ``thr`` is ``cos[-1]`` (appended by `_halo_call`'s kernel, where
    program_id is legal)."""
    gxc = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + ox
    return jnp.where(gxc >= thr, 1.0, 0.0).astype(dtype)


def _fold8(a: jax.Array, kind: str) -> jax.Array:
    """Reduce a (bx, S, 128) block partial to the (8, 128) small-output form:
    rows first, then S in groups of 8 sublanes (S is always a multiple of 8 —
    `ops.flat.geom_of` pads to the sublane tile)."""
    a = a.sum(axis=0) if kind == "sum" else a.max(axis=0)
    S = a.shape[0]
    a = a.reshape(S // 8, 8, 128)
    return a.sum(axis=0) if kind == "sum" else a.max(axis=0)


def _planes(g: FlatGeom):
    y, z, ins = yz_planes(g, jnp.float32)
    return (y.astype(jnp.float32), z.astype(jnp.float32), ins)


def _fix_ghost_rows(out: jax.Array, val0, val1) -> jax.Array:
    """The kernels never write x rows 0 / Nx-1 (uninitialized memory):
    restore them from the given row slabs."""
    return out.at[0:1].set(val0).at[-1:].set(val1)


# ---------------------------------------------------------------- conv_diff
def conv_diff_k(u: jax.Array, nu, scheme: Callable, g: FlatGeom,
                cheap=None, f_rows=None):
    """Fused convective-diffusive RHS (`conv_diff!`, `src/Flow.jl:38-62`)
    for all 3 components, non-periodic, with the boundary-slab flux fixes
    applied in-kernel:

        Φ_j[I] = uadv·(uadv>0 ? UP : DN) − ν (f[I] − f[I−e_j])
        UP = j-index==1   ? ½(f[I]+f[I−e_j]) : λ(f[I−2e_j], f[I−e_j], f[I])
        DN = j-index==n−1 ? ½(f[I]+f[I−e_j]) : λ(f[I+e_j], f[I], f[I−e_j])
        r_i[I] = Σ_j Φ_j[I] − Φ_j[I+e_j]      (interior; ghosts zero)

    (the jdx==1 / jdx==n−1 branches are `ϕuL`/`ϕuR`, `src/Flow.jl:56-57`).

    With ``cheap=(u0, dt, keep_base, scale)`` the kernel additionally emits
    the band-exterior half-step update in the same pass (u_adv doubles as
    u_base — true for both `mom_step!` phases):

        out_i = interior ? scale·(keep_base·u_adv + mmᵢ·(u0 + dt·r_i))
                         : u_adv                        (mmᵢ: face-1 plane 0)

    i.e. BDIM with the far-field moments (μ₀ = mmᵢ, μ₁ = 0, V = 0) plus the
    interior scaling of `scale_u!` — exactly `models.flowflat.bdim_band`'s
    "cheap" branch fused with the convection pass, saving the f round-trip
    and a full-field XLA pass per half-step.  Returns ``(u_new, f)``; the
    body-band x-slab still needs the full BDIM run on ``f``.

    ``f_rows`` (static (lo, hi), fused mode only): f is consumed ONLY on the
    body band's x-slab, so its write-back DMA is skipped for blocks outside
    [lo, hi) (`_halo_call(out_rows=...)`) — f rows outside the range are
    UNDEFINED (uninitialized HBM on hardware).
    """
    Nx, S = g.Nx, g.S
    h = 2
    yv, zv, ins = _planes(g)
    steps = (None, g.Nz, 1)
    fused = cheap is not None
    if f_rows is not None and not fused:
        # the write-skip guard below is wired only into the fused outputs;
        # silently ignoring f_rows would hand the caller fully-written rows
        # today and uninitialized HBM after a refactor
        raise ValueError("conv_diff_k: f_rows requires cheap= (fused mode)")
    # shift sharing: f_m1 of flux (i,j) is also uadv's ingredient in flux
    # (j,i) — hoisting the 9 −1-shifts saves ~20% of the kernel's VPU shift
    # work at the cost of 9 live window temporaries (measured switch)
    share = os.environ.get("WLTPU_CONV_SHARE", "0") == "1"

    def body(win, aux, scalars, ox, cos, bx):
        nu_s = scalars[0]
        if fused:
            dt_s, kb, sc = scalars[1], scalars[2], scalars[3]
        yv, zv, ins = aux
        co = cos[0]

        def inner(phi_ref):
            outs_u, outs_f = [], []
            gx_c = jax.lax.broadcasted_iota(jnp.int32, (bx, S, 128), 0) + ox
            um1 = None
            if share:
                um1 = [[_rshift(win[i][:], -1), _pshift(win[i][:], -g.Nz),
                        _pshift(win[i][:], -1)] for i in range(3)]
            # v2 (default): the 6 in-plane fluxes evaluate DIRECTLY on the
            # bx center rows via dynamic-offset ref reads (a slab read at
            # pl.ds(co-1, ...) is always in-bounds: co >= 1 at every clamped
            # block) — the full-(bx+2h)-row recompute + scratch round trip
            # is only needed for the x flux, whose φ difference crosses rows.
            # Cuts ~1/3 of the limiter VPU work on 2/3 of the fluxes; the
            # kernel is VPU-bound (109 GB/s at 256³ — roofline).  v1 via
            # WLTPU_CONV_V2=0.
            v2 = os.environ.get("WLTPU_CONV_V2", "1") == "1" and not share
            # v4: memoized center-row shifts — u_i shifted by −e_j serves
            # BOTH flux (i,j)'s f_m1 and flux (j,i)'s uadv ingredient (4 of
            # the in-plane pshifts coincide); values bitwise-unchanged
            u_cc = [win[k][pl.ds(co, bx)] for k in range(3)]
            _memo = {}

            def shc(k, sft):
                if (k, sft) not in _memo:
                    _memo[(k, sft)] = _pshift(u_cc[k], sft)
                return _memo[(k, sft)]

            for i in range(3):
                fw = win[i][:]
                ri = jnp.zeros((bx, S, 128), jnp.float32)
                for j in range(3):
                    st = steps[j]
                    if v2 and st is not None:
                        fw_c = u_cc[i]
                        f_m1 = shc(i, -st)
                        f_m2 = shc(i, -2 * st)
                        f_p1 = shc(i, st)
                        jf = yv if j == 1 else zv
                        n_j = g.Ny if j == 1 else g.Nz
                        uj_c = u_cc[j]
                        if i == 0:
                            uadv = 0.5 * (uj_c + win[j][pl.ds(co - 1, bx)])
                        else:
                            uadv = 0.5 * (uj_c + shc(j, -steps[i]))
                        # v3: select the SCHEME ARGUMENTS by upwind direction
                        # instead of evaluating the limiter twice and
                        # selecting results — elementwise-identical values
                        # (the selected inputs produce the selected output
                        # bitwise), one QUICK evaluation instead of two.
                        # The kernel is VPU-bound; this is ~1/3 of its
                        # limiter arithmetic.
                        pos = uadv > 0
                        fa = jnp.where(pos, f_m2, f_p1)
                        fb = jnp.where(pos, f_m1, fw_c)
                        fc2 = jnp.where(pos, fw_c, f_m1)
                        # arithmetic-valued select (i1-valued selects do not
                        # lower in this Mosaic toolchain): zero exactly on
                        # the relevant boundary slab of the upwind side
                        bnd = jnp.where(pos, jf - 1, jf - (n_j - 1))
                        cds_lo = 0.5 * (fw_c + f_m1)
                        phi_c = uadv * jnp.where(bnd == 0, cds_lo,
                                                 scheme(fa, fb, fc2)) \
                            - nu_s * (fw_c - f_m1)
                        ri = ri + (phi_c - _pshift(phi_c, st))
                        continue
                    if v2 and st is None:
                        # v4: the x flux on a (bx+1)-row slab instead of the
                        # full window — removes 3 full-window row-rotates and
                        # the scratch round trip per component.  Reads that
                        # would leave the window at the CLAMPED first/last
                        # block (co==1 / co==3) use an in-window slab rotated
                        # by one row; the wrap garbage lands only on the
                        # domain-boundary phi row, where the v3 bnd-select
                        # discards it (up at row 1 / dn at row Nx−1 are the
                        # central fluxes).  bitwise-identical elsewhere.
                        bq = bx + 1
                        fw_x = win[i][pl.ds(co, bq)]
                        f_m1 = win[i][pl.ds(co - 1, bq)]
                        f_m2 = jnp.where(co >= 2,
                                         win[i][pl.ds(jnp.maximum(co - 2, 0),
                                                      bq)],
                                         _rshift(f_m1, -1))
                        f_p1 = jnp.where(co <= 2,
                                         win[i][pl.ds(jnp.minimum(co + 1, 3),
                                                      bq)],
                                         _rshift(fw_x, 1))
                        jf = (jax.lax.broadcasted_iota(
                            jnp.int32, (bq, S, 128), 0) + ox)
                        n_j = Nx
                        if i == 0:
                            uadv = 0.5 * (win[0][pl.ds(co, bq)]
                                          + win[0][pl.ds(co - 1, bq)])
                        else:
                            uadv = 0.5 * (win[0][pl.ds(co, bq)]
                                          + _pshift(win[0][pl.ds(co, bq)],
                                                    -steps[i]))
                        pos = uadv > 0
                        fa = jnp.where(pos, f_m2, f_p1)
                        fb = jnp.where(pos, f_m1, fw_x)
                        fc2 = jnp.where(pos, fw_x, f_m1)
                        bnd = jnp.where(pos, jf - 1, jf - (n_j - 1))
                        cds_lo = 0.5 * (fw_x + f_m1)
                        phi_x = uadv * jnp.where(bnd == 0, cds_lo,
                                                 scheme(fa, fb, fc2)) \
                            - nu_s * (fw_x - f_m1)
                        ri = ri + (phi_x[:bx] - phi_x[1:])
                        continue
                    if st is None:
                        f_m1 = um1[i][0] if share else _rshift(fw, -1)
                        f_m2 = _rshift(fw, -2)
                        f_p1 = _rshift(fw, 1)
                        jf = (jax.lax.broadcasted_iota(jnp.int32, fw.shape, 0)
                              + (ox - co))
                        n_j = Nx
                    else:
                        f_m1 = um1[i][j] if share else _pshift(fw, -st)
                        f_m2 = _pshift(fw, -2 * st)
                        f_p1 = _pshift(fw, st)
                        jf = yv if j == 1 else zv
                        n_j = g.Ny if j == 1 else g.Nz
                    uj = win[j][:]
                    if share:
                        uadv = 0.5 * (uj + um1[j][i])
                    elif i == 0:
                        uadv = 0.5 * (uj + _rshift(uj, -1))
                    else:
                        uadv = 0.5 * (uj + _pshift(uj, -steps[i]))
                    # v3 argument-select (see the center-row path above)
                    pos = uadv > 0
                    fa = jnp.where(pos, f_m2, f_p1)
                    fb = jnp.where(pos, f_m1, fw)
                    fc2 = jnp.where(pos, fw, f_m1)
                    bnd = jnp.where(pos, jf - 1, jf - (n_j - 1))
                    cds_lo = 0.5 * (fw + f_m1)
                    phi = uadv * jnp.where(bnd == 0, cds_lo,
                                           scheme(fa, fb, fc2)) \
                        - nu_s * (fw - f_m1)
                    phi_ref[:] = phi
                    phi_c = phi_ref[pl.ds(co, bx)]
                    if st is None:
                        phi_n = phi_ref[pl.ds(co + 1, bx)]
                    else:
                        phi_n = _pshift(phi_c, st)
                    ri = ri + (phi_c - phi_n)
                # interior mask: zero r at ghosts (reference `a.f .= 0` +
                # inside_u-only writes, `src/Flow.jl:44,190`)
                m = ins * jnp.where((gx_c >= 1) & (gx_c <= Nx - 2), 1.0, 0.0)
                fi = ri * m
                outs_f.append(fi)
                if fused:
                    face = (gx_c if i == 0
                            else (yv if i == 1 else zv).astype(jnp.int32))
                    mm = jnp.where(face == 1, 0.0, 1.0)
                    ub_c = win[i][pl.ds(co, bx)]
                    u0_c = win[3 + i][:]
                    upd = sc * (kb * ub_c + mm * (u0_c + dt_s * fi))
                    outs_u.append(m * upd + (1.0 - m) * ub_c)
            return outs_u + outs_f

        return pl.run_scoped(inner, pltpu.VMEM(win[0].shape, jnp.float32))

    halos = [h, h, h] + ([0, 0, 0] if fused else [])
    # bx trades halo-row recompute (window = bx+4 rows → 1.5x shift work at
    # bx=8, 1.33x at bx=12) against VMEM: the kernel is VPU-bound (109 GB/s
    # at 256³ — roofline), so larger blocks help until buffers spill
    cbx = int(os.environ.get("WLTPU_CONV_BX", "8"))
    call = _halo_call(body, Nx, S, n_scalar=4 if fused else 1, halos=halos,
                      n_aux=3, n_out=6 if fused else 3, bx=cbx, pipeline=True,
                      vmem_mb=128 if fused else 100,
                      out_rows=([None] * 3 + [f_rows] * 3)
                      if (fused and f_rows is not None) else None)
    nu1 = jnp.asarray(nu, jnp.float32).reshape(1, 1)
    zrow = jnp.zeros((1, S, 128), jnp.float32)
    if not fused:
        r = call([nu1], [u[0], u[1], u[2]], _planes(g))
        return jnp.stack([_fix_ghost_rows(rk, zrow, zrow) for rk in r])
    u0, dt, keep_base, scale = cheap
    scal = [nu1] + [jnp.asarray(v, jnp.float32).reshape(1, 1)
                    for v in (dt, keep_base, scale)]
    outs = call(scal, [u[0], u[1], u[2], u0[0], u0[1], u0[2]], _planes(g))
    u_new = jnp.stack([_fix_ghost_rows(o, u[i][0:1], u[i][-1:])
                       for i, o in enumerate(outs[:3])])
    if f_rows is not None:
        # undefined rows outside [lo, hi): skip the ghost-row fix too — the
        # band consumer never reads rows 0 / Nx−1
        f = jnp.stack(outs[3:])
    else:
        f = jnp.stack([_fix_ghost_rows(o, zrow, zrow) for o in outs[3:]])
    return u_new, f


# ---------------------------------------------------------------- BDIM
def bdim_k(u: jax.Array, u0: jax.Array, f: jax.Array, V: jax.Array,
           mu0: jax.Array, mu1: jax.Array, dt, g: FlatGeom,
           bx: int = 8, pipeline: bool = True) -> jax.Array:
    """Fused BDIM update (`BDIM!`, `src/Flow.jl:176-180`), one launch per
    component:

        f*_i = u0_i + dt·f_i − V_i                       (computed in-window)
        u_i += ½ Σ_j μ1[i,j]·(f*_i[+e_j] − f*_i[−e_j]) + V_i + μ0_i·f*_i
    """
    Nx, S = g.Nx, g.S
    steps = (None, g.Nz, 1)
    out = []
    for i in range(3):
        def body(win, aux, scalars, ox, cos, bx, i=i):
            dt_s = scalars[0]
            _, _, ins = aux
            uw, u0w, fw, vw, m0w, m10, m11, m12 = win
            co = cos[1]
            fp = u0w[:] + dt_s * fw[:] - vw[:]

            def inner(fp_ref):
                fp_ref[:] = fp
                fp_c = fp_ref[pl.ds(co, bx)]
                acc = m10[:] * (fp_ref[pl.ds(co + 1, bx)]
                                - fp_ref[pl.ds(co - 1, bx)])
                acc = acc + m11[:] * (_pshift(fp_c, g.Nz) - _pshift(fp_c, -g.Nz))
                acc = acc + m12[:] * (_pshift(fp_c, 1) - _pshift(fp_c, -1))
                gx = jax.lax.broadcasted_iota(jnp.int32, fp_c.shape, 0) + ox
                m = ins * jnp.where((gx >= 1) & (gx <= Nx - 2), 1.0, 0.0)
                upd = 0.5 * acc + vw[pl.ds(co, bx)] + m0w[:] * fp_c
                return [uw[:] + m * upd]

            return pl.run_scoped(inner, pltpu.VMEM(fp.shape, jnp.float32))

        call = _halo_call(body, Nx, S, n_scalar=1,
                          halos=[0, 1, 1, 1, 0, 0, 0, 0], n_aux=3, n_out=1,
                          bx=bx, pipeline=pipeline)
        dt1 = jnp.asarray(dt, jnp.float32).reshape(1, 1)
        o = call([dt1], [u[i], u0[i], f[i], V[i], mu0[i],
                         mu1[i, 0], mu1[i, 1], mu1[i, 2]], _planes(g))[0]
        out.append(_fix_ghost_rows(o, u[i][0:1], u[i][-1:]))
    return jnp.stack(out)


def bdim_band(u: jax.Array, u0: jax.Array, f: jax.Array, V: jax.Array,
              mu0: jax.Array, mu1: jax.Array, dt, g: FlatGeom,
              band: tuple[int, int],
              perdir: tuple[int, ...] = ()) -> jax.Array:
    """Band-sparse BDIM: the μ-weighted update only deviates from the
    far-field pattern where the body's kernel moments are nontrivial — for a
    body of scale L that is O(L²) of O(L³) cells.  ``band = (lo, hi)`` is the
    static x-row range (global, 1 ≤ lo < hi ≤ Nx−1) outside which the
    measured fields equal the canonical far field: μ1 ≡ 0, V ≡ 0, μ0 ≡ 1
    except the normal-face index-1 plane of each non-periodic direction,
    zeroed by the measure-time BC fill (`models.body.measure_fill`).  So

        rows ∉ [lo, hi):  u + inside_i·(u0 + dt·f)         (3 reads, fused XLA)
        rows ∈ [lo, hi):  full `bdim_k` on the ±1-halo x-slab

    with ``inside_i`` the interior mask minus component i's zeroed face
    plane.  The interval is computed at measure time by `Simulation`
    (`_band_rows_jit`).  Cuts ~2/3 of BDIM's HBM traffic and nearly all its
    shift compute for typical body/domain ratios.
    """
    lo, hi = band
    from .flat import geom_of, inside_mask_flat, yz_planes

    m = inside_mask_flat(g, u.shape[1:], u.dtype)
    yv, zv, _ = yz_planes(g, jnp.int32)
    xv = jax.lax.broadcasted_iota(jnp.int32, u.shape[1:], 0)
    masks = []
    for i, idx in enumerate((xv, yv, zv)):
        masks.append(m * (idx != 1).astype(u.dtype)
                     if i not in perdir else m)
    mm = jnp.stack(masks)
    cheap = u + mm * (u0 + dt * f)
    if hi <= lo:
        return cheap
    sl = slice(lo - 1, hi + 1)
    gs = geom_of((hi - lo + 2, g.Ny, g.Nz))
    slab = bdim_k(u[:, sl], u0[:, sl], f[:, sl], V[:, sl], mu0[:, sl],
                  mu1[:, :, sl], dt, gs)
    return cheap.at[:, lo:hi].set(slab[:, 1:-1])


# ---------------------------------------------------------------- Poisson
def _gauss_cascade(rr, idw, Ls, eps, colors, par, ins, g: FlatGeom):
    # shifted L coefficients are loop-invariant — hoist them (saves 3 window
    # rotates per color; the cascade is VPU-bound)
    L0s, L1s, L2s = _rshift(Ls[0], 1), _pshift(Ls[1], g.Nz), _pshift(Ls[2], 1)
    for color in colors:
        s = rr
        s = s - (_rshift(eps, -1) * Ls[0] + _rshift(eps, 1) * L0s)
        s = s - (_pshift(eps, -g.Nz) * Ls[1] + _pshift(eps, g.Nz) * L1s)
        s = s - (_pshift(eps, -1) * Ls[2] + _pshift(eps, 1) * L2s)
        eps = jnp.where((par == float(color)) & (ins > 0), s * idw, eps)
    return eps


def _gs_bx(S: int, h: int, mp: bool = False) -> int:
    """Largest row-block size whose windows + live slice temporaries fit
    VMEM.  Model 24·bx + 32·h window-rows ≤ 88MB, calibrated on hardware
    at 256³ (S=528): it=3/bx=16 needs 141.5MB scoped VMEM (compile fails at
    the 128MB limit) while it=3/bx=8 pipelined fits and is the measured
    optimum (3.49 ms vs 4.82 unpipelined, 5.1 full-recompute); it=4/bx=8
    (95MB by this model) OOMs by 660K — register spills of the longer
    cascade — while it=4/bx=6 (82MB) compiles and is the measured it=4
    optimum (5.44 ms vs 5.97 bx=8-unpipelined, 6.0 full-recompute) — see
    `benchmarks/gs_sweep.py`.  Override with WLTPU_GS_BX.

    ``mp``: most windows and cascade scratches are bf16, so the same VMEM
    admits larger blocks — less halo-cascade recompute per center row for
    the VPU-bound sweeps.  Row cost factor 0.75, calibrated at S=528
    (`benchmarks/gs_bx_probe.py`): incr_gs(h=6) bx=10 compiles and is the
    measured optimum (3.51 vs 3.85 ms at the f32 model's bx=6 for the
    want_norms tail; 3.31 vs 4.34 for the plain form), bx=12 OOMs;
    gs_incr(h=3) bx=12 compiles (2.57 ms vs 2.95 at bx=8).  mp candidates
    cap at 12: bx=16 for the h=1 Jacobi was a measured REGRESSION (1.83 vs
    1.63 ms — fewer blocks pipeline worse), and larger blocks at small S
    are untested register-spill territory for the longer cascade."""
    env = os.environ.get("WLTPU_GS_BX")
    if env:
        return int(env)

    def fit(factor, cands):
        best = 4
        for bx in cands:
            if (24 * bx + 32 * h) * S * 128 * 4 * factor <= 88 * 1024 * 1024:
                best = bx
        return best

    best = fit(1.0, (6, 8, 12, 16, 24, 32))
    if mp:
        # relax, never tighten: anything the f32 model admits fits in mp
        best = max(best, fit(0.75, (6, 8, 10, 12)))
    return best


def gs_incr(x: jax.Array, r: jax.Array, L: jax.Array, D: jax.Array,
            iD: jax.Array, colors, omega, g: FlatGeom, mp: bool = False):
    """Communication-avoiding red-black sweeps + increment
    (`GaussSeidelRB!` + `increment!`, `src/Poisson.jl:100-148`): each block
    recomputes the sweep cascade inside a halo of depth n_sweeps+1, then

        x += ω·eps,  r −= ω·A·eps   on its center rows.

    The cascade runs in-place on a VMEM scratch with per-sweep row slices
    [s_k, s_k+W−k−2): sweep k only rewrites rows that are still valid
    (validity shrinks one row per sweep from each window cut, exactly the
    h = it+1 halo rule), replacing the round-1 full-window recompute + two
    x-row rotate copies per sweep — ~40% less VPU work and a smaller live
    set, so `_gs_bx` doubles the block size.  Re-sweeping an already-valid
    row is idempotent (a red cell's update reads only black neighbors), so
    the uniform slice size is safe at clamped edge blocks where ``s_k``
    shifts to keep reads in-bounds.

    ``colors == []`` degenerates to the fused Jacobi smoother.

    ``mp`` (mixed precision): the cascade and coefficient reads run in
    bfloat16 — L/D/iD are DMA'd as bf16 copies (caller casts ONCE per solve,
    `ops.mgflat.solve_mg_flat`) and the correction scratch is bf16, halving
    both coefficient HBM traffic and the VPU-bound cascade's register work.
    x and r stay f32: ``x += ω·eps`` and ``r −= ω·A·eps`` accumulate in f32
    on center rows, so the solution update is exact given the (bf16-rounded,
    ~0.4% relative) correction — standard mixed-precision smoothing; every
    solve re-enters with an exact f32 residual (`residual_flat`), so smoother
    rounding never accumulates across solves.
    """
    Nx, S = g.Nx, g.S
    it = len(colors)
    h = it + 1
    cdt = jnp.bfloat16 if mp else jnp.float32

    def body(win, aux, scalars, ox, cos, bx):
        om = scalars[0]
        yv, zv, ins = aux
        xw, rw, idw_w, dw, l0w, l1w, l2w = win
        co = cos[1]
        W = rw.shape[0]
        # slice-cascade needs per-sweep slack rows; tiny/whole-domain windows
        # (coarse MG levels) keep the full-window recompute form.
        # WLTPU_GS_SLICED=0 forces the full-recompute form (hardware sweeps;
        # the slice form's dynamic VMEM slices register-spill at large S)
        sliced = (it > 0 and W < Nx and W - it - 2 >= bx
                  and os.environ.get("WLTPU_GS_SLICED", "1") == "1")

        def inner(e_ref, r_ref, l1s_ref, l2s_ref, par_ref, ins_ref):
            gx = jax.lax.broadcasted_iota(jnp.int32, (W, S, 128), 0) \
                + (ox - co)
            # masks/parity stay f32: bf16 COMPARISONS crash this Mosaic
            # toolchain (micro-bisected on hardware; bf16 selects under an
            # f32-derived mask lower fine)
            insw = ins * jnp.where((gx >= 1) & (gx <= Nx - 2), 1.0, 0.0)
            if mp:       # bf16 residual copy feeds the cascade reads
                r_ref[:] = rw[:].astype(cdt)
                rv = r_ref
            else:
                rv = rw
            e_ref[:] = rv[:] * idw_w[:] * insw.astype(cdt)
            if sliced:
                ins_ref[:] = insw
                par_ref[:] = (gx.astype(jnp.float32) + yv + zv) % 2.0
                l1s_ref[:] = _pshift(l1w[:], g.Nz)
                l2s_ref[:] = _pshift(l2w[:], 1)
                ws = ox - co       # window start row; 0 ⇔ bottom is the
                for k, color in enumerate(colors):     # domain edge
                    n = W - k - 2
                    s = jnp.where(ws == 0, 1, k + 1)
                    e_c = e_ref[pl.ds(s, n)]
                    sv = rv[pl.ds(s, n)]
                    sv = sv - (e_ref[pl.ds(s - 1, n)] * l0w[pl.ds(s, n)]
                               + e_ref[pl.ds(s + 1, n)] * l0w[pl.ds(s + 1, n)])
                    sv = sv - (_pshift(e_c, -g.Nz) * l1w[pl.ds(s, n)]
                               + _pshift(e_c, g.Nz) * l1s_ref[pl.ds(s, n)])
                    sv = sv - (_pshift(e_c, -1) * l2w[pl.ds(s, n)]
                               + _pshift(e_c, 1) * l2s_ref[pl.ds(s, n)])
                    insl = ins_ref[pl.ds(s, n)]
                    e_ref[pl.ds(s, n)] = jnp.where(
                        (par_ref[pl.ds(s, n)] == float(color)) & (insl > 0),
                        sv * idw_w[pl.ds(s, n)], e_c)
            elif it > 0:
                rr, idw = rv[:], idw_w[:]
                Ls = [l0w[:], l1w[:], l2w[:]]
                par = (gx.astype(jnp.float32) + yv + zv) % 2.0
                e_ref[:] = _gauss_cascade(rr, idw, Ls, e_ref[:], colors, par,
                                          insw, g)
            # A·eps and the x/r updates in the cascade dtype, accumulated
            # into f32 center rows (the bf16 rounding of A·eps is consistent
            # with the bf16 A the cascade smoothed against)
            e_c = e_ref[pl.ds(co, bx)]
            aeps = e_c * dw[:]
            aeps = aeps + e_ref[pl.ds(co - 1, bx)] * l0w[pl.ds(co, bx)] \
                + e_ref[pl.ds(co + 1, bx)] * l0w[pl.ds(co + 1, bx)]
            l1c = l1w[pl.ds(co, bx)]
            l2c = l2w[pl.ds(co, bx)]
            aeps = aeps + _pshift(e_c, -g.Nz) * l1c + _pshift(e_c, g.Nz) * _pshift(l1c, g.Nz)
            aeps = aeps + _pshift(e_c, -1) * l2c + _pshift(e_c, 1) * _pshift(l2c, 1)
            gxc = jax.lax.broadcasted_iota(jnp.int32, e_c.shape, 0) + ox
            mc = ins * jnp.where((gxc >= 1) & (gxc <= Nx - 2), 1.0, 0.0)
            x_new = xw[:] + om * e_c.astype(jnp.float32) * mc
            r_new = rw[pl.ds(co, bx)] - om * aeps.astype(jnp.float32) * mc
            return [x_new, r_new]

        scr = pltpu.VMEM((W, S, 128), cdt)
        scr32 = pltpu.VMEM((W, S, 128), jnp.float32)
        r_scr = pltpu.VMEM((W, S, 128), cdt) if mp \
            else pltpu.VMEM((1, 1, 128), jnp.float32)
        return pl.run_scoped(inner, scr, r_scr, scr, scr, scr32, scr32)

    # pipelining doubles the 7 window buffers but overlaps their DMA with
    # the cascade — measured 28% faster at 256³ (3.49 vs 4.82 ms, bx=8) and
    # within VMEM for every bx the `_gs_bx` model admits; default ON
    # (WLTPU_GS_PIPE=0 to disable for sweeps)
    pipe = os.environ.get("WLTPU_GS_PIPE", "1") == "1"
    call = _halo_call(body, Nx, S, n_scalar=1, halos=[0, h, h, 0, h, h, h],
                      n_aux=3, n_out=2, bx=_gs_bx(S, h, mp), vmem_mb=128,
                      pipeline=pipe,
                      in_dtypes=[jnp.float32, jnp.float32, cdt, cdt,
                                 cdt, cdt, cdt])
    om1 = jnp.asarray(omega, jnp.float32).reshape(1, 1)
    if mp:
        iD, D = iD.astype(cdt), D.astype(cdt)
        L = L.astype(cdt)
    xo, ro = call([om1], [x, r, iD, D, L[0], L[1], L[2]], _planes(g))
    zrow = jnp.zeros((1, S, 128), jnp.float32)
    xo = _fix_ghost_rows(xo, x[0:1], x[-1:])
    ro = _fix_ghost_rows(ro, zrow, zrow)
    return xo, ro


def jacobi_incr(x, r, L, D, iD, omega, g: FlatGeom, mp: bool = False):
    """Fused Jacobi smoother + increment (`Jacobi!`, `src/Poisson.jl:111-114`)."""
    return gs_incr(x, r, L, D, iD, [], omega, g, mp)


def incr_gs(x: jax.Array, r: jax.Array, eps: jax.Array, L: jax.Array,
            D: jax.Array, iD: jax.Array, colors, omega, g: FlatGeom,
            mp: bool = False, want_norms: bool = False):
    """Fused coarse-correction increment + fine red-black smooth — the tail
    of every MG iteration (`increment!` then `GaussSeidelRB!(fine)`,
    `MultiLevelPoisson.jl:100,115`) in ONE window pass over x/r:

        r₁ = r − ω·A·eps            (on all window rows; eps halo is +1)
        e  = RB-cascade(r₁)         (comm-avoiding, as `gs_incr`)
        x' = x + ω·(eps + e)·ins,   r' = r₁ − ω·A·e·ins

    exactly the sequential `increment_k` → `gs_incr` pair, minus one full
    x/r HBM round trip and one kernel dispatch per solver iteration.
    ``mp`` as in `gs_incr` (cascade + coefficients bf16; r₁/x/r' f32,
    comparisons f32 — bf16 compares crash this Mosaic toolchain).

    ``want_norms``: additionally reduce (L₁, L∞) of r' in-kernel (small-
    output accumulation) and return ``(x', r', (r1, rinf))`` — the solver's
    per-iteration stop-criterion norms without `norms_flat`'s extra full-r
    HBM pass.  f32 sums accumulate per-lane then fold, so values match
    `norms_flat` to reduction-order rounding."""
    Nx, S = g.Nx, g.S
    it = len(colors)
    h = it + 1           # r/iD/D halo (cascade depth); eps/L carry h+1
    cdt = jnp.bfloat16 if mp else jnp.float32

    def body(win, aux, scalars, ox, cos, bx):
        om = scalars[0]
        yv, zv, ins = aux
        xw, rw, ew, idw_w, dw, l0w, l1w, l2w = win
        co = cos[1]          # r-window center offset
        coe = cos[2]         # eps/L-window center offset (halo h+1)
        W = rw.shape[0]
        We = ew.shape[0]
        sliced = (it > 0 and W < Nx and W - it - 2 >= bx
                  and os.environ.get("WLTPU_GS_SLICED", "1") == "1")

        def inner(ap_ref, r1_ref, r1c_ref, e_ref, l1s_ref, l2s_ref, par_ref,
                  ins_ref):
            gx = jax.lax.broadcasted_iota(jnp.int32, (W, S, 128), 0) \
                + (ox - co)
            insw = ins * jnp.where((gx >= 1) & (gx <= Nx - 2), 1.0, 0.0)
            # eps rows aligned to r rows: r row j == eps row j + (coe - co);
            # A·eps is formed on the FULL eps window with row-rotate shifts
            # (their wrap garbage lands only on global ghost rows, which
            # insw zeroes) and sliced through a scratch ref — per-row pl.ds
            # starts would clamp at edge blocks and misalign every row, and
            # dynamic_slice on VALUES has no Mosaic lowering
            de = coe - co
            ef = ew[:]
            apf = ef * dw[:]
            apf = apf + _rshift(ef, -1) * l0w[:] \
                + _rshift(ef, 1) * _rshift(l0w[:], 1)
            apf = apf + _pshift(ef, -g.Nz) * l1w[:] \
                + _pshift(ef, g.Nz) * _pshift(l1w[:], g.Nz)
            apf = apf + _pshift(ef, -1) * l2w[:] \
                + _pshift(ef, 1) * _pshift(l2w[:], 1)
            ap_ref[:] = apf.astype(jnp.float32)
            r1_ref[:] = rw[:] - om * ap_ref[pl.ds(de, W)] * insw
            if mp:
                r1c_ref[:] = r1_ref[:].astype(cdt)
                rv = r1c_ref
            else:
                rv = r1_ref
            e_ref[:] = rv[:] * idw_w[:] * insw.astype(cdt)
            if sliced:
                ins_ref[:] = insw
                par_ref[:] = (gx.astype(jnp.float32) + yv + zv) % 2.0
                l1s_ref[:] = _pshift(l1w[pl.ds(de, W)], g.Nz)
                l2s_ref[:] = _pshift(l2w[pl.ds(de, W)], 1)
                ws = ox - co
                for k, color in enumerate(colors):
                    n = W - k - 2
                    s = jnp.where(ws == 0, 1, k + 1)
                    e_c = e_ref[pl.ds(s, n)]
                    sv = rv[pl.ds(s, n)]
                    sv = sv - (e_ref[pl.ds(s - 1, n)] * l0w[pl.ds(de + s, n)]
                               + e_ref[pl.ds(s + 1, n)]
                               * l0w[pl.ds(de + s + 1, n)])
                    sv = sv - (_pshift(e_c, -g.Nz) * l1w[pl.ds(de + s, n)]
                               + _pshift(e_c, g.Nz) * l1s_ref[pl.ds(s, n)])
                    sv = sv - (_pshift(e_c, -1) * l2w[pl.ds(de + s, n)]
                               + _pshift(e_c, 1) * l2s_ref[pl.ds(s, n)])
                    insl = ins_ref[pl.ds(s, n)]
                    e_ref[pl.ds(s, n)] = jnp.where(
                        (par_ref[pl.ds(s, n)] == float(color)) & (insl > 0),
                        sv * idw_w[pl.ds(s, n)], e_c)
            elif it > 0:
                Ls = [l0w[pl.ds(de, W)], l1w[pl.ds(de, W)],
                      l2w[pl.ds(de, W)]]
                par = (gx.astype(jnp.float32) + yv + zv) % 2.0
                e_ref[:] = _gauss_cascade(rv[:], idw_w[:], Ls, e_ref[:],
                                          colors, par, insw, g)
            e_c = e_ref[pl.ds(co, bx)]
            aeps = e_c * dw[pl.ds(coe, bx)]
            aeps = aeps + e_ref[pl.ds(co - 1, bx)] * l0w[pl.ds(coe, bx)] \
                + e_ref[pl.ds(co + 1, bx)] * l0w[pl.ds(coe + 1, bx)]
            l1c = l1w[pl.ds(coe, bx)]
            l2c = l2w[pl.ds(coe, bx)]
            aeps = aeps + _pshift(e_c, -g.Nz) * l1c \
                + _pshift(e_c, g.Nz) * _pshift(l1c, g.Nz)
            aeps = aeps + _pshift(e_c, -1) * l2c \
                + _pshift(e_c, 1) * _pshift(l2c, 1)
            gxc = jax.lax.broadcasted_iota(jnp.int32, e_c.shape, 0) + ox
            mc = ins * jnp.where((gxc >= 1) & (gxc <= Nx - 2), 1.0, 0.0)
            e_al_c = ew[pl.ds(coe, bx)]
            x_new = xw[:] + om * (e_al_c.astype(jnp.float32)
                                  + e_c.astype(jnp.float32)) * mc
            r_new = r1_ref[pl.ds(co, bx)] - om * aeps.astype(jnp.float32) * mc
            if want_norms:
                ra = jnp.abs(r_new) * _fresh_mask(ox, cos[-1], r_new.shape)
                return [x_new, r_new, _fold8(ra, "sum"), _fold8(ra, "max")]
            return [x_new, r_new]

        scr = pltpu.VMEM((W, S, 128), cdt)
        scr32 = pltpu.VMEM((W, S, 128), jnp.float32)
        ap_scr = pltpu.VMEM((We, S, 128), jnp.float32)
        mini = pltpu.VMEM((1, 1, 128), jnp.float32)
        r1c = scr if mp else mini
        return pl.run_scoped(inner, ap_scr, scr32, r1c, scr, scr, scr,
                             scr32, scr32)

    pipe = os.environ.get("WLTPU_GS_PIPE", "1") == "1"
    bx = _gs_bx(S, h + 3, mp)  # bigger live set than gs_incr: shrink blocks
    call = _halo_call(body, Nx, S, n_scalar=1,
                      halos=[0, h, h + 1, h, h + 1, h + 1, h + 1, h + 1],
                      n_aux=3, n_out=2, bx=bx, vmem_mb=128, pipeline=pipe,
                      in_dtypes=[jnp.float32, jnp.float32, jnp.float32,
                                 cdt, cdt, cdt, cdt, cdt],
                      small=("sum", "max") if want_norms else ())
    om1 = jnp.asarray(omega, jnp.float32).reshape(1, 1)
    if mp:
        iD, D, L = iD.astype(cdt), D.astype(cdt), L.astype(cdt)
    outs = call([om1], [x, r, eps, iD, D, L[0], L[1], L[2]], _planes(g))
    xo, ro = outs[0], outs[1]
    zrow = jnp.zeros((1, S, 128), jnp.float32)
    xo = _fix_ghost_rows(xo, x[0:1], x[-1:])
    ro = _fix_ghost_rows(ro, zrow, zrow)
    if want_norms:
        return xo, ro, (jnp.sum(outs[2]), jnp.max(outs[3]))
    return xo, ro


def _bc_update(uw, Ui, ix, i, yv, zv, g: FlatGeom, save_exit: bool,
               x_ghosts: bool = True):
    """The `BC!` update sequence (`src/core.jl:199-224`) for component ``i``
    of a window value whose row k is global row ``ix[k]``: Dirichlet normal
    slabs, tangential ghost copies (x via in-window row rotate — valid when
    global rows 0/Nx−1, if present, have their neighbor in the window),
    optional exit-plane preservation.  Same (i, j) sequence as
    `ops.flat.bc_vector_flat` so corner ghosts agree."""
    Nx = g.Nx
    # j = 0 (x direction): ghost rows + first interior face
    if i == 0:
        if save_exit:
            # x-high exit plane keeps its current value
            ui = jnp.where((ix == 0) | (ix == 1), Ui, uw)
        else:
            ui = jnp.where((ix == 0) | (ix == 1) | (ix == Nx - 1), Ui, uw)
    elif x_ghosts:
        nb_lo = _rshift(uw, 1)   # row k reads k+1 (ghost row 0)
        nb_hi = _rshift(uw, -1)  # row k reads k-1 (row Nx-1)
        ui = jnp.where(ix == 0, nb_lo, jnp.where(ix == Nx - 1, nb_hi, uw))
    else:
        # caller guarantees rows ∈ [1, Nx−1): the ghost-row rotate is dead
        # code there, and Mosaic crashes lowering it on computed operands
        ui = uw
    # j = 1, 2 (in-plane): sequential like the reference's j loop
    for j in range(1, 3):
        idx = yv if j == 1 else zv
        n = g.Ny if j == 1 else g.Nz
        step = g.Nz if j == 1 else 1
        if i == j:
            ui = jnp.where((idx == 0) | (idx == n - 1) | (idx == 1), Ui, ui)
        else:
            ui = jnp.where(idx == 0, _pshift(ui, step),
                           jnp.where(idx == n - 1, _pshift(ui, -step), ui))
    return ui


def bc_k(u: jax.Array, ubc, g: FlatGeom, save_exit: bool = False) -> jax.Array:
    """`BC!` (`src/core.jl:199-224`) as one fused kernel over x-row windows —
    one HBM pass per component instead of an XLA where-chain that
    materializes the field several times."""
    Nx, S = g.Nx, g.S
    D = u.shape[0]

    def body(win, aux, scalars, ox, cos, bx):
        yv, zv, _ = aux

        def inner(s_ref):
            outs = []
            for i in range(D):
                co = cos[i]
                uw = win[i][:]
                ix = (jax.lax.broadcasted_iota(jnp.int32, uw.shape, 0)
                      + (ox - co))
                s_ref[:] = _bc_update(uw, scalars[i], ix, i, yv, zv, g,
                                      save_exit)
                outs.append(s_ref[pl.ds(co, bx)])
            return outs

        return pl.run_scoped(inner, pltpu.VMEM(win[0].shape, jnp.float32))

    call = _halo_call(body, Nx, S, n_scalar=D, halos=[1] * D, n_aux=3,
                      n_out=D, bx=16, cover_all=True)
    scal = [jnp.asarray(v, jnp.float32).reshape(1, 1) for v in ubc]
    outs = call(scal, [u[i] for i in range(D)], _planes(g))
    return jnp.stack(outs)


def _bc_ghost_rows(slabs, ubc, g: FlatGeom, save_exit: bool):
    """The two x-ghost row slabs (global rows 0 and Nx−1) of `BC!`, as jnp
    ops on (3, S, 128) slabs — the interior-row kernels (`bc_div_k`,
    `projbc_k`) write rows [1, Nx−1) only.  ``slabs = (row0, nb1, rowN,
    nbN)`` supply the pre-BC ghost rows and their interior neighbor rows
    (matching `bc_k`'s in-window rotate reads)."""
    from .flat import fshift, yz_planes

    row0, nb1, rowN, nbN = slabs
    yv, zv, _ = yz_planes(g, jnp.float32)
    rows = []
    for ix_val, row, nb in ((0, row0, nb1), (g.Nx - 1, rowN, nbN)):
        comps = []
        for i in range(3):
            Ui = jnp.asarray(ubc[i], jnp.float32)
            if i == 0:
                keep = save_exit and ix_val == g.Nx - 1
                ui = row[0] if keep else jnp.full_like(row[0], Ui)
            else:
                ui = nb[i]
            for j in range(1, 3):
                idx = yv if j == 1 else zv
                n = g.Ny if j == 1 else g.Nz
                step = g.Nz if j == 1 else 1
                if i == j:
                    ui = jnp.where((idx == 0) | (idx == n - 1) | (idx == 1),
                                   Ui, ui)
                else:
                    ui = jnp.where(idx == 0, fshift(ui, step),
                                   jnp.where(idx == n - 1,
                                             fshift(ui, -step), ui))
            comps.append(ui)
        rows.append(jnp.stack(comps))
    return rows


def bc_div_k(u: jax.Array, ubc, g: FlatGeom, save_exit: bool = False):
    """Fused `BC!` + cell-centered divergence (`src/Flow.jl:17-23`): the
    projection RHS is the divergence of the freshly BC'd predictor field, so
    computing both in one window pass saves re-reading u.  Returns
    ``(u_bc, div)``.  Interior rows in-kernel; the two x-ghost row slabs are
    jnp epilogue (`_bc_ghost_rows`)."""
    Nx, S = g.Nx, g.S

    def body(win, aux, scalars, ox, cos, bx):
        yv, zv, ins = aux

        def inner(r0, r1, r2):
            refs = [r0, r1, r2]
            for i in range(3):
                uw = win[i][:]
                ix = (jax.lax.broadcasted_iota(jnp.int32, uw.shape, 0)
                      + (ox - cos[i]))
                refs[i][:] = _bc_update(uw, scalars[i], ix, i, yv, zv, g,
                                        save_exit, x_ghosts=(i == 0))
            c0 = refs[0][pl.ds(cos[0], bx)]
            u1c = refs[1][pl.ds(cos[1], bx)]
            u2c = refs[2][pl.ds(cos[2], bx)]
            s = (refs[0][pl.ds(cos[0] + 1, bx)] - c0) \
                + (_pshift(u1c, g.Nz) - u1c) + (_pshift(u2c, 1) - u2c)
            gx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + ox
            m = ins * jnp.where((gx >= 1) & (gx <= Nx - 2), 1.0, 0.0)
            return [c0, u1c, u2c, s * m]

        scr = [pltpu.VMEM(w.shape, jnp.float32) for w in win]
        return pl.run_scoped(inner, *scr)

    call = _halo_call(body, Nx, S, n_scalar=3, halos=[1, 0, 0], n_aux=3,
                      n_out=4, bx=int(os.environ.get("WLTPU_BCDIV_BX", "8")),
                      pipeline=True, vmem_mb=128)
    scal = [jnp.asarray(v, jnp.float32).reshape(1, 1) for v in ubc]
    o = call(scal, [u[0], u[1], u[2]], _planes(g))
    lo, hi = _bc_ghost_rows((u[:, 0], u[:, 1], u[:, -1], u[:, -2]), ubc, g,
                            save_exit)
    u_bc = jnp.stack([_fix_ghost_rows(o[i], lo[i][None], hi[i][None])
                      for i in range(3)])
    zrow = jnp.zeros((1, S, 128), jnp.float32)
    dv = _fix_ghost_rows(o[3], zrow, zrow)
    return u_bc, dv


def _proj_row(u: jax.Array, x: jax.Array, L: jax.Array, g: FlatGeom, k: int):
    """Corrected velocity ``u - L ∂x`` at interior x-row ``k`` (jnp slab) —
    feeds the ghost-row epilogue of `projbc_k`."""
    from .flat import fshift, yz_planes

    _, _, ins = yz_planes(g, jnp.float32)
    xk = x[k]
    comps = [u[0, k] - ins * (L[0, k] * (xk - x[k - 1])),
             u[1, k] - ins * (L[1, k] * (xk - fshift(xk, -g.Nz))),
             u[2, k] - ins * (L[2, k] * (xk - fshift(xk, -1)))]
    return jnp.stack(comps)


def projbc_k(u: jax.Array, x: jax.Array, L: jax.Array, ubc, g: FlatGeom,
             save_exit: bool = False, want_cfl: bool = False):
    """Fused projection correction + `BC!` [+ CFL summand]
    (`mom_project!` tail, `src/Flow.jl:227-231` + `src/core.jl:199-224` +
    `CFL`, `src/Flow.jl:234-244`): one window pass computes

        uᵢ −= Lᵢ ∂ᵢx  (interior) → BC! → s = Σᵢ max(0, uᵢ[+eᵢ]) + max(0, −uᵢ)

    instead of three XLA passes that each materialize shifted copies.
    Returns ``u_new`` or ``(u_new, s)`` with ``s`` an (8, 128) in-kernel MAX
    partial of the CFL summand (small-output reduction — the full summand
    field is never written to HBM); ``dt = min(dt_max, 1/(max(s)+5ν))`` is
    the caller's reduction.  Interior rows in-kernel; x-ghost rows via
    `_bc_ghost_rows` with `_proj_row` neighbors."""
    Nx, S = g.Nx, g.S

    def body(win, aux, scalars, ox, cos, bx):
        yv, zv, ins = aux
        u0w, u1w, u2w, xw, l0w, l1w, l2w = win
        # u0/L0 halo-1 windows are exactly rows [ox−1, ox+bx+1) at every
        # block (clamps coincide with the covered range), so the x-component
        # works on the full (bx+2)-row window — an odd-height slice here
        # crashes the Mosaic relayout pass ("limits[i] <= dim(i)")
        bxe = bx + 2
        gx_e = jax.lax.broadcasted_iota(jnp.int32, (bxe, S, 128), 0) + ox - 1
        m_e = ins * jnp.where((gx_e >= 1) & (gx_e <= Nx - 2), 1.0, 0.0)
        x_c = xw[pl.ds(cos[3] - 1, bxe)]        # rows [ox−1, ox+bx+1)
        x_m = _rshift(x_c, -1)                  # x[k−1]; row 0 wrap is masked
        ue0 = u0w[:] - m_e * (l0w[:] * (x_c - x_m))
        m_c = m_e[1:bx + 1]
        x_cc = x_c[1:bx + 1]
        ue1 = u1w[:] - m_c * (l1w[:] * (x_cc - _pshift(x_cc, -g.Nz)))
        ue2 = u2w[:] - m_c * (l2w[:] * (x_cc - _pshift(x_cc, -1)))

        def inner(r0, r1, r2):
            r0[:] = _bc_update(ue0, scalars[0], gx_e, 0, yv, zv, g, save_exit)
            r1[:] = _bc_update(ue1, scalars[1], gx_e[1:bx + 1], 1, yv, zv, g,
                               save_exit, x_ghosts=False)
            r2[:] = _bc_update(ue2, scalars[2], gx_e[1:bx + 1], 2, yv, zv, g,
                               save_exit, x_ghosts=False)
            c0 = r0[pl.ds(1, bx)]
            c1, c2 = r1[:], r2[:]
            outs = [c0, c1, c2]
            if want_cfl:
                s = jnp.zeros((bx, S, 128), jnp.float32)
                s = s + jnp.maximum(0.0, r0[pl.ds(2, bx)]) \
                    + jnp.maximum(0.0, -c0)
                s = s + jnp.maximum(0.0, _pshift(c1, g.Nz)) \
                    + jnp.maximum(0.0, -c1)
                s = s + jnp.maximum(0.0, _pshift(c2, 1)) \
                    + jnp.maximum(0.0, -c2)
                # small-output max: the caller only ever takes max(s) (the
                # CFL reduction) — no full summand field write; max is
                # idempotent over a clamped last block's re-covered rows
                outs.append(_fold8(s * m_c, "max"))
            return outs

        scr_e = pltpu.VMEM((bxe, S, 128), jnp.float32)
        scr_c = pltpu.VMEM((bx, S, 128), jnp.float32)
        return pl.run_scoped(inner, scr_e, scr_c, scr_c)

    call = _halo_call(body, Nx, S, n_scalar=3, halos=[1, 0, 0, 2, 1, 0, 0],
                      n_aux=3, n_out=3,
                      bx=int(os.environ.get("WLTPU_PROJ_BX", "8")),
                      pipeline=True, vmem_mb=128,
                      small=("max",) if want_cfl else ())
    scal = [jnp.asarray(v, jnp.float32).reshape(1, 1) for v in ubc]
    o = call(scal, [u[0], u[1], u[2], x, L[0], L[1], L[2]], _planes(g))
    lo, hi = _bc_ghost_rows((u[:, 0], _proj_row(u, x, L, g, 1), u[:, -1],
                             _proj_row(u, x, L, g, g.Nx - 2)), ubc, g,
                            save_exit)
    u_new = jnp.stack([_fix_ghost_rows(o[i], lo[i][None], hi[i][None])
                       for i in range(3)])
    if not want_cfl:
        return u_new
    return u_new, o[3]


def div_k(u: jax.Array, g: FlatGeom) -> jax.Array:
    """Cell-centered divergence (`div`, `src/Flow.jl:17-23`); ghosts/tail
    zero.  One fused pass (the jnp version materializes a full copy per
    shift)."""
    Nx, S = g.Nx, g.S

    def body(win, aux, scalars, ox, cos, bx):
        _, _, ins = aux
        u0w, u1w, u2w = win
        co = cos[0]
        c0 = u0w[pl.ds(co, bx)]
        # u1/u2 have halo 0 — their center offsets differ from u0's (using
        # cos[0] here read one row off AND one row past the window: the
        # round-1 divergence/nondeterminism bug)
        u1c = u1w[pl.ds(cos[1], bx)]
        u2c = u2w[pl.ds(cos[2], bx)]
        s = (u0w[pl.ds(co + 1, bx)] - c0) \
            + (_pshift(u1c, g.Nz) - u1c) + (_pshift(u2c, 1) - u2c)
        gx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + ox
        return [s * ins * jnp.where((gx >= 1) & (gx <= Nx - 2), 1.0, 0.0)]

    call = _halo_call(body, Nx, S, n_scalar=0, halos=[1, 0, 0], n_aux=3,
                      n_out=1, bx=16, pipeline=True)
    o = call([], [u[0], u[1], u[2]], _planes(g))[0]
    zrow = jnp.zeros((1, S, 128), jnp.float32)
    return _fix_ghost_rows(o, zrow, zrow)


def increment_k(x: jax.Array, r: jax.Array, eps: jax.Array, L: jax.Array,
                D: jax.Array, omega, g: FlatGeom):
    """Fused correction increment (`increment!`, `src/Poisson.jl:100-104`):

        x += ω·eps (interior),  r -= ω·(A·eps)   in one HBM pass
    """
    Nx, S = g.Nx, g.S

    def body(win, aux, scalars, ox, cos, bx):
        om = scalars[0]
        _, _, ins = aux
        xw, rw, ew, l0, l1, l2, dw = win
        co = cos[2]

        def inner(e_ref):
            e_ref[:] = ew[:]
            e_c = e_ref[pl.ds(co, bx)]
            s = e_c * dw[:]
            s = s + e_ref[pl.ds(co - 1, bx)] * l0[pl.ds(co, bx)] \
                + e_ref[pl.ds(co + 1, bx)] * l0[pl.ds(co + 1, bx)]
            l1c = l1[pl.ds(co, bx)]
            l2c = l2[pl.ds(co, bx)]
            s = s + _pshift(e_c, -g.Nz) * l1c + _pshift(e_c, g.Nz) * _pshift(l1c, g.Nz)
            s = s + _pshift(e_c, -1) * l2c + _pshift(e_c, 1) * _pshift(l2c, 1)
            gx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + ox
            m = ins * jnp.where((gx >= 1) & (gx <= Nx - 2), 1.0, 0.0)
            return [xw[:] + om * e_c * m, rw[:] - om * s * m]

        return pl.run_scoped(inner, pltpu.VMEM(ew.shape, jnp.float32))

    # Round-1 measured pipeline=False (the double-buffered variant collapsed
    # ~10x inside the cond-unrolled solver); the solver is now a pure
    # while_loop where Pallas stays pipelined, so the flag is
    # re-measurable via WLTPU_INC_PIPE (step_variants '+ipipe').
    pipe = os.environ.get("WLTPU_INC_PIPE", "0") == "1"
    call = _halo_call(body, Nx, S, n_scalar=1, halos=[0, 0, 1, 1, 1, 1, 0],
                      n_aux=3, n_out=2, bx=8, pipeline=pipe)
    om1 = jnp.asarray(omega, jnp.float32).reshape(1, 1)
    xo, ro = call([om1], [x, r, eps, L[0], L[1], L[2], D], _planes(g))
    xo = _fix_ghost_rows(xo, x[0:1], x[-1:])
    ro = _fix_ghost_rows(ro, r[0:1], r[-1:])
    return xo, ro


def mult_k(x: jax.Array, L: jax.Array, D: jax.Array, g: FlatGeom) -> jax.Array:
    """A·x (`mult`, `src/Poisson.jl:63-76`); ghosts/tail zero."""
    Nx, S = g.Nx, g.S

    def body(win, aux, scalars, ox, cos, bx):
        _, _, ins = aux
        xw, l0, l1, l2, dw = win
        co = cos[0]

        def inner(x_ref):
            x_ref[:] = xw[:]
            x_c = x_ref[pl.ds(co, bx)]
            s = x_c * dw[:]
            s = s + x_ref[pl.ds(co - 1, bx)] * l0[pl.ds(co, bx)] \
                + x_ref[pl.ds(co + 1, bx)] * l0[pl.ds(co + 1, bx)]
            l1c = l1[pl.ds(co, bx)]
            l2c = l2[pl.ds(co, bx)]
            s = s + _pshift(x_c, -g.Nz) * l1c + _pshift(x_c, g.Nz) * _pshift(l1c, g.Nz)
            s = s + _pshift(x_c, -1) * l2c + _pshift(x_c, 1) * _pshift(l2c, 1)
            gx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + ox
            return [s * ins * jnp.where((gx >= 1) & (gx <= Nx - 2), 1.0, 0.0)]

        return pl.run_scoped(inner, pltpu.VMEM(xw.shape, jnp.float32))

    call = _halo_call(body, Nx, S, n_scalar=0, halos=[1, 1, 1, 1, 0],
                      n_aux=3, n_out=1, bx=8, pipeline=True)
    o = call([], [x, L[0], L[1], L[2], D], _planes(g))[0]
    zrow = jnp.zeros((1, S, 128), jnp.float32)
    return _fix_ghost_rows(o, zrow, zrow)
