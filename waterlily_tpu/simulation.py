"""User-facing simulation orchestration.

TPU-native port of `/root/reference/src/WaterLily.jl:86-161`: the `Simulation`
constructor wires Flow + body measurement + the multigrid pressure solver, and
`sim_step` drives the host time loop (data-dependent CFL, like the reference's
`sim_step!` loop at `WaterLily.jl:128-139`) around the fully-jitted device
step.  Body re-measure for moving geometry runs as its own jitted function with
the body pytree as a traced argument, so rigid-motion updates (`setmap`) never
recompile.
"""
from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .models import flow as fl
from .models.body import Body, NoBody, measure_fill, measure_sdf
from .ops import multigrid as mg
from .ops import poisson as ps

__all__ = ["Simulation", "pcg_solve_fn", "check_fn"]


@partial(jax.jit, static_argnames=("shape", "eps_k", "dtype", "perdir", "exit_bc"))
def _measure_jit(body, t, shape, eps_k, dtype, perdir, exit_bc):
    return measure_fill(body, shape, t, eps_k, dtype, perdir, exit_bc)


@partial(jax.jit, static_argnames=("masks", "perdir"))
def _update_mg_jit(masks, mu0, perdir):
    return mg.update_mg(None, masks, mu0, perdir)


@partial(jax.jit, static_argnames=("cfg", "eps_k", "masks", "flat", "has_body"))
def _build_jit(body, state, t, cfg, eps_k, masks, flat, has_body):
    """The whole device-side `Simulation` construction as ONE program: body
    measure (`measure!`, `Body.jl:28-51`), MG coefficient stack (`update!`,
    `MultiLevelPoisson.jl:79-86`), flat-layout conversion, and the BDIM band
    bounds.  Eager construction dispatched ~290 separate device programs —
    ~0.5 s tunnel round trip each on remote TPU backends."""
    from .models import flowflat as ff
    from .ops import flat as fo
    from .ops import mgflat

    cnt = jnp.asarray(0, jnp.int32)
    if has_body:
        V, mu0, mu1, _, cnt = measure_fill(body, cfg.shape, t, eps_k,
                                           cfg.dtype, cfg.perdir, cfg.exit_bc,
                                           want_count=True)
        state = dataclasses.replace(state, V=V, mu0=mu0, mu1=mu1)
    levels = mg.update_mg(None, masks, state.mu0, cfg.perdir)
    if has_body and flat:
        band = _band_box(state.V, state.mu0, state.mu1, cfg.perdir)
    else:
        band = jnp.zeros((len(cfg.shape), 2), jnp.int32)
    if flat:
        gm = fo.geom_of(cfg.shape)
        fstate = ff.state_to_flat(state, gm)
        fmg = mgflat._flatten_stack(levels, gm, masks)
        return state, levels, band, fstate, fmg, cnt
    return state, levels, band, None, None, cnt


@partial(jax.jit, static_argnames=("cfg", "eps_k", "masks", "flat",
                                   "use_band"))
def _remeasure_jit(body, fstate, fmg_prev, t, cfg, eps_k, masks, flat,
                  use_band=False):
    """Fused moving-body re-measure (`measure!(sim)`, `WaterLily.jl:146-149`):
    measure + MG re-restriction + flat-field refresh + band bounds in one
    device program.  ``fstate`` is the authoritative flat state whose u/p are
    left untouched (only V/μ0/μ1 refresh).  ``use_band`` restricts the
    sdf/AD sweep to the ``cfg.band_box`` bounding box (`measure_fill`
    box-banding — the TPU analog of the reference's narrow-band `fastd²`
    early-out, `Body.jl:28-51`); the caller re-measures wider when the
    returned deviation bounds touch a box face."""
    from .ops import mgflat
    from .ops.flat import geom_of, to_flat

    box = cfg.band_box if use_band else None
    sk = cfg.band_k if use_band else None
    V, mu0, mu1, _, cnt = measure_fill(body, cfg.shape, t, eps_k, cfg.dtype,
                                       cfg.perdir, cfg.exit_bc, band_box=box,
                                       sparse_k=sk, want_count=True)
    levels = mg.update_mg(None, masks, mu0, cfg.perdir)
    if flat:
        band = _band_box(V, mu0, mu1, cfg.perdir, box)
        gm = geom_of(cfg.shape)
        if use_band and fmg_prev is not None:
            fmg = mgflat.restack_band(fmg_prev, levels, gm, masks, box)
        else:
            fmg = mgflat._flatten_stack(levels, gm, masks)
        fstate = dataclasses.replace(fstate, **_flat_moments(
            fstate, V, mu0, mu1, gm, box if use_band else None, cfg.shape))
        return (V, mu0, mu1), levels, band, fstate, fmg, cnt
    return ((V, mu0, mu1), levels,
            jnp.zeros((len(cfg.shape), 2), jnp.int32), None, None, cnt)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:  # pragma: no cover
        return False


def check_fn(f, D: int, dtype, nargs: int, name: str) -> None:
    """Constructor-time validation of a user callable (`check_fn`,
    `/root/reference/src/WaterLily.jl:78-84`): call it once per component on
    a dummy point and raise a readable error on a bad signature or a
    non-scalar result, instead of an opaque failure deep inside vmap tracing.

    ``nargs == 3`` → ``f(i, x, t)`` (ubc/g); ``nargs == 2`` → ``f(i, x)``
    (initial condition)."""
    if f is None or not callable(f):
        return
    x = jnp.zeros((D,), dtype)
    t = jnp.asarray(0.0, dtype)
    for i in range(D):
        args = (x, t) if nargs == 3 else (x,)
        sig = f"({', '.join(['i', 'x', 't'][:nargs])})"
        try:
            # i stays a static python int (user code branches on it);
            # x/t are abstract so no actual compute runs
            out = jax.eval_shape(lambda *a: f(i, *a), *args)
        except TypeError as e:
            raise ValueError(
                f"{name} must have signature {name}{sig} with i an int "
                f"component index, x a ({D},) position and t a scalar time: "
                f"{e}") from e
        except Exception as e:
            raise ValueError(
                f"{name}{sig} failed on a dummy point (i={i}, x=zeros({D}), "
                f"t=0) — it must be traceable with jax.numpy ops: {e}") from e
        if jnp.shape(out) != ():
            raise ValueError(
                f"{name}{sig} must return a scalar per component, got shape "
                f"{jnp.shape(out)} for i={i}")


def _band_box(V, mu0, mu1, perdir=(), box=None):
    """Per-dim padded-index ``(lo, hi)`` bounds of the INTERIOR cells that
    deviate from the canonical far-field BDIM pattern: μ1 = 0, V = 0, and
    μ0 = 1 except the normal-face index-1 plane of each non-periodic
    direction, which the measure-time BC fill zeroes (`measure_fill`:
    `bc_vector(mu0, zeros)`).  Ghost-plane values are excluded: the BDIM
    update is interior-masked, μ1 is only ever read at interior cells, and
    the ±1-halo slab of `bdim_band` brings the true ghost planes along.

    ``box`` (per-dim pairs or None) restricts the examined region — valid
    when the fields came from a banded measure over that box (the far field
    outside it is exact by construction).  Returns a ``(D, 2)`` int array;
    dim d reads ``(shape[d], 0)`` when nothing deviates."""
    D = mu0.shape[0]
    shape = mu0.shape[1:]
    if box is None:
        box = (None,) * D
    bounds = []
    for d in range(D):
        bd = box[d] if d < len(box) else None
        a = 1 if bd is None else max(1, int(bd[0]))
        b = shape[d] - 1 if bd is None else min(shape[d] - 1, int(bd[1]))
        bounds.append((a, b))
    sl = (slice(None),) + tuple(slice(a, b) for a, b in bounds)
    m0 = mu0[sl]
    exp = jnp.ones_like(m0)
    for d in range(D):
        if d not in perdir and bounds[d][0] == 1:
            # face-1 plane of dim d (global padded index 1)
            exp = exp.at[(d,) + (slice(None),) * d + (0,)].set(0.0)
    dev_cell = ((m0 != exp).any(axis=0) | (V[sl] != 0).any(axis=0)
                | (mu1[(slice(None),) + sl] != 0).any(axis=(0, 1)))
    out = []
    for d in range(D):
        axes = tuple(k for k in range(D) if k != d)
        dev = dev_cell.any(axis=axes)
        a, b = bounds[d]
        ix = jnp.arange(b - a) + a
        lo = jnp.min(jnp.where(dev, ix, shape[d]))
        hi = jnp.max(jnp.where(dev, ix + 1, 0))
        out.append(jnp.stack([lo, hi]))
    return jnp.stack(out)


def _flat_moments(fstate, V, mu0, mu1, gm, box, shape):
    """Flat-mirror refresh of the measured moments.  With a band ``box``
    only the x-slab rows [lo−1, hi+1) convert and overwrite — valid because
    (a) the measure writes the EXACT far field at every in-box cell outside
    the band, so any cell leaving the band (or the box, next call) already
    holds far values, and (b) the mirror was built by a full conversion and
    every later banded measure preserves out-of-box rows, so they stay the
    (time-invariant) far field.  The ±1 extension covers the x ghost rows
    the measure-time BC fill derives from box rows."""
    from .ops.flat import geom_of, to_flat

    if box is None:
        return dict(V=to_flat(V, gm), mu0=to_flat(mu0, gm),
                    mu1=to_flat(mu1, gm))
    a = max(0, box[0][0] - 1)
    b = min(shape[0], box[0][1] + 1)
    gsl = geom_of((b - a,) + tuple(shape[1:]))
    sl = slice(a, b)
    return dict(
        V=fstate.V.at[:, sl].set(to_flat(V[:, sl], gsl)),
        mu0=fstate.mu0.at[:, sl].set(to_flat(mu0[:, sl], gsl)),
        mu1=fstate.mu1.at[:, :, sl].set(to_flat(mu1[:, :, sl], gsl)))


_BAND_PAD = 4    # extra rows so a slowly-drifting body doesn't retrace


def _quant_k(count: int) -> int:
    """Gather-sparse measure capacity for an observed candidate-band count:
    1.6x margin (band drift between escape checks), power-of-2 quantized so
    capacity growth retraces at most log2(V) times."""
    import math as _math

    return max(2048, 1 << int(_math.ceil(_math.log2(max(1, count) * 1.6))))


def pcg_solve_fn(levels, masks, x, z, tol, itmx, perdir):
    """Adapter running the standalone PCG `Poisson` solver in place of the
    multigrid one (the `pois_ctor` dependency-injection hook of the reference,
    `src/WaterLily.jl:96-97`; select with ``psolver='pcg'``)."""
    x, r, n, stats = ps.solve(levels[0], x, z, tol=tol, itmx=itmx, perdir=perdir)
    pad = jnp.zeros(stats.shape[:1] + (1,), stats.dtype)
    return mg.MGSolveResult(x, r, n, jnp.concatenate([stats, pad], axis=1))


class Simulation:
    """`Simulation(dims, ubc, L; ...)` (`src/WaterLily.jl:36-75`).

    Parameters mirror the reference: ``dims`` interior grid size, ``ubc``
    boundary velocity (tuple or callable ``(i, x, t)``), ``L``/``U`` the
    length/velocity scales defining ``sim_time = t U / L``, ``nu`` viscosity,
    ``g(i,x,t)`` body acceleration, ``eps`` BDIM kernel width, ``perdir``
    periodic directions (0-based), ``exit_bc`` convective outlet on axis 0,
    ``scheme`` the convective flux limiter, ``body`` immersed geometry,
    ``dtype`` array precision.  ``flow_ctor``/``psolver`` are the
    dependency-injection hooks (`WaterLily.jl:69-74`).
    """

    def __init__(self, dims, ubc, L, *, U=None, dt=0.25, nu=0.0,
                 g: Optional[Callable] = None, eps: float = 1.0,
                 perdir: tuple[int, ...] = (), u0=None, exit_bc: bool = False,
                 scheme: Callable = fl.quick, body: Optional[Body] = None,
                 dtype=jnp.float32, tol: float = 2e-3, itmx: int = 32,
                 smooth_it: Optional[int] = None,
                 fine_smooth_it: Optional[int] = None,
                 mp_smooth: Optional[bool] = None,
                 fine_presmooth: Optional[bool] = None,
                 min_coarse_cells: Optional[int] = None,
                 flow_ctor: Optional[Callable] = None, psolver: str = "mg",
                 engine: str = "auto"):
        if U is None:
            if callable(ubc):
                raise ValueError("U (velocity scale) must be given when ubc is a function")
            U = math.sqrt(sum(float(v) ** 2 for v in ubc))
        self.U, self.L, self.eps = U, L, eps
        D = len(dims)
        check_fn(ubc, D, dtype, 3, "ubc")
        check_fn(g, D, dtype, 3, "g")
        check_fn(u0, D, dtype, 2, "u0")
        ctor = flow_ctor or fl.Flow
        # TPU perf auto-config: when the user gives NO explicit solver tuning
        # (kwarg or WLTPU_* env), default to the benched fast config —
        # smooth_it=2 + mixed-precision smoothing (256³ sphere: 48 → 38
        # ms/step at identical settled iteration counts [1,1] and CFL dt;
        # `docs/performance.md`).  The dual-norm stop makes cycle strength a
        # cost knob, never an accuracy one.  CPU/GPU keep the reference-
        # strength 4-sweep f32 defaults — the iteration-cap parity gates
        # (≤2/≤3, `/root/reference/test/test_poisson.jl:65-69`) pin those.
        import os as _os

        if (_on_tpu() and psolver == "mg" and flow_ctor is None
                and smooth_it is None and "WLTPU_SMOOTH_IT" not in _os.environ):
            smooth_it = 2
            if mp_smooth is None and "WLTPU_MP_SMOOTH" not in _os.environ:
                mp_smooth = True
        tuning = {} if flow_ctor is not None else dict(
            smooth_it=smooth_it, fine_smooth_it=fine_smooth_it,
            mp_smooth=mp_smooth, fine_presmooth=fine_presmooth)
        self.flow = ctor(tuple(dims), ubc, dt=dt, nu=nu, g=g, u0=u0,
                         perdir=tuple(perdir), exit_bc=exit_bc, scheme=scheme,
                         dtype=dtype, tol=tol, itmx=itmx, **tuning)
        self.body = body if body is not None else NoBody()
        cfg = self.flow.cfg
        self.psolver = psolver
        self.solver_stats = None   # last step's (2, itmx+1, 3) residual log
        # flat (x, y·z) layout engine: the 3D single-device TPU fast path
        # (`models.flowflat`); "auto" enables it for supported configs on TPU
        from .models import flowflat as ff

        self._flat = None
        has_body = not isinstance(self.body, NoBody)
        flat_on = (engine == "flat"
                   or (engine == "auto" and psolver == "mg"
                       and ff.flat_supported(cfg, g) and _on_tpu()))
        if flat_on and (psolver != "mg" or not ff.flat_supported(cfg, g)):
            raise ValueError("flat engine needs psolver='mg' and D=3")
        # MG coarse-level floor (see `mg.level_shapes`): flow solves are
        # warm-started with a dual-norm stop, so levels below the floor are
        # replaced by the dense exact coarse solve.  `min_coarse_cells`
        # overrides per-sim (perf tuning); DistSimulation inherits it so the
        # decomposed stack stays identical to the single-device one.
        self._min_coarse = (mg._MIN_COARSE_CELLS if min_coarse_cells is None
                            else min_coarse_cells)
        # banded re-measure (narrow-band measure!, `Body.jl:28-51`):
        # restrict the per-step sdf/AD sweep to the body's x-slab;
        # WLTPU_BAND_MEASURE=0 restores the dense full-grid sweep
        import os as _os2

        self._band_measure = _os2.environ.get("WLTPU_BAND_MEASURE", "1") == "1"
        # gather-sparse banded measure (`measure_fill(sparse_k=)`): OFF by
        # default — measured SLOWER than the dense box sweep at bench scale
        # (128³ oscillating sphere: 2.73 ms sparse vs 0.13 ms dense-box;
        # `benchmarks/remeasure_probe.py` — the nonzero/gather/scatter
        # machinery costs more than the vectorized AD it saves).  Kept as an
        # exact opt-in (WLTPU_SPARSE_MEASURE=1) for bodies whose band is a
        # tiny fraction of a very large box (thin shells in big domains).
        self._sparse_measure = _os2.environ.get("WLTPU_SPARSE_MEASURE",
                                                "0") == "1"
        if psolver == "mg":
            # the whole device-side build (measure + MG stack + flat layout +
            # band bounds) runs as ONE program — see `_build_jit`
            self.masks = tuple(mg.level_shapes(
                cfg.shape, min_cells=self._min_coarse)[1])
            self.solve_fn = None
            state, self.levels, band, fstate, fmg, cnt = _build_jit(
                self.body if has_body else None, self.flow.state,
                jnp.asarray(0.0, cfg.dtype), cfg, float(eps), self.masks,
                flat_on, has_body)
            self.flow.state = state
            if has_body and flat_on and self._sparse_measure:
                self.flow.cfg = cfg = dataclasses.replace(
                    cfg, band_k=_quant_k(int(cnt)))
            if flat_on:
                from .ops import flat as fo

                self._flat = {"g": fo.geom_of(cfg.shape), "state": fstate,
                              "fmg": fmg}
                self._flat_fresh = False   # flat state newer than flow._state?
            self._set_band(band if (has_body and flat_on) else None)
        elif psolver == "pcg":
            if has_body:
                V, mu0, mu1, _ = _measure_jit(self.body, jnp.asarray(0.0, dtype),
                                              cfg.shape, float(eps), cfg.dtype,
                                              cfg.perdir, cfg.exit_bc)
                self.flow.state = dataclasses.replace(self.flow.state,
                                                      V=V, mu0=mu0, mu1=mu1)
            self.levels = (ps.make_level(self.flow.state.mu0),)
            self.masks = ()
            self.solve_fn = pcg_solve_fn
        else:
            raise ValueError(f"unknown psolver {psolver!r}")
        # deferred post-scan remeasure (`_sim_step_n_moving`): the hook
        # completes it before any host code reads the state
        self._meas_stale: Optional[float] = None
        self.flow._refresh = self._refresh_state

    # ------------------------------------------------------------- time
    @property
    def time(self) -> float:
        return self.flow.time

    @property
    def sim_time(self) -> float:
        """Dimensionless time tU/L (`sim_time`, `WaterLily.jl:111-117`)."""
        return self.time * self.U / self.L

    @property
    def pois_n(self):
        """Pressure iterations per projection (reference `sim.pois.n`)."""
        return self.flow.pois_n

    def _set_band(self, band):
        """Maintain ``cfg.band_x`` (the x-row interval enabling the
        band-sparse BDIM kernel, `ops.pallas_flat.bdim_band`) and
        ``cfg.band_box`` (the per-dim measure-time narrow-band box,
        `measure_fill(band_box=)`).  ``band`` is the (D, 2) device array of
        raw per-dim [lo, hi) deviation bounds computed inside the fused
        build/remeasure program (`_band_box`), or None when the band path is
        inactive.  The stored intervals carry ``_BAND_PAD`` slack so a
        slowly drifting body re-traces only every few cells of travel; an
        escape widens them (correctness is never at stake: outside the
        measured box μ0 ≡ 1, μ1 ≡ 0, V ≡ 0 exactly)."""
        if band is None:
            return
        import numpy as np

        arr = np.asarray(band)                        # one host sync
        cfg = self.flow.cfg
        cur, cur_box = cfg.band_x, cfg.band_box
        lo, hi = int(arr[0, 0]), int(arr[0, 1])
        if hi <= lo:
            band_t, box_t = None, None
        else:
            box_t = tuple(
                (max(1, int(arr[d, 0]) - _BAND_PAD),
                 min(cfg.shape[d] - 1, int(arr[d, 1]) + _BAND_PAD))
                for d in range(len(cfg.shape)))
            Nx = cfg.shape[0]
            inside = cur is not None and cur_box is not None and all(
                cur_box[d][0] <= int(arr[d, 0]) and int(arr[d, 1]) <= cur_box[d][1]
                for d in range(len(cfg.shape)))
            if inside:
                return   # raw bounds still inside the stored padded box
            band_t = (max(1, lo - _BAND_PAD), min(Nx - 1, hi + _BAND_PAD))
        if band_t != cur or box_t != cur_box:
            self.flow.cfg = dataclasses.replace(cfg, band_x=band_t,
                                                band_box=box_t)

    def _refresh_state(self):
        """`Flow.state` access hook: complete any deferred post-scan
        remeasure, then lazily sync the flat-engine 3D mirror.  The guard
        makes re-entrant access from inside `measure()` a no-op."""
        if getattr(self, "_in_refresh", False):
            return
        self._in_refresh = True
        try:
            self._ensure_measured()
            self._pull_flat()
        finally:
            self._in_refresh = False

    def _ensure_measured(self):
        """Run a remeasure deferred by `_sim_step_n_moving`.  The moving scan
        re-derives V/μ0/μ1 and the MG coefficients from the body at every
        iteration, so its post-scan host refresh is LAZY: the fused
        `_remeasure_jit` dispatch + band fetch (a fixed ~100 ms host tail per
        scan call on the tunneled backend) only run when host code actually
        reads the moments, steps outside the moving scan, or computes
        metrics — consecutive `sim_step_n(remeasure=True)` calls skip it
        entirely (the stale band rows of the carried solver stack are always
        inside the next scan's band box — boxes widen monotonically under
        escape — and are restacked from the fresh measure before first
        use)."""
        t = self._meas_stale
        if t is None:
            return
        self._meas_stale = None
        self.measure(t=t)

    # ------------------------------------------------------------- stepping
    def measure(self, t: Optional[float] = None):
        """Re-measure a dynamic body and refresh the multigrid coefficients
        (`measure!(sim)`, `WaterLily.jl:146-149`)."""
        self._meas_stale = None       # a fresh measure supersedes a deferred one
        if isinstance(self.body, NoBody):
            return
        cfg = self.flow.cfg
        if t is None:
            t = self.time + self.flow.dt[-1]
        if self.psolver == "mg":
            # fused: measure + MG re-restriction + flat refresh + band bounds
            # in ONE device program (`_remeasure_jit`).  With a known box
            # the sdf/AD sweep is restricted to it; if the measured
            # deviations touch a box face the body may extend past it, so
            # the box is widened around the raw bounds and the measure
            # re-runs (the host-side escape loop that makes banding exact).
            flat_on = self._flat is not None
            fstate = self._flat["state"] if flat_on else None
            import numpy as np

            for _ in range(8):
                use_band = (flat_on and self._band_measure
                            and cfg.band_box is not None)
                if not (use_band and self._sparse_measure) and cfg.band_k:
                    # sparse path off for this measure: drop the capacity
                    # from the cfg key so the dense program is shared
                    self.flow.cfg = cfg = dataclasses.replace(cfg,
                                                              band_k=None)
                (V, mu0, mu1), self.levels, band, fstate, fmg, cnt = \
                    _remeasure_jit(self.body, fstate,
                                   self._flat["fmg"] if flat_on else None,
                                   jnp.asarray(t, cfg.dtype), cfg,
                                   float(self.eps), self.masks, flat_on,
                                   use_band)
                if not use_band:
                    break
                if self._sparse_measure and cfg.band_k is None:
                    # banded-dense measure (e.g. after a relocate): correct
                    # as-is; re-arm the sparse path for the next measure
                    self.flow.cfg = cfg = dataclasses.replace(
                        cfg, band_k=_quant_k(int(cnt)))
                if cfg.band_k:
                    c = int(cnt)
                    if c > int(0.85 * cfg.band_k):
                        # capacity escape: overflow cells kept far-field
                        # values — regrow and re-measure
                        self.flow.cfg = cfg = dataclasses.replace(
                            cfg, band_k=_quant_k(c))
                        continue
                    if _quant_k(c) < cfg.band_k // 2:
                        # body shrank: padding points still pay AD — shrink
                        # (next measure; this one is correct)
                        self.flow.cfg = cfg = dataclasses.replace(
                            cfg, band_k=_quant_k(c))
                arr = np.asarray(band)
                box = cfg.band_box
                if int(arr[0, 1]) <= int(arr[0, 0]):
                    # nothing found in the box: the body left it entirely
                    # (teleport-scale motion) — relocate with a full measure
                    self.flow.cfg = cfg = dataclasses.replace(
                        cfg, band_x=None, band_box=None)
                    continue
                ok = all(
                    (int(arr[d, 0]) > box[d][0] or box[d][0] <= 1)
                    and (int(arr[d, 1]) < box[d][1]
                         or box[d][1] >= cfg.shape[d] - 1)
                    for d in range(len(cfg.shape)))
                if ok:
                    break      # strictly inside (or clamped at the domain)
                wide = tuple(
                    (max(1, min(int(arr[d, 0]), box[d][0]) - 2 * _BAND_PAD),
                     min(cfg.shape[d] - 1,
                         max(int(arr[d, 1]), box[d][1]) + 2 * _BAND_PAD))
                    for d in range(len(cfg.shape)))
                if wide == box:
                    break
                self.flow.cfg = cfg = dataclasses.replace(
                    cfg, band_x=wide[0], band_box=wide)
            self.flow._state = dataclasses.replace(self.flow._state,
                                                   V=V, mu0=mu0, mu1=mu1)
            if flat_on:
                self._flat["state"] = fstate
                self._flat["fmg"] = fmg
                self._set_band(band)
        else:
            V, mu0, mu1, _ = _measure_jit(self.body, jnp.asarray(t, cfg.dtype),
                                          cfg.shape, float(self.eps), cfg.dtype,
                                          cfg.perdir, cfg.exit_bc)
            self.flow.state = dataclasses.replace(self.flow.state,
                                                  V=V, mu0=mu0, mu1=mu1)
            self.levels = (ps.make_level(mu0),)

    def step_once(self, remeasure: bool = True, udf=None):
        """One `mom_step` (+ optional body re-measure), host bookkeeping of
        Δt history and solver iteration counts."""
        if remeasure:
            self.measure()
        else:
            self._ensure_measured()
        cfg = self.flow.cfg
        dt = jnp.asarray(self.flow.dt[-1], cfg.dtype)
        t0 = jnp.asarray(self.time, cfg.dtype)
        if self._flat is not None:
            from .models import flowflat as ff

            gm = self._flat["g"]
            state, dt_next, iters, stats = ff.mom_step_flat(
                cfg, self._flat["state"], self._flat["fmg"], self.masks, gm,
                dt, t0, udf)
            self._flat["state"] = state
            # 3D mirror syncs lazily on next `flow.state` read (no per-step
            # layout copies in the hot loop)
            self._flat_fresh = True
        else:
            state, dt_next, iters, stats = fl.mom_step(
                cfg, self.flow.state, self.levels, self.masks, dt, t0, udf,
                self.solve_fn)
            self.flow.state = state
            self._sync_flat()
        self.flow.dt.append(float(dt_next))
        import numpy as np

        self.flow.pois_n += np.asarray(iters).tolist()   # one host transfer
        self.solver_stats = stats
        return self

    def _pull_flat(self):
        """Lazy flat → 3D sync, installed as `Flow._refresh`: convert the
        stepped fields back to the 3D layout on first access only."""
        if not getattr(self, "_flat_fresh", False):
            return
        from .ops.flat import from_flat

        gm = self._flat["g"]
        st = self._flat["state"]
        self._flat_fresh = False
        self.flow._state = dataclasses.replace(
            self.flow._state, u=from_flat(st.u, gm),
            u0=from_flat(st.u0, gm), p=from_flat(st.p, gm))

    def _sync_flat(self):
        """Re-flatten the dynamic fields after a 3D-side state mutation."""
        if self._flat is None:
            return
        from .ops.flat import to_flat

        gm = self._flat["g"]
        st = self.flow.state
        self._flat_fresh = False
        self._flat["state"] = dataclasses.replace(
            self._flat["state"], u=to_flat(st.u, gm), u0=to_flat(st.u0, gm),
            p=to_flat(st.p, gm))

    def sim_step_n(self, n: int, *, udf=None, remeasure: bool = False):
        """``n`` CFL-limited steps in ONE device program (`lax.scan` over the
        momentum step) — the TPU-idiomatic driver: the whole loop is a single
        XLA dispatch, so per-step host round trips (which dominate small
        grids on tunneled backends) vanish and the compiler pipelines across
        step boundaries.  The CFL dt rides the scan carry on device; the
        full Δt / solver-iteration history is appended to the host lists
        afterwards, so `sim_time`, `pois_n` and logging behave exactly as
        after ``n`` calls of `step_once`.

        With ``remeasure=True`` a MOVING body rides the scan too: the body
        pytree (traced motion parameters, `models.rigidmap`) is a scan-
        invariant argument and each iteration fuses the banded measure + MG
        re-restriction + momentum step (`measure!` + `mom_step!`,
        `WaterLily.jl:146-149` + `128-139`).  The measure uses the static
        ``cfg.band_x`` slab; every step also emits the deviation bounds, and
        if they ever touch the measured edge the whole scan re-runs from the
        saved entry state with a widened band (escape-redo — banding stays
        exact, `models.body.measure_fill`).  (The reference has no analog;
        its host loop dispatches every kernel individually.)"""
        if remeasure and not isinstance(self.body, NoBody):
            return self._sim_step_n_moving(n, udf)
        self._ensure_measured()
        from .parallel.dist import _cached_fn

        cfg = self.flow.cfg
        # cached across Simulation INSTANCES (reference/test pairs of the
        # same config share one compile).  cfg is part of the key:
        # `measure()` may widen cfg.band_x for a moving body, and a cached
        # closure would silently keep the old one.  `self.masks` is in the
        # key too: the MG level stack depends on `min_coarse_cells`, which
        # is NOT part of FlowCfg — two sims differing only in the coarse
        # floor must not share a compiled scan.  The entry holds strong
        # references to udf/solve_fn, so an `id()` in the key can never
        # alias a GC'd callable's recycled id to a stale compiled scan.
        key = ("sim_scan", n, self._flat is not None, cfg, self.masks,
               id(udf), id(self.solve_fn))

        def mk():
            if self._flat is not None:
                from .models import flowflat as ff

                gm, masks = self._flat["g"], self.masks

                def one(carry, _, solver):
                    state, dt, t0 = carry
                    state, dt_n, iters, stats = ff.mom_step_flat_impl(
                        cfg, state, solver, masks, gm, dt, t0, udf)
                    return (state, dt_n, t0 + dt), (dt_n, iters, stats)
            else:
                masks, solve_fn = self.masks, self.solve_fn

                def one(carry, _, solver):
                    state, dt, t0 = carry
                    state, dt_n, iters, stats = fl.mom_step_impl(
                        cfg, state, solver, masks, dt, t0, udf, solve_fn)
                    return (state, dt_n, t0 + dt), (dt_n, iters, stats)

            @jax.jit
            def run(state, solver, dt, t0):
                return jax.lax.scan(partial(one, solver=solver),
                                    (state, dt, t0), None, length=n)

            return (udf, self.solve_fn, run)

        run = _cached_fn(key, mk)[2]
        dt = jnp.asarray(self.flow.dt[-1], cfg.dtype)
        t0 = jnp.asarray(self.time, cfg.dtype)
        if self._flat is not None:
            solver = self._flat["fmg"]
            (state, dt_n, _), (dts, iters, stats) = run(self._flat["state"],
                                                        solver, dt, t0)
            self._flat["state"] = state
            self._flat_fresh = True
        else:
            (state, dt_n, _), (dts, iters, stats) = run(self.flow.state,
                                                        self.levels, dt, t0)
            self.flow.state = state
            self._sync_flat()
        import numpy as np

        self.flow.dt.extend(np.asarray(dts).tolist())    # one host transfer
        self.flow.pois_n.extend(np.asarray(iters).reshape(-1).tolist())
        self.solver_stats = stats[-1]
        return self

    def _sim_step_n_moving(self, n: int, udf=None):
        """Scan-fused moving-body driver (see `sim_step_n`): per iteration a
        banded `measure_fill` + `update_mg` + `mom_step` in one traced body,
        with the body pytree as a scan-invariant traced argument — rigid-
        motion parameter updates never recompile.  Host-side escape-redo: the
        scan carries an "escaped" flag; when set, the entry state was saved,
        the band widens to the union of every observed deviation interval
        (monotone growth → terminates, at worst at the full-measure domain),
        and the scan re-runs."""
        if self.psolver != "mg":
            raise ValueError("sim_step_n(remeasure=True) needs psolver='mg'")
        import numpy as np

        from .parallel.dist import _cached_fn

        for _ in range(8):
            cfg = self.flow.cfg
            flat_on = self._flat is not None
            box = cfg.band_box if (flat_on and self._band_measure) else None
            sk = cfg.band_k if (box is not None
                                and self._sparse_measure) else None
            D = cfg.D
            key = ("sim_scan_meas", n, flat_on, cfg, self.masks, id(udf), sk)

            def mk():
                masks, eps_k = self.masks, float(self.eps)

                def esc_check(esc, bnds):
                    if box is None:
                        return esc
                    for d in range(D):
                        lo, hi = bnds[d, 0], bnds[d, 1]
                        esc = (esc | ((lo <= box[d][0]) & (box[d][0] > 1))
                               | ((hi >= box[d][1])
                                  & (box[d][1] < cfg.shape[d] - 1)))
                    return esc | (bnds[0, 1] <= bnds[0, 0])

                if flat_on:
                    from .models import flowflat as ff
                    from .ops import mgflat
                    from .ops.flat import to_flat

                    gm = self._flat["g"]

                    def one(carry, _, body):
                        fstate, fmg, dt, t0, esc = carry
                        V, mu0, mu1, _, cnt = measure_fill(
                            body, cfg.shape, t0 + dt, eps_k, cfg.dtype,
                            cfg.perdir, cfg.exit_bc, band_box=box,
                            sparse_k=sk, want_count=True)
                        levels = mg.update_mg(None, masks, mu0, cfg.perdir)
                        if box is not None:
                            fmg = mgflat.restack_band(fmg, levels, gm, masks,
                                                      box)
                        else:
                            fmg = mgflat._flatten_stack(levels, gm, masks)
                        fstate = dataclasses.replace(
                            fstate, **_flat_moments(fstate, V, mu0, mu1, gm,
                                                    box, cfg.shape))
                        bnds = _band_box(V, mu0, mu1, cfg.perdir, box)
                        esc = esc_check(esc, bnds)
                        if sk is not None:
                            # capacity escape: re-run the scan with a bigger
                            # gather before overflow can drop band cells
                            esc = esc | (cnt > int(0.85 * sk))
                        fstate, dt_n, iters, stats = ff.mom_step_flat_impl(
                            cfg, fstate, fmg, masks, gm, dt, t0, udf)
                        return ((fstate, fmg, dt_n, t0 + dt, esc),
                                (dt_n, iters, stats, bnds, cnt))
                else:
                    def one(carry, _, body):
                        state, fmg, dt, t0, esc = carry
                        V, mu0, mu1, _ = measure_fill(
                            body, cfg.shape, t0 + dt, eps_k, cfg.dtype,
                            cfg.perdir, cfg.exit_bc, band_box=box)
                        levels = mg.update_mg(None, masks, mu0, cfg.perdir)
                        state = dataclasses.replace(state, V=V, mu0=mu0,
                                                    mu1=mu1)
                        state, dt_n, iters, stats = fl.mom_step_impl(
                            cfg, state, levels, masks, dt, t0, udf, None)
                        z = jnp.zeros((D, 2), jnp.int32)
                        return ((state, fmg, dt_n, t0 + dt, esc),
                                (dt_n, iters, stats, z,
                                 jnp.asarray(0, jnp.int32)))

                @jax.jit
                def run(state, fmg0, body, dt, t0):
                    return jax.lax.scan(partial(one, body=body),
                                        (state, fmg0, dt, t0,
                                         jnp.asarray(False)),
                                        None, length=n)

                return (udf, run)

            run = _cached_fn(key, mk)[1]
            st0 = self._flat["state"] if flat_on else self.flow.state
            fmg0 = self._flat["fmg"] if flat_on else ()
            dt = jnp.asarray(self.flow.dt[-1], cfg.dtype)
            t0 = jnp.asarray(self.time, cfg.dtype)
            (st, _, dt_n, _, esc), (dts, iters, stats, bands, cnts) = run(
                st0, fmg0, self.body, dt, t0)
            # ONE host round trip for the escape flag + history (an escape
            # redo discards the history, but escapes are rare and the
            # batched fetch saves a tunnel round trip on every normal call)
            esc_np, dts_np, iters_np = jax.device_get((esc, dts, iters))
            if box is not None and bool(esc_np):
                arr = np.asarray(bands)          # (n, D, 2)
                lo_r = arr[:, :, 0].min(axis=0)  # per-dim over all steps
                hi_r = arr[:, :, 1].max(axis=0)
                new_k = cfg.band_k
                if sk is not None:
                    kx = int(np.asarray(cnts).max())
                    if kx > int(0.85 * sk):
                        new_k = _quant_k(kx)
                if int(hi_r[0]) <= int(lo_r[0]):   # body left the box
                    wide = None
                    band_x = None
                    new_k = None       # dense relocate; measure() re-arms
                else:
                    wide = tuple(
                        (max(1, min(int(lo_r[d]), box[d][0]) - 2 * _BAND_PAD),
                         min(cfg.shape[d] - 1,
                             max(int(hi_r[d]), box[d][1]) + 2 * _BAND_PAD))
                        for d in range(D))
                    band_x = wide[0]
                if wide != box or new_k != cfg.band_k:
                    self.flow.cfg = dataclasses.replace(
                        cfg, band_x=band_x, band_box=wide, band_k=new_k)
                    continue            # redo from the saved entry state
            break
        if flat_on:
            self._flat["state"] = st
            self._flat_fresh = True
        else:
            self.flow.state = st
            self._sync_flat()
        self.flow.dt.extend(np.asarray(dts_np).tolist())
        self.flow.pois_n.extend(np.asarray(iters_np).reshape(-1).tolist())
        self.solver_stats = stats[-1]
        # final V/μ0/μ1/levels were consumed inside the scan; DEFER their
        # host-side re-derivation (`_ensure_measured`): back-to-back moving
        # scan calls never need it, and the access hook re-derives them at
        # the final time before anything host-driven reads the state
        self._meas_stale = self.time
        return self

    def sim_step(self, t_end: Optional[float] = None, *, remeasure: bool = True,
                 max_steps: int = 10**9, verbose: bool = False, udf=None):
        """Advance to dimensionless time ``t_end`` (one step if omitted)
        (`sim_step!`, `WaterLily.jl:128-139`)."""
        if t_end is None:
            return self.step_once(remeasure, udf)
        steps = 0
        while self.sim_time < t_end and steps < max_steps:
            self.step_once(remeasure, udf)
            steps += 1
            if verbose:
                self.sim_info()
        return self

    def sim_info(self):
        """One-line status print (`sim_info`, `WaterLily.jl:155`)."""
        print(f"tU/L={self.sim_time:.4f}, dt={self.flow.dt[-1]:.3f}")

    # ------------------------------------------------------------- utilities
    def perturb(self, noise: float = 0.1, seed: int = 0):
        """Add velocity noise scaled by U (`perturb!`, `WaterLily.jl:161`)."""
        key = jax.random.PRNGKey(seed)
        u = self.flow.state.u
        u = u + noise * self.U * jax.random.normal(key, u.shape, u.dtype)
        self.flow.state = dataclasses.replace(self.flow.state, u=u)
        self._sync_flat()
        return self

    def sdf_field(self, t: Optional[float] = None):
        """Signed distance of the current body on the cell centers."""
        cfg = self.flow.cfg
        return measure_sdf(self.body, cfg.shape, t if t is not None else self.time,
                           cfg.dtype)
