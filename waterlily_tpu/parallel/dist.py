"""Multi-chip domain decomposition driver: `DistSimulation`.

The first-class distributed component the reference lacks (it is
single-device; its MPI scaling work lives in a separate fork — SURVEY §2.14).

Architecture (TPU-native, per SURVEY §7):

* the interior grid is split evenly over a `jax.sharding.Mesh` with axes
  ('x','y','z') mapped to the leading spatial dims;
* every shard stores its block in the same 1-ghost-padded layout as a
  single-device field, so the whole numerics stack runs unchanged per shard
  (`mom_step_impl` with a `DistCtx`);
* ghost contents come from ring `ppermute` halo exchanges over ICI — one
  exchange per stencil sweep, per smoother color, and per multigrid level;
* global reductions (CFL, residual norms, exit flux) are `psum`/`pmax`;
* multigrid levels too coarse to split are all-gathered and solved replicated
  (coarse-grid gather).

The "blocked" host layout concatenates the padded local blocks, so a global
blocked array has size ``k·(N/k + 2)`` per sharded dim; `to_blocked` /
`from_blocked` convert to and from the dense single-device layout.
"""
from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import flow as fl
from ..models.body import NoBody, measure_fill
from ..ops import multigrid as mg
from ..ops.dist import make_ctx
from ..simulation import Simulation

try:  # jax >= 0.5 exposes shard_map at top level
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

__all__ = ["make_mesh", "to_blocked", "from_blocked", "DistSimulation",
           "clear_fn_cache"]


def make_mesh(shape: Optional[tuple[int, ...]] = None, devices=None) -> Mesh:
    """Device mesh with axes ('x','y','z')[:ndim] for spatial decomposition."""
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),)
    names = ("x", "y", "z")[: len(shape)]
    arr = np.asarray(devices[: math.prod(shape)]).reshape(shape)
    return Mesh(arr, names)


def _mesh_sizes(mesh: Mesh, D: int) -> tuple[int, ...]:
    names = list(mesh.axis_names)
    return tuple(mesh.shape[names[d]] if d < len(names) else 1 for d in range(D))


def _mesh_axes(mesh: Mesh, D: int) -> tuple:
    names = list(mesh.axis_names)
    return tuple(names[d] if d < len(names) and mesh.shape[names[d]] > 1 else None
                 for d in range(D))


# ------------------------------------------------------------- blocked layout
def to_blocked(a: np.ndarray, sizes: tuple[int, ...], lead: int = 0) -> jnp.ndarray:
    """Dense padded global array → blocked layout: per sharded dim, the
    interior is split into ``k`` chunks and each chunk carries its own ghost
    layer (neighbor interior values, or the physical ghosts at the ends)."""
    a = np.asarray(a)
    for d, k in enumerate(sizes):
        if k == 1:
            continue
        ax = lead + d
        n_int = a.shape[ax] - 2
        nl = n_int // k
        chunks = []
        for s in range(k):
            i0 = 1 + s * nl
            sl = [slice(None)] * a.ndim
            sl[ax] = slice(i0 - 1, i0 + nl + 1)
            chunks.append(a[tuple(sl)])
        a = np.concatenate(chunks, axis=ax)
    return jnp.asarray(a)


def from_blocked(a, sizes: tuple[int, ...], lead: int = 0) -> np.ndarray:
    """Inverse of `to_blocked` (drops duplicate halo layers)."""
    a = np.asarray(a)
    for d, k in enumerate(sizes):
        if k == 1:
            continue
        ax = lead + d
        nl = a.shape[ax] // k          # local padded length
        parts = []
        for s in range(k):
            sl = [slice(None)] * a.ndim
            lo = s * nl + (0 if s == 0 else 1)
            hi = (s + 1) * nl - (0 if s == k - 1 else 1)
            sl[ax] = slice(lo, hi)
            parts.append(a[tuple(sl)])
        a = np.concatenate(parts, axis=ax)
    return a


def _dist_on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:  # pragma: no cover
        return False


# Compiled-function cache shared across DistSimulation instances: the jitted
# step/measure/layout closures are fully determined by (cfg, mesh content,
# engine[, udf identity]), so two sims of the same configuration — the
# dominant pattern in tests (reference vs distributed pairs) and in
# checkpoint-restart — reuse one compilation instead of re-tracing per
# instance.  Values hold strong references to any udf so object identity in
# the key can never alias a recycled id.  LRU-bounded: a long-running driver
# sweeping many distinct configs (cfg is in the key — e.g. moving band_x
# variants) would otherwise accumulate compiled executables for the process
# lifetime; evicting an entry only drops OUR strong reference — a jitted fn
# still held by a live Simulation keeps working.
_FN_CACHE_MAX = 256
_FN_CACHE: "dict" = {}


def _cached_fn(key, builder):
    ent = _FN_CACHE.pop(key, None)
    if ent is None:
        ent = builder()
        if len(_FN_CACHE) >= _FN_CACHE_MAX:
            _FN_CACHE.pop(next(iter(_FN_CACHE)))   # evict least-recent
    _FN_CACHE[key] = ent                           # (re)insert most-recent
    return ent


def clear_fn_cache() -> None:
    """Drop every cached compiled closure (explicit hook for config sweeps)."""
    _FN_CACHE.clear()


class DistSimulation:
    """Domain-decomposed drop-in for `Simulation`.

    Build a regular `Simulation` (dense, single device) and hand it over::

        sim = Simulation((256, 128, 128), (1, 0, 0), 32, body=sphere)
        dsim = DistSimulation(sim, make_mesh((4, 2)))
        dsim.sim_step(10)                     # SPMD over the mesh
        u = dsim.u                            # dense layout for analysis

    Every sharded interior dim must split evenly with >= 2 cells per shard,
    and at least the finest multigrid level must remain distributable.
    """

    def __init__(self, sim: Simulation, mesh: Mesh, engine: str = "auto"):
        if sim.psolver not in ("mg", "pcg"):
            # the reference honors `pois_ctor` injection (`WaterLily.jl:96-97`)
            # everywhere; silently substituting MG for an unknown custom
            # solver would be worse than refusing
            raise ValueError(
                f"DistSimulation supports psolver='mg' or 'pcg' (got "
                f"{sim.psolver!r}); run custom pressure solvers single-device")
        cfg = sim.flow.cfg
        D = cfg.D
        self.mesh = mesh
        self.sizes = _mesh_sizes(mesh, D)
        self.axes = _mesh_axes(mesh, D)
        for d, k in enumerate(self.sizes):
            n = cfg.shape[d] - 2
            if k > 1 and (n % k != 0 or n // k < 2):
                raise ValueError(
                    f"dim {d}: interior {n} not evenly divisible over {k} shards")
        self.psolver = sim.psolver
        if self.psolver == "pcg":
            # single-level stack, fully distributed: `ops.poisson.solve` is
            # ctx-aware end to end (halo-synced mult, psum'd dots/norms)
            self.masks, self.n_dist = (), 1
            self._coarse_dense = False
        else:
            shapes, masks, n_dist = mg.dist_n_levels(
                cfg.shape, self.sizes,
                min_cells=getattr(sim, "_min_coarse", mg._MIN_COARSE_CELLS))
            if n_dist < 1:
                raise ValueError("grid too small to distribute over this mesh")
            self.masks, self.n_dist = tuple(masks), n_dist
            from ..ops.poisson import _DENSE_COARSE_MAX

            # does the replicated coarsest level carry the dense-solve pinv?
            self._coarse_dense = (math.prod(d - 2 for d in shapes[-1])
                                  <= _DENSE_COARSE_MAX)
        self.sim = sim
        self.cfg = cfg
        # blocked, sharded device state
        self._flat_mode = False   # final value decided below
        self._fstale = False      # flat state newer than the 3D mirror?
        self._state = self._put_state(sim.flow.state)
        self.levels = self._build_levels()
        self.solver_stats = None
        # flat (x, y·z) fast path: x-only decomposition of a 3D mg config
        from ..models import flowflat as ffm

        flat_ok = (D == 3 and self.sizes[0] > 1
                   and all(k == 1 for k in self.sizes[1:])
                   and sim.psolver == "mg" and ffm.flat_supported(cfg))
        self._flat_mode = engine == "flat" or (engine == "auto" and flat_ok
                                               and _dist_on_tpu())
        if self._flat_mode and not flat_ok:
            raise ValueError("flat dist engine needs a 3D mg config decomposed"
                             " over the x mesh axis only")
        if self._flat_mode:
            self._flat_setup()

    # ------------------------------------------------------------ specs
    def _specs(self, lead: int):
        sp = tuple(self.axes[d] for d in range(len(self.sizes)))
        return P(*((None,) * lead + sp))

    def _put(self, a: np.ndarray, lead: int):
        blocked = to_blocked(np.asarray(a), self.sizes, lead)
        return jax.device_put(blocked, NamedSharding(self.mesh, self._specs(lead)))

    def _put_state(self, state: fl.FlowState) -> fl.FlowState:
        return fl.FlowState(
            u=self._put(state.u, 1), u0=self._put(state.u0, 1),
            p=self._put(state.p, 0), V=self._put(state.V, 1),
            mu0=self._put(state.mu0, 1), mu1=self._put(state.mu1, 2),
            nu=state.nu)

    def _level_specs(self):
        """out_specs for the level stack: distributed prefix sharded,
        replicated tail; the coarsest carries the dense-solve pinv leaf."""
        out = []
        for l in range(self.n_levels):
            if l < self.n_dist:
                out.append(mg.PoissonLevel(self._specs(1), self._specs(0),
                                           self._specs(0)))
            elif l == self.n_levels - 1 and self._coarse_dense:
                out.append(mg.PoissonLevel(P(), P(), P(), P()))
            else:
                out.append(mg.PoissonLevel(P(), P(), P()))
        return tuple(out)

    @property
    def n_levels(self):
        return len(self.masks) + 1

    def _fn_key(self, *extra):
        """Cache key capturing everything the jitted closures close over:
        static config, decomposition, the MG stack depth (`masks`/`n_dist`
        depend on `min_coarse_cells`, which is not part of FlowCfg), and the
        mesh CONTENT (two Mesh objects over the same devices compile
        identically)."""
        return (self.cfg, self.sizes, self.axes, self.masks, self.n_dist,
                self.psolver, tuple(self.mesh.devices.flatten().tolist()),
                tuple(self.mesh.axis_names)) + extra

    # ------------------------------------------------------------ jitted steps
    def _build_levels(self):
        cfg, masks, n_dist = self.cfg, self.masks, self.n_dist
        axes, sizes = self.axes, self.sizes

        def mk():
            @partial(shard_map, mesh=self.mesh, in_specs=self._specs(1),
                     out_specs=self._level_specs(), check_vma=False)
            def build(mu0_local):
                ctx = make_ctx(axes, sizes, mu0_local.shape[1:])
                return mg.make_mg_dist(mu0_local, ctx, masks, n_dist,
                                       cfg.perdir)

            return jax.jit(build)

        return _cached_fn(self._fn_key("build"), mk)(self.state.mu0)

    def _state_specs(self):
        return fl.FlowState(
            u=self._specs(1), u0=self._specs(1), p=self._specs(0),
            V=self._specs(1), mu0=self._specs(1), mu1=self._specs(2), nu=P())

    def _step_fn(self, udf):
        cfg, masks, n_dist = self.cfg, self.masks, self.n_dist
        axes, sizes = self.axes, self.sizes
        pcg = self.psolver == "pcg"
        state_specs = self._state_specs()
        stats_spec = (state_specs, P(), P(), P())

        def mk():
            @partial(jax.jit, static_argnames=())
            @partial(shard_map, mesh=self.mesh,
                     in_specs=(state_specs, self._level_specs(), P(), P()),
                     out_specs=stats_spec, check_vma=False)
            def step(state, levels, dt, t0):
                ctx = make_ctx(axes, sizes, state.p.shape)
                solve_fn = None
                if pcg:
                    # distributed PCG injection (`pois_ctor`,
                    # `src/WaterLily.jl:96-97`): `ops.poisson.solve` runs
                    # per-shard with halo-synced mult and psum'd dot
                    # products/norms — the ctx closes over the shard_map body
                    from ..ops import poisson as ps

                    def solve_fn(levels, _masks, x, z, tol, itmx, perdir):
                        x, r, n, stats = ps.solve(levels[0], x, z, tol=tol,
                                                  itmx=itmx, perdir=perdir,
                                                  ctx=ctx)
                        pad = jnp.zeros(stats.shape[:1] + (1,), stats.dtype)
                        return mg.MGSolveResult(
                            x, r, n, jnp.concatenate([stats, pad], axis=1))
                return fl.mom_step_impl(cfg, state, levels, masks, dt, t0,
                                        udf, solve_fn, ctx, n_dist)

            return (udf, step)

        return _cached_fn(self._fn_key("step3d", id(udf)), mk)[1]

    # -------------------------------------------------- flat (x, y·z) mode
    def _flat_setup(self):
        """Per-shard flat-layout engine for x-only decomposition: every local
        block runs `models.flowflat` (Pallas kernels on TPU) with ring halo
        exchange on x slabs; the multigrid coarse-grid gather reuses the 3D
        machinery (`ops.mgflat._v_cycle_flat` distributed mode)."""
        from ..ops import flat as fo
        from ..ops import mgflat

        cfg = self.cfg
        k = self.sizes[0]
        nxl = (cfg.shape[0] - 2) // k
        self._gl = fo.geom_of((nxl + 2,) + cfg.shape[1:])
        gl = self._gl
        # flat-level depth (static): mirrors `mgflat._flatten_stack`
        nf = max(1, min(mgflat._n_flat(gl, tuple(self.masks)), self.n_dist))
        self._nf = nf

        def fspec(lead):
            return P(*((None,) * lead + (self.axes[0], None, None)))

        self._fspec = fspec
        lvl_specs = []
        for l in range(self.n_levels):
            if l < nf:      # flat, distributed
                lvl_specs.append(mg.PoissonLevel(fspec(1), fspec(0), fspec(0)))
            elif l < self.n_dist:   # 3D, still distributed
                lvl_specs.append(mg.PoissonLevel(self._specs(1),
                                                 self._specs(0),
                                                 self._specs(0)))
            elif l == self.n_levels - 1 and self._coarse_dense:
                lvl_specs.append(mg.PoissonLevel(P(), P(), P(), P()))
            else:           # 3D, replicated
                lvl_specs.append(mg.PoissonLevel(P(), P(), P()))
        self._fmg_specs = mgflat.FlatMG(lvl_specs[0], tuple(lvl_specs[1:nf]),
                                        tuple(lvl_specs[nf:]))
        self._fstate_specs = fl.FlowState(
            u=fspec(1), u0=fspec(1), p=fspec(0), V=fspec(1), mu0=fspec(1),
            mu1=fspec(2), nu=P())

        def mk_layout_fns():
            @jax.jit
            @partial(shard_map, mesh=self.mesh,
                     in_specs=(self._state_specs(),),
                     out_specs=self._fstate_specs, check_vma=False)
            def to_flat_state(state):
                c = lambda a: fo.to_flat(a, gl)
                return fl.FlowState(u=c(state.u), u0=c(state.u0),
                                    p=c(state.p), V=c(state.V),
                                    mu0=c(state.mu0), mu1=c(state.mu1),
                                    nu=state.nu)

            @jax.jit
            @partial(shard_map, mesh=self.mesh, in_specs=(self._fstate_specs,),
                     out_specs=(self._specs(1), self._specs(1),
                                self._specs(0)), check_vma=False)
            def to_3d_up(state):
                return (fo.from_flat(state.u, gl), fo.from_flat(state.u0, gl),
                        fo.from_flat(state.p, gl))

            @jax.jit
            @partial(shard_map, mesh=self.mesh,
                     in_specs=(self._specs(1), self._specs(1), self._specs(2)),
                     out_specs=(fspec(1), fspec(1), fspec(2)), check_vma=False)
            def coeffs_to_flat(V, mu0, mu1):
                return (fo.to_flat(V, gl), fo.to_flat(mu0, gl),
                        fo.to_flat(mu1, gl))

            @jax.jit
            @partial(shard_map, mesh=self.mesh,
                     in_specs=(self._level_specs(),),
                     out_specs=self._fmg_specs, check_vma=False)
            def flatten_levels(levels):
                return mgflat._flatten_stack(levels, gl, tuple(self.masks),
                                             self.n_dist)

            return to_flat_state, to_3d_up, coeffs_to_flat, flatten_levels

        (self._to_flat_state, self._to_3d_up, self._coeffs_to_flat,
         self._flatten_levels) = _cached_fn(self._fn_key("flat_layout"),
                                            mk_layout_fns)
        self._fstate = self._to_flat_state(self.state)
        self._fmg = self._flatten_levels(self.levels)

    def _flat_step_fn(self, udf):
        from ..models import flowflat as ffm
        from ..ops.dist import DistCtx

        cfg, masks, n_dist = self.cfg, self.masks, self.n_dist
        axes, sizes = self.axes, self.sizes
        gl = self._gl
        nxl = gl.Nx - 2
        stats_spec = (self._fstate_specs, P(), P(), P())

        def mk():
            @jax.jit
            @partial(shard_map, mesh=self.mesh,
                     in_specs=(self._fstate_specs, self._fmg_specs, P(), P()),
                     out_specs=stats_spec, check_vma=False)
            def step(state, fmg, dt, t0):
                fctx = DistCtx((axes[0],), (sizes[0],), (nxl,),
                               (jax.lax.axis_index(axes[0]),))
                ctx3 = make_ctx(axes, sizes, (nxl + 2,) + cfg.shape[1:])
                return ffm.mom_step_flat_impl(cfg, state, fmg, masks, gl, dt,
                                              t0, udf, fctx, ctx3, n_dist)

            return (udf, step)

        return _cached_fn(self._fn_key("stepflat", id(udf)), mk)[1]

    def _measure_fn(self):
        cfg, masks, n_dist = self.cfg, self.masks, self.n_dist
        axes, sizes = self.axes, self.sizes
        eps_k = float(self.sim.eps)
        out_specs = (self._specs(1), self._specs(1), self._specs(2),
                     self._level_specs())

        def mk():
            @jax.jit
            @partial(shard_map, mesh=self.mesh, in_specs=(P(), P()),
                     out_specs=out_specs, check_vma=False)
            def measure(body, t):
                local_shape = tuple((cfg.shape[d] - 2) // sizes[d] + 2
                                    for d in range(cfg.D))
                ctx = make_ctx(axes, sizes, local_shape)
                V, mu0, mu1, _ = measure_fill(body, local_shape, t, eps_k,
                                              cfg.dtype, cfg.perdir,
                                              cfg.exit_bc, ctx)
                levels = mg.make_mg_dist(mu0, ctx, masks, n_dist, cfg.perdir)
                return V, mu0, mu1, levels

            return measure

        return _cached_fn(self._fn_key("measure", eps_k), mk)

    # ------------------------------------------------------------ driver
    @property
    def flow(self):
        return self.sim.flow

    @property
    def time(self) -> float:
        return self.sim.flow.time

    @property
    def sim_time(self) -> float:
        return self.time * self.sim.U / self.sim.L

    @property
    def pois_n(self):
        return self.sim.flow.pois_n

    # drop-in accessors so shared helpers (viz / metrics / io) treat a
    # DistSimulation exactly like a Simulation
    @property
    def U(self):
        return self.sim.U

    @property
    def L(self):
        return self.sim.L

    @property
    def eps(self):
        return self.sim.eps

    @property
    def body(self):
        return self.sim.body

    def sdf_field(self, t: Optional[float] = None):
        """Dense-layout signed distance of the body (delegates to the wrapped
        sim — geometry is replicated, no gather needed)."""
        return self.sim.sdf_field(t if t is not None else self.time)

    @property
    def state(self) -> fl.FlowState:
        """Blocked, sharded 3D state.  In flat mode the stepped fields live
        in `_fstate`; the 3D mirror refreshes lazily on first read after a
        step (one layout pass), so readers never see stale fields."""
        if self._flat_mode and self._fstale:
            u3, u03, p3 = self._to_3d_up(self._fstate)
            self._state = dataclasses.replace(self._state, u=u3, u0=u03, p=p3)
            self._fstale = False
        return self._state

    @state.setter
    def state(self, v):
        self._state = v

    @property
    def u(self) -> np.ndarray:
        """Velocity in the dense single-device layout."""
        return from_blocked(self.state.u, self.sizes, lead=1)

    @property
    def p(self) -> np.ndarray:
        return from_blocked(self.state.p, self.sizes, lead=0)

    def restore_fields(self, u, p):
        """Load dense single-device-layout ``u``/``p`` (e.g. from a
        checkpoint) into the live sharded state — and refresh the flat-engine
        mirror, which is the state actually stepped in flat mode (the
        checkpoint-restore half of `WaterLilyJLD2Ext.jl:30-41`)."""
        st = dataclasses.replace(
            self._state, u=self._put(np.asarray(u), 1),
            u0=self._put(np.asarray(u), 1), p=self._put(np.asarray(p), 0))
        self._state = st
        self._fstale = False
        if self._flat_mode:
            self._fstate = self._to_flat_state(st)

    def measure(self, t: Optional[float] = None):
        """Re-measure the body on every shard and re-restrict the multigrid
        coefficients (`measure!` + `update!`, `WaterLily.jl:146-149`) —
        each shard evaluates the sdf only on its own block."""
        if isinstance(self.sim.body, NoBody):
            return
        if t is None:
            t = self.time + self.sim.flow.dt[-1]
        if not hasattr(self, "_measure"):
            self._measure = self._measure_fn()
        V, mu0, mu1, levels = self._measure(self.sim.body,
                                            jnp.asarray(t, self.cfg.dtype))
        self._state = dataclasses.replace(self._state, V=V, mu0=mu0, mu1=mu1)
        self.levels = levels
        if self._flat_mode:
            Vf, mu0f, mu1f = self._coeffs_to_flat(V, mu0, mu1)
            self._fstate = dataclasses.replace(self._fstate, V=Vf,
                                               mu0=mu0f, mu1=mu1f)
            self._fmg = self._flatten_levels(levels)

    def step_once(self, remeasure: bool = True, udf=None):
        """One CFL-limited time step of the decomposed flow (the distributed
        `mom_step!`); appends dt / solver iterations to the host history like
        the single-device `Simulation.sim_step`."""
        if remeasure:
            self.measure()
        # `_step_fn`/`_flat_step_fn` resolve through the global `_FN_CACHE`
        # (strong udf references — a GC'd udf's recycled id can never alias
        # a stale compiled step)
        step = (self._flat_step_fn(udf) if self._flat_mode
                else self._step_fn(udf))
        dt = jnp.asarray(self.sim.flow.dt[-1], self.cfg.dtype)
        t0 = jnp.asarray(self.time, self.cfg.dtype)
        if self._flat_mode:
            self._fstate, dt_next, iters, stats = step(self._fstate,
                                                       self._fmg, dt, t0)
            self._fstale = True
        else:
            self.state, dt_next, iters, stats = step(self.state, self.levels,
                                                     dt, t0)
        self.sim.flow.dt.append(float(dt_next))
        import numpy as np

        self.sim.flow.pois_n += np.asarray(iters).tolist()  # one host transfer
        self.solver_stats = stats
        return self

    # ------------------------------------------------------------ metrics
    def _force_fn(self):
        from ..ops import flat as fo
        from ..ops.dist import offsets
        from ..utils import metrics as mt

        cfg = self.cfg
        axes, sizes = self.axes, self.sizes
        flat = self._flat_mode
        gl = self._gl if flat else None
        in_specs = ((self._fstate_specs if flat else self._state_specs()),
                    P(), P(), P())

        def mk():
            @jax.jit
            @partial(shard_map, mesh=self.mesh, in_specs=in_specs,
                     out_specs=(P(), P()), check_vma=False)
            def force(state, body, t, x0):
                if flat:
                    u, p = fo.from_flat(state.u, gl), fo.from_flat(state.p, gl)
                else:
                    u, p = state.u, state.p
                local_shape = p.shape
                ctx = make_ctx(axes, sizes, local_shape)
                off = offsets(ctx, local_shape)
                f = (mt.pressure_force(p, body, t, off, ctx)
                     + mt.viscous_force(u, state.nu, body, t, off, ctx))
                m = (mt.pressure_moment(x0, p, body, t, off, ctx)
                     + mt.viscous_moment(x0, u, state.nu, body, t, off, ctx))
                return f, m

            return force

        return _cached_fn(self._fn_key("force", flat), mk)

    def _force_moment(self, x0=None):
        if not hasattr(self, "_force"):
            self._force = self._force_fn()
        t = jnp.asarray(self.time, self.cfg.dtype)
        if x0 is None:
            x0 = (0.0,) * self.cfg.D
        st = self._fstate if self._flat_mode else self.state
        return self._force(st, self.sim.body, t,
                           jnp.asarray(x0, self.cfg.dtype))

    def total_force(self):
        """∮(p n − 2ν S·n) dS without gathering the fields: per-shard BDIM
        surface integrals with global coordinates, psum-reduced
        (`total_force`, `Metrics.jl:160`)."""
        return self._force_moment()[0]

    def total_moment(self, x0):
        """Pressure + viscous moment about ``x0``, per-shard + psum
        (`total_moment`, `Metrics.jl:195-197`)."""
        return self._force_moment(x0)[1]

    def sim_step_n(self, n: int, *, udf=None):
        """``n`` CFL steps of the decomposed flow in ONE device program
        (`lax.scan` around the shard_map step) — see
        `Simulation.sim_step_n`; static bodies only."""
        def mk():
            inner = (self._flat_step_fn(udf) if self._flat_mode
                     else self._step_fn(udf))

            @jax.jit
            def run(state, solver, dt, t0):
                def one(carry, _):
                    state, dt, t0 = carry
                    state, dt_n, iters, stats = inner(state, solver, dt, t0)
                    return (state, dt_n, t0 + dt), (dt_n, iters, stats)

                return jax.lax.scan(one, (state, dt, t0), None, length=n)

            return (udf, run)   # strong udf ref: its id can't recycle

        run = _cached_fn(self._fn_key("scan", n, self._flat_mode,
                                      id(udf)), mk)[1]
        dt = jnp.asarray(self.sim.flow.dt[-1], self.cfg.dtype)
        t0 = jnp.asarray(self.time, self.cfg.dtype)
        if self._flat_mode:
            (self._fstate, _, _), ys = run(self._fstate, self._fmg, dt, t0)
            self._fstale = True
        else:
            (self.state, _, _), ys = run(self.state, self.levels, dt, t0)
        dts, iters, stats = ys
        self.sim.flow.dt.extend(float(v) for v in dts)
        self.sim.flow.pois_n.extend(int(v) for v in iters.reshape(-1))
        self.solver_stats = stats[-1]
        return self

    def sim_step(self, t_end: Optional[float] = None, *, remeasure: bool = True,
                 max_steps: int = 10**9, verbose: bool = False, udf=None):
        """Advance to ``t_end`` in convective units (`sim_step!`,
        `WaterLily.jl:128-139`), or one step when ``t_end`` is None."""
        if t_end is None:
            return self.step_once(remeasure, udf)
        steps = 0
        while self.sim_time < t_end and steps < max_steps:
            self.step_once(remeasure, udf)
            steps += 1
            if verbose:
                print(f"tU/L={self.sim_time:.4f}, dt={self.sim.flow.dt[-1]:.3f}")
        return self
