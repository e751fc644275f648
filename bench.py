"""Headline benchmark: 3D sphere flow stepping rate (cell-updates/s/chip).

BASELINE.json north star: >= 1e9 cell-updates/s per chip at 256^3 with
drag parity.  The reference's corresponding figure is 1.44 ns/DoF/step on a
CUDA GPU (`/root/reference/README.md:109`), i.e. ~0.7e9 DoF/s.

Runs the flat (x, y.z) layout engine (`models.flowflat` + `ops.pallas_flat`
kernels) on TPU; set WLTPU_ENGINE=3d for the generic path.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
``vs_baseline`` divides by the 1 Gcell/s target, which BASELINE defines AT
256^3 — when a fallback rung reports, ``baseline_note`` flags the size
mismatch explicitly.

Robustness contract (the driver runs this under an unknown `timeout`; the
round-4 run landed 0.0 because every rung compiled cold and the ladder ran
target-first):
- ONE process for everything: the tunneled backend charges ~155 s of session
  init to EVERY process, so subprocess-per-rung starves small rungs;
- the ladder climbs UPWARD (64^3 -> 128^3 -> 256^3 -> moving): the cheapest
  rung banks a nonzero number even with a fully cold compile cache, each
  completed rung replaces the banked result, and a rung that blows the
  budget costs nothing but the remaining time;
- a watchdog thread prints the best result measured so far and exits at
  WLTPU_BENCH_BUDGET_S seconds (default 510) — in-process jax compiles are
  uninterruptible, so the watchdog exits the process rather than the rung;
- the persistent compile cache (`utils/cache.py`) makes warm reruns fast,
  and `strip_mosaic_locations` keeps it warm across pure code motion;
  `benchmarks/warm_cache.py 256 128 64` after the last traced-code commit of
  a session guarantees the driver's run is warm.

Env overrides: WLTPU_BENCH_N (single cube size — disables the ladder),
WLTPU_BENCH_MOVING_N (single moving rung), WLTPU_BENCH_STEPS,
WLTPU_BENCH_BUDGET_S, WLTPU_BENCH_LADDER (sizes, run in the given order),
WLTPU_BENCH_MOVING (moving-rung size, 0 disables), WLTPU_ENGINE.
"""
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_TARGET_N = 256          # the rung BASELINE defines the target at

_BEST = None           # best (= largest-N) completed measurement
_LOCK = threading.Lock()
_DONE = threading.Event()

# Peak HBM bandwidth by jax device_kind, for the achieved-bandwidth estimate
# (GB/s; v5e=819, v5p=2765, v4=1228, v6e=1640).  The ns/DoF target assumes a
# v5p-class chip; recording the kind + fraction makes the normalization
# checkable from the artifact instead of asserted in prose.
_PEAK_BW = {"TPU v5 lite": 819e9, "TPU v5e": 819e9, "TPU v5": 2765e9,
            "TPU v5p": 2765e9, "TPU v4": 1228e9, "TPU v6 lite": 1640e9,
            "TPU v6e": 1640e9}
# Ideal HBM bytes per cell per step for the settled bench config (iters
# [1,1]): sum of the per-kernel traffic models of `benchmarks/roofline.py`
# at 256^3 (~8.8 GB/step / 256^3 cells).  Observability estimate only.
_BYTES_PER_CELL_STEP = 524.0


def _device_meta():
    try:
        import jax
        kind = jax.devices()[0].device_kind
    except Exception:
        return {}
    meta = {"device_kind": kind}
    if kind in _PEAK_BW:
        meta["peak_hbm_gbps"] = _PEAK_BW[kind] / 1e9
    return meta


def _result(N, meas, steps):
    rate = meas["rate"]
    res = {
        "metric": f"3D sphere {N}^3 cell-updates/s/chip",
        "value": rate,
        "unit": "cell-updates/s",
        "vs_baseline": rate / 1e9,
        "ms_per_step": N ** 3 / rate * 1e3,
        "ns_per_dof": 1e9 / rate,      # reference anchor: 1.44 (README:109)
        "steps_timed": steps,
        "reps": meas["reps"],          # median of `reps` timed scans
        "spread": meas["spread"],      # (max-min)/median across the reps
    }
    res.update(_device_meta())
    if "peak_hbm_gbps" in res:
        # achieved fraction of HBM streaming peak under the ideal-traffic
        # model — the chip-normalization context for cross-device reading
        res["hbm_frac_est"] = round(
            rate * _BYTES_PER_CELL_STEP / (res["peak_hbm_gbps"] * 1e9), 4)
    if N != _TARGET_N:
        res["baseline_note"] = (f"target is defined at {_TARGET_N}^3; this "
                                f"is a {N}^3 fallback rung")
    return res


def _emit_and_exit(rc=0):
    with _LOCK:
        res = _BEST or {
            "metric": "3D sphere cell-updates/s/chip",
            "value": 0.0, "unit": "cell-updates/s", "vs_baseline": 0.0,
            "note": "no measurement completed within the time budget",
        }
        print(json.dumps(res), flush=True)
    os._exit(rc)


def _watchdog(budget_s: float):
    if not _DONE.wait(timeout=budget_s):
        print(f"# watchdog: budget {budget_s}s reached, emitting best-so-far",
              file=sys.stderr, flush=True)
        _emit_and_exit(0)


def _measure(N: int, steps: int, engine: str):
    """Build the sim, compile one scan of `steps` steps, time it (slope-based
    against the tunnel round trip).  Returns cell-updates/s."""
    import math

    import jax
    import jax.numpy as jnp

    from waterlily_tpu.utils.cache import setup_compile_cache

    setup_compile_cache()
    from waterlily_tpu import AutoBody, Simulation
    from waterlily_tpu.models import flow as fl

    radius = N // 8
    ctr = jnp.asarray([N / 3, N / 2, N / 2], jnp.float32)
    body = AutoBody(lambda x, t: jnp.sqrt(jnp.sum((x - ctr) ** 2)) - radius)
    # NO tuning kwargs: `Simulation` auto-selects the benched TPU perf
    # config (smooth_it=2 + mp_smooth + dense coarse solve) when none are
    # given — what the bench measures is now exactly what a default TPU
    # user gets.  WLTPU_BENCH_* env overrides remain for experiments.
    tune = {}
    if "WLTPU_BENCH_SMOOTH_IT" in os.environ:
        tune["smooth_it"] = int(os.environ["WLTPU_BENCH_SMOOTH_IT"])
    if "WLTPU_BENCH_MP" in os.environ:
        tune["mp_smooth"] = os.environ["WLTPU_BENCH_MP"] == "1"
    if "WLTPU_BENCH_MIN_COARSE" in os.environ:
        tune["min_coarse_cells"] = int(os.environ["WLTPU_BENCH_MIN_COARSE"])
    sim = Simulation((N, N, N), (1.0, 0.0, 0.0), radius, nu=radius / 1e3,
                     body=body, dtype=jnp.float32,
                     engine="auto" if engine == "flat" else "3d", **tune)
    cfg = sim.flow.cfg

    # NOTE: on the tunneled backend `block_until_ready` does not actually
    # block; a 4-byte scalar fetch does.
    probe = jax.jit(lambda st: st.u.reshape(-1)[0])

    dt = jnp.asarray(sim.flow.dt[-1], cfg.dtype)
    t0 = jnp.asarray(0.0, cfg.dtype)
    # NOTE: the solver stacks (fmg/levels) MUST be jit *arguments*, not
    # closure captures — captured arrays are baked into the HLO as dense
    # constants (hundreds of MB at 256^3), which breaks remote compilation.
    if sim._flat is not None:
        from waterlily_tpu.models import flowflat as ff

        g = sim._flat["g"]
        solver = sim._flat["fmg"]
        state = sim._flat["state"]

        def step(state, solver, dt, t0):
            st, dt_n, it, _ = ff.mom_step_flat_impl(cfg, state, solver,
                                                    sim.masks, g, dt, t0)
            return st, dt_n, it
    else:
        solver, masks = sim.levels, sim.masks
        state = sim.flow.state

        def step(state, solver, dt, t0):
            st, dt_n, it, _ = fl.mom_step_impl(cfg, state, solver, masks,
                                               dt, t0)
            return st, dt_n, it

    scan_mode = os.environ.get("WLTPU_BENCH_SCAN", "1") == "1"
    if scan_mode:
        # scan mode: the whole measurement is ONE lax.scan program (the
        # `sim_step_n` driver shape) — per-step dispatch round trips vanish
        # and the warmup run doubles as the compile
        @jax.jit
        def run(state, solver, dt, t0):
            def one(carry, _):
                state, dt, t0 = carry
                state, dt_n, it = step(state, solver, dt, t0)
                return (state, dt_n, t0 + dt), (dt_n, it)

            return jax.lax.scan(one, (state, dt, t0), None, length=steps)

        try:
            (state, dt, t0), (dts, iters) = run(state, solver, dt, t0)  # warmup
        except Exception as e:   # scan form failed to compile/run —
            print(f"# scan mode failed ({str(e)[:120]}); falling back to "
                  "dispatch-per-step", file=sys.stderr, flush=True)
            return _measure_dispatch(N, steps, step, state, solver, dt, t0,
                                     probe)
        p0 = float(probe(state))
        if not math.isfinite(p0) or not math.isfinite(float(dt)):
            raise RuntimeError(f"{N}^3 simulation diverged during warmup "
                               f"(probe={p0}, dt={float(dt)})")
        t_base = time.perf_counter()
        float(probe(state))
        t_base = time.perf_counter() - t_base

        # median-of-3: the tunneled backend shows ~±10% run-to-run variance
        # on a single scan; three timed scans (<2 s overhead at 256^3) make
        # round-over-round deltas attributable (round-3 verdict item 7).
        # Every rep re-runs the SAME scan from the SAME settled entry state
        # — advancing the flow between reps would time progressively harder
        # solves (a developed wake costs an extra MG iteration), turning the
        # spread into state drift instead of timing noise.
        reps = int(os.environ.get("WLTPU_BENCH_REPS", "3"))
        state0, dt0, t00 = state, dt, t0
        rates = []
        prev = jnp.zeros((), dt0.dtype)
        for k in range(reps):
            # per-rep BITWISE-distinct inputs (1e-6-relative dt nudge; same
            # iteration counts) + a data-dependency chain through the prior
            # rep's output: with identical inputs the tunneled runtime was
            # observed to short-circuit re-execution (128^3 "ran" 10 steps
            # in 5 ms on reps 2-3), which faked a 79% spread
            dt_k = dt0 * (1.0 + k * 1e-6) + 0.0 * prev
            t_start = time.perf_counter()
            (state, dt, t0), (dts, iters) = run(state0, solver, dt_k, t00)
            pend = float(probe(state))
            elapsed = max(1e-9, time.perf_counter() - t_start - t_base)
            if not math.isfinite(pend) or not math.isfinite(float(dt)):
                raise RuntimeError(f"{N}^3 simulation diverged during "
                                   "measurement")
            prev = dt
            rates.append(N ** 3 * steps / elapsed)
        it = [int(v) for v in iters[-1]]
        rates.sort()
        med = rates[len(rates) // 2]
        spread = (rates[-1] - rates[0]) / med if med else 0.0
        if spread > 0.3:
            # a rep short-circuited anyway: the SLOWEST rep is the only one
            # guaranteed to contain the full execution
            med = rates[0]
        print(f"# {N}^3 final dt={float(dt):.3f} pois_iters={it} (scan mode, "
              f"{reps} reps, spread {100 * spread:.1f}%)",
              file=sys.stderr, flush=True)
        return {"rate": med, "spread": spread, "reps": reps}

    return _measure_dispatch(N, steps, step, state, solver, dt, t0, probe)


def _measure_dispatch(N, steps, step, state, solver, dt, t0, probe):
    """Dispatch-per-step measurement (WLTPU_BENCH_SCAN=0, or the scan-mode
    fallback)."""
    import math

    import jax

    # warmup: compile + 2 steps (lets dt settle to the CFL limit)
    step = jax.jit(step)
    iters = None
    for _ in range(2):
        state, dt_n, iters = step(state, solver, dt, t0)
        t0 = t0 + dt
        dt = dt_n
    p0 = float(probe(state))
    # a benchmark of a diverging simulation is meaningless — fail loudly
    # (round 1 silently timed NaN fields at 32 MG iterations per solve)
    if not math.isfinite(p0) or not math.isfinite(float(dt)):
        raise RuntimeError(f"{N}^3 simulation diverged during warmup "
                           f"(probe={p0}, dt={float(dt)})")

    t_base = time.perf_counter()
    float(probe(state))
    t_base = time.perf_counter() - t_base

    t_start = time.perf_counter()
    for _ in range(steps):
        state, dt_n, iters = step(state, solver, dt, t0)
        t0 = t0 + dt
        dt = dt_n
    pend = float(probe(state))
    elapsed = max(1e-9, time.perf_counter() - t_start - t_base)
    if not math.isfinite(pend) or not math.isfinite(float(dt)):
        raise RuntimeError(f"{N}^3 simulation diverged during measurement")
    it = [int(v) for v in iters] if iters is not None else []
    print(f"# {N}^3 final dt={float(dt):.3f} pois_iters={it}",
          file=sys.stderr, flush=True)
    return {"rate": N ** 3 * steps / elapsed, "spread": None, "reps": 1}


def _measure_moving(N: int, steps: int):
    """Moving-body rate (BASELINE config 2 family, flapping-foil analog): an
    oscillating sphere at N^3 with per-step re-measure riding the scan
    (`Simulation.sim_step_n(remeasure=True)` — banded measure + MG
    re-restriction + momentum step fused per iteration).  Oscillation keeps
    the band envelope stable, so after two settling calls the timed call
    re-traces nothing.  Returns cell-updates/s including the re-measure.

    The timed call is ONE 6·steps-long scan: each `sim_step_n` call carries
    a fixed host tail (device→host fetches + scan-exit sync, ~100 ms on the
    tunnel — the post-scan remeasure itself is now deferred/lazy) that
    production users amortize over long scans — measured in-scan iteration
    cost at 128³ is 8.3 ms (30-step vs 60-step scan solve), vs 11.75/10.02
    ms/step for 30/60-step calls."""
    import math

    import jax
    import jax.numpy as jnp

    from waterlily_tpu.utils.cache import setup_compile_cache

    setup_compile_cache()
    from waterlily_tpu import AutoBody, Simulation

    radius = N // 8
    ctr = jnp.asarray([N / 3, N / 2, N / 2], jnp.float32)
    amp, om = radius / 2.0, 1.0 / radius

    def sdf(x, t):
        return jnp.sqrt(jnp.sum((x - ctr) ** 2)) - radius

    def map_fn(x, t):
        return x - jnp.stack([amp * jnp.sin(om * t), 0 * t, 0 * t])

    sim = Simulation((N, N, N), (1.0, 0.0, 0.0), radius, nu=radius / 1e3,
                     body=AutoBody(sdf, map_fn), dtype=jnp.float32)
    probe = jax.jit(lambda st: st.u.reshape(-1)[0])
    steps = 6 * steps
    for _ in range(2):     # compile + band-envelope settling
        sim.sim_step_n(steps, remeasure=True)
    st = sim._flat["state"] if sim._flat is not None else sim.flow.state
    if not math.isfinite(float(probe(st))) or not math.isfinite(sim.flow.dt[-1]):
        raise RuntimeError(f"moving {N}^3 diverged during settling")
    band0 = sim.flow.cfg.band_x
    t_start = time.perf_counter()
    sim.sim_step_n(steps, remeasure=True)
    st = sim._flat["state"] if sim._flat is not None else sim.flow.state
    float(probe(st))
    elapsed = max(1e-9, time.perf_counter() - t_start)
    if not math.isfinite(float(probe(st))):
        raise RuntimeError(f"moving {N}^3 diverged during measurement")
    if sim.flow.cfg.band_x != band0:
        print(f"# moving {N}^3: band re-traced inside the timed call "
              f"({band0} -> {sim.flow.cfg.band_x}); rate includes a compile",
              file=sys.stderr, flush=True)
    print(f"# moving {N}^3 final dt={sim.flow.dt[-1]:.3f} band="
          f"{sim.flow.cfg.band_x} iters={sim.pois_n[-4:]}",
          file=sys.stderr, flush=True)
    return N ** 3 * steps / elapsed, steps


def _moving_result(N, rate, steps):
    res = {"metric": f"3D moving sphere {N}^3 (remeasure/step) "
                     "cell-updates/s/chip",
           "value": rate, "unit": "cell-updates/s",
           "ms_per_step": N ** 3 / rate * 1e3,
           "steps_timed": steps}
    res.update(_device_meta())
    return res


def main():
    budget = float(os.environ.get("WLTPU_BENCH_BUDGET_S", "510"))
    steps = int(os.environ.get("WLTPU_BENCH_STEPS", "10"))
    engine = os.environ.get("WLTPU_ENGINE", "flat")
    threading.Thread(target=_watchdog, args=(budget,), daemon=True).start()
    t_start = time.perf_counter()

    def left():
        return budget - (time.perf_counter() - t_start)

    global _BEST
    if "WLTPU_BENCH_MOVING_N" in os.environ:
        # single moving-rung mode (experiments)
        N = int(os.environ["WLTPU_BENCH_MOVING_N"])
        rate, n_timed = _measure_moving(N, steps)
        with _LOCK:
            _BEST = _moving_result(N, rate, n_timed)
        _DONE.set()
        _emit_and_exit(0)
    if "WLTPU_BENCH_N" in os.environ:
        # single-rung mode (experiments)
        N = int(os.environ["WLTPU_BENCH_N"])
        meas = _measure(N, steps, engine)
        with _LOCK:
            _BEST = _result(N, meas, steps)
        _DONE.set()
        _emit_and_exit(0)

    # ---- the ladder: climb upward, bank every completed rung ----
    sizes = [int(s) for s in
             os.environ.get("WLTPU_BENCH_LADDER", "64,128,256").split(",")]
    # minimum seconds of budget to even START a rung: a warm compile +
    # measure fits comfortably; a cold 256^3 cannot land in any realistic
    # leftover, but attempting it only costs time the watchdog reclaims.
    min_start = {64: 40, 128: 50, 256: 75}
    for N in sizes:
        if left() < min_start.get(N, 60):
            print(f"# skipping {N}^3: only {left():.0f}s left",
                  file=sys.stderr, flush=True)
            continue
        t_r = time.perf_counter()
        try:
            meas = _measure(N, steps, engine)
        except Exception as e:
            print(f"# {N}^3 rung failed: {type(e).__name__}: {str(e)[:160]}",
                  file=sys.stderr, flush=True)
            continue
        with _LOCK:
            _BEST = _result(N, meas, steps)
        print(f"# {N}^3: {meas['rate'] / 1e6:.1f} Mcell/s "
              f"(rung took {time.perf_counter() - t_r:.0f}s)",
              file=sys.stderr, flush=True)
    # ---- moving-body rung: rides as a sub-record, never the headline ----
    mn = int(os.environ.get("WLTPU_BENCH_MOVING", "128"))
    if _BEST is not None and mn > 0 and left() > 120:
        try:
            rate, n_timed = _measure_moving(mn, steps)
            with _LOCK:
                _BEST["moving"] = _moving_result(mn, rate, n_timed)
        except Exception as e:
            print(f"# moving rung failed: {type(e).__name__}: "
                  f"{str(e)[:160]}", file=sys.stderr, flush=True)
    elif mn > 0:
        print(f"# skipping moving rung: only {left():.0f}s left",
              file=sys.stderr, flush=True)
    _DONE.set()
    _emit_and_exit(0)


if __name__ == "__main__":
    main()
