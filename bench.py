"""Headline benchmark: 3D sphere flow stepping rate (cell-updates/s/chip).

BASELINE.json north star: >= 1e9 cell-updates/s per chip at 256^3 with
drag parity.  The reference's corresponding figure is 1.44 ns/DoF/step on a
CUDA GPU (`/root/reference/README.md:109`), i.e. ~0.7e9 DoF/s.

Runs the flat (x, y·z) layout engine (`models.flowflat` + `ops.pallas_flat`
kernels) on TPU; set WLTPU_ENGINE=3d for the generic path.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Env overrides: WLTPU_BENCH_N (cube size, default 256), WLTPU_BENCH_STEPS.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))


def main():
    N = int(os.environ.get("WLTPU_BENCH_N", "256"))
    steps = int(os.environ.get("WLTPU_BENCH_STEPS", "10"))
    engine = os.environ.get("WLTPU_ENGINE", "flat")
    from waterlily_tpu import AutoBody, Simulation
    from waterlily_tpu.models import flow as fl

    radius = N // 8
    ctr = jnp.asarray([N / 3, N / 2, N / 2], jnp.float32)
    body = AutoBody(lambda x, t: jnp.sqrt(jnp.sum((x - ctr) ** 2)) - radius)
    sim = Simulation((N, N, N), (1.0, 0.0, 0.0), radius, nu=radius / 1e3,
                     body=body, dtype=jnp.float32,
                     engine="auto" if engine == "flat" else "3d")
    cfg = sim.flow.cfg

    # NOTE: on the tunneled backend `block_until_ready` does not actually
    # block; a 4-byte scalar fetch does.  Timing is slope-based: the fixed
    # tunnel round trip is subtracted via a 0-step baseline.
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

    # warmup: compile + 2 steps (lets dt settle to the CFL limit).  The
    # remote compiler can OOM on the fully cond-unrolled MG solver — retry
    # with shallower unrolls (the solver rereads WLTPU_MG_UNROLL per trace).
    step_jit = None
    for unroll in (os.environ.get("WLTPU_MG_UNROLL", "8"), "6", "4", "2", "0"):
        os.environ["WLTPU_MG_UNROLL"] = unroll
        try:
            step_jit = jax.jit(step)
            s2, d2, t2 = state, dt, t0
            for _ in range(2):
                s2, dt_n, _ = step_jit(s2, solver, d2, t2)
                t2 = t2 + d2
                d2 = dt_n
            float(probe(s2))
            state, dt, t0 = s2, d2, t2
            break
        except Exception as e:
            print(f"# unroll={unroll} failed: {str(e)[:120]}", file=sys.stderr)
            step_jit = None
    if step_jit is None:
        raise RuntimeError("all unroll levels failed to compile")
    step = step_jit

    t_base = time.perf_counter()
    float(probe(state))
    t_base = time.perf_counter() - t_base

    t_start = time.perf_counter()
    for _ in range(steps):
        state, dt_n, _ = step(state, solver, dt, t0)
        t0 = t0 + dt
        dt = dt_n
    float(probe(state))
    elapsed = max(1e-9, time.perf_counter() - t_start - t_base)

    cells = N ** 3
    rate = cells * steps / elapsed
    print(json.dumps({
        "metric": f"3D sphere {N}^3 cell-updates/s/chip",
        "value": rate,
        "unit": "cell-updates/s",
        "vs_baseline": rate / 1e9,
    }))


if __name__ == "__main__":
    main()
