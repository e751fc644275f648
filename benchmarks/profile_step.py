"""jax.profiler trace harness for one momentum step — aux subsystem 5.1.

The reference's performance hygiene is the `@log` solver channel plus an
allocation benchmark (`/root/reference/src/core.jl:4-24`,
`test/test_alloc.jl`); on TPU the equivalent visibility comes from an XLA
trace: per-fusion/per-kernel device times, HBM traffic, and the host gaps
between dispatches.  This writes a TensorBoard-loadable trace plus a plain
text summary of device memory.

Usage:  python benchmarks/profile_step.py [N] [steps] [outdir]
        tensorboard --logdir <outdir>   (or xprof)

On backends where the profiler service is unavailable (some tunneled
setups), the trace directory simply stays empty — the wall-clock phase
table is still printed.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from waterlily_tpu.utils.cache import setup_compile_cache  # noqa: E402

setup_compile_cache()


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    outdir = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/wltpu_trace_{N}"

    from waterlily_tpu import AutoBody, Simulation
    from waterlily_tpu.models import flow as fl
    from waterlily_tpu.models import flowflat as ff

    radius = N // 8
    ctr = jnp.asarray([N / 3, N / 2, N / 2], jnp.float32)
    body = AutoBody(lambda x, t: jnp.sqrt(jnp.sum((x - ctr) ** 2)) - radius)
    sim = Simulation((N, N, N), (1.0, 0.0, 0.0), radius, nu=radius / 1e3,
                     body=body, dtype=jnp.float32)
    cfg = sim.flow.cfg
    probe = jax.jit(lambda st: st.u.reshape(-1)[0])

    if sim._flat is not None:
        g, solver, state = (sim._flat["g"], sim._flat["fmg"],
                            sim._flat["state"])

        def step(state, solver, dt, t0):
            st, dt_n, *_ = ff.mom_step_flat_impl(cfg, state, solver,
                                                 sim.masks, g, dt, t0)
            return st, dt_n
    else:
        solver, state = sim.levels, sim.flow.state

        def step(state, solver, dt, t0):
            st, dt_n, *_ = fl.mom_step_impl(cfg, state, solver, sim.masks,
                                            dt, t0)
            return st, dt_n

    step = jax.jit(step)
    dt = jnp.asarray(sim.flow.dt[-1], cfg.dtype)
    t0 = jnp.asarray(0.0, cfg.dtype)
    for _ in range(2):      # compile + settle dt
        state, dt_n = step(state, solver, dt, t0)
        t0, dt = t0 + dt, dt_n
    float(probe(state))

    os.makedirs(outdir, exist_ok=True)
    try:
        jax.profiler.start_trace(outdir)
        traced = True
    except Exception as e:  # pragma: no cover - backend-dependent
        print(f"# profiler unavailable ({e}); timing only", file=sys.stderr)
        traced = False

    t_wall = time.perf_counter()
    for _ in range(steps):
        state, dt_n = step(state, solver, dt, t0)
        t0, dt = t0 + dt, dt_n
    float(probe(state))
    t_wall = time.perf_counter() - t_wall

    if traced:
        jax.profiler.stop_trace()
        print(f"trace written to {outdir}")
    try:
        prof = jax.profiler.device_memory_profile()
        print(f"device memory profile: {len(prof)} bytes (pprof format)")
        with open(os.path.join(outdir, "memory.pprof"), "wb") as f:
            f.write(prof)
    except Exception:  # pragma: no cover
        pass

    rate = N ** 3 * steps / t_wall
    print(f"{N}^3 x {steps} steps: {t_wall / steps * 1e3:.2f} ms/step, "
          f"{rate / 1e6:.1f} Mcell/s")


if __name__ == "__main__":
    main()
