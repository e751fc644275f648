"""Experiment: does linear warm-start extrapolation of p cut MG iterations?

The predictor pressure solve warm-starts from the previous step's converged
pressure (x0 = p·dt).  Since p evolves smoothly in time, the extrapolated
guess x0 = (2·p − p_prev)·dt should start closer and may save whole V-cycle
iterations (~14 ms each at 256³).  This script measures total fine-level
V-cycle iteration counts over a sphere run, with and without extrapolation,
on CPU (the iteration count is hardware-independent).

Usage: python benchmarks/warmstart_exp.py [N] [steps]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("WLTPU_PLATFORM", "cpu")

import dataclasses

import jax
import jax.numpy as jnp

from waterlily_tpu.utils.cache import setup_compile_cache  # noqa: E402

setup_compile_cache("cpu")


def run(N: int, steps: int, extrap: bool, alpha: float = 1.0):
    from waterlily_tpu import AutoBody, Simulation
    from waterlily_tpu.models import flowflat as ff

    radius = N // 8
    ctr = jnp.asarray([N / 3, N / 2, N / 2], jnp.float32)
    body = AutoBody(lambda x, t: jnp.sqrt(jnp.sum((x - ctr) ** 2)) - radius)
    sim = Simulation((N, N, N), (1.0, 0.0, 0.0), radius, nu=radius / 1e3,
                     body=body, dtype=jnp.float32, engine="flat")
    cfg = sim.flow.cfg
    g = sim._flat["g"]
    fmg = sim._flat["fmg"]
    state = sim._flat["state"]
    masks = sim.masks
    dt = jnp.asarray(sim.flow.dt[-1], jnp.float32)
    t0 = jnp.asarray(0.0, jnp.float32)

    step = jax.jit(lambda st, dt, t0: ff.mom_step_flat_impl(
        cfg, st, fmg, masks, g, dt, t0))

    p_prev = state.p
    iters = []
    for k in range(steps):
        if extrap and k >= 2:
            guess = state.p + alpha * (state.p - p_prev)
            st_in = dataclasses.replace(state, p=guess)
        else:
            st_in = state
        p_prev = state.p
        state, dt_n, it, _ = step(st_in, dt, t0)
        t0 = t0 + dt
        dt = dt_n
        iters.append([int(v) for v in it])
    tot = sum(sum(v) for v in iters)
    pred = sum(v[0] for v in iters)
    corr = sum(v[1] for v in iters)
    print(f"extrap={extrap} alpha={alpha}: total={tot} pred={pred} "
          f"corr={corr} per-step={[v for v in iters[-8:]]}")
    return tot


if __name__ == "__main__":
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    base = run(N, steps, False)
    ext = run(N, steps, True)
    run(N, steps, True, alpha=0.5)
    print(f"# saving: {base - ext} fine V-cycles over {steps} steps")
