"""2D circle stepping rate on TPU — the reference's flagship 2D config
(`examples/circle.py`, `/root/reference/README.md:131-135`: 2D circle,
50 tU/L in ~28 s on an 8-thread CPU at 13k DoF).

2D fields have no flat-layout engine: a (Nx, Ny+2) f32 array pads its lane
dim (258 -> 384 at radius 16), wasting ~33% of HBM bandwidth.  This harness
quantifies that path: ms/step and Mcell/s over a scanned block of steps,
plus projected wall-clock for the reference's 50 tU/L run.  VERDICT round 2:
add a 2D lane-packed layout only if this is >2x off its bandwidth bound.

Usage: python benchmarks/bench2d.py [radius] [steps]
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
    radius = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples"))
    from circle import make_sim

    sim = make_sim(radius=radius)
    cells = (24 * radius) * (16 * radius)
    print(f"# grid {sim.flow.cfg.shape} ({cells / 1e3:.0f}k cells), "
          f"backend={jax.default_backend()}")
    # warm with the SAME scan length as the timed block — a different length
    # is a different XLA program, and its compile would land inside the
    # timed region (first run of this harness measured exactly that)
    sim.sim_step_n(steps)      # compile + settle dt
    probe = float(jnp.asarray(sim.flow.dt[-1]))
    t0 = time.perf_counter()
    sim.sim_step_n(steps)
    dt_last = float(jnp.asarray(sim.flow.dt[-1]))   # sync
    wall = time.perf_counter() - t0
    ms = wall / steps * 1e3
    rate = cells * steps / wall
    # projected 50 tU/L wall: steps needed = 50*L/U / mean dt
    mean_dt = sum(sim.flow.dt[-steps:]) / steps
    n50 = 50 * sim.L / sim.U / mean_dt
    print(f"{ms:.3f} ms/step  {rate / 1e6:.1f} Mcell/s  dt={dt_last:.3f}  "
          f"-> 50 tU/L in ~{n50 * ms / 1e3:.1f} s ({n50:.0f} steps)")
    print(f"# pois_n tail: {sim.pois_n[-8:]}")


if __name__ == "__main__":
    main()
