"""2D flapping (pitching + heaving) foil with per-step re-measure — the
moving-body configuration of BASELINE.json (config 2).
Run: python examples/flapping_foil.py [t_end]"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from waterlily_tpu import AutoBody, Simulation
from waterlily_tpu.utils.metrics import total_force


def make_sim(L=32, Re=250, St=0.3):
    """Foil = thick line segment; heave h(t) = A sin(2π f t), pitch about the
    quarter chord."""
    A = 0.5 * L
    f = St / (2 * A)           # Strouhal-scaled frequency

    def map_fn(x, t):
        h = A * jnp.sin(2 * jnp.pi * f * t)
        th = 0.3 * jnp.cos(2 * jnp.pi * f * t)
        c, s = jnp.cos(th), jnp.sin(th)
        y = x - jnp.stack([2.0 * L, 2.0 * L + h])
        return jnp.stack([c * y[0] + s * y[1], -s * y[0] + c * y[1]])

    def sdf(x, t):
        cl = jnp.clip(x[0], 0.0, L)
        return jnp.sqrt((x[0] - cl) ** 2 + x[1] ** 2) - 2.0

    body = AutoBody(sdf, map_fn)
    return Simulation((8 * L, 4 * L), (1.0, 0.0), L, nu=L / Re, body=body)


def main(t_end=6.0):
    sim = make_sim()
    while sim.sim_time < t_end:
        sim.sim_step(sim.sim_time + 0.2, remeasure=True)
        thrust, lift = np.array(total_force(sim))[:2]
        print(f"tU/L={sim.sim_time:6.2f}  Fx={thrust:8.3f}  Fy={lift:8.3f}")


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 6.0)
