"""2D flow over a circle at Re=250 — the reference README example
(`/root/reference/README.md:39-90`): drag-coefficient history via the BDIM
pressure force.  Run: python examples/circle.py [t_end]"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from waterlily_tpu import AutoBody, Simulation
from waterlily_tpu.utils.metrics import pressure_force, viscous_force


def make_sim(radius=16, Re=250):
    body = AutoBody(lambda x, t: jnp.sqrt(jnp.sum((x - 2 * radius) ** 2)) - radius)
    return Simulation((24 * radius, 16 * radius), (1.0, 0.0), radius,
                      nu=radius / Re, body=body)


def main(t_end=10.0):
    sim = make_sim()
    print(f"grid {sim.flow.cfg.shape}, Re=250")
    history = []
    while sim.sim_time < t_end:
        sim.sim_step(sim.sim_time + 0.2, remeasure=False)
        fp = np.array(pressure_force(sim.flow.state.p, sim.body, sim.time))
        fv = np.array(viscous_force(sim.flow.state.u, sim.flow.state.nu,
                                    sim.body, sim.time))
        cd = -2 * (fp[0] + fv[0]) / (2 * sim.L)   # C_d = F_x / (0.5 rho U^2 D)
        history.append((sim.sim_time, cd))
        print(f"tU/L={sim.sim_time:6.2f}  C_d={cd:6.3f}  dt={sim.flow.dt[-1]:.3f}")
    return history


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 10.0)
