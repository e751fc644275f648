"""3D Taylor-Green vortex: kinetic-energy / enstrophy decay validation
(BASELINE.json config 3).  Run: python examples/tgv3d.py [L] [t_end]"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from waterlily_tpu import Simulation
from waterlily_tpu.ops.grid import interior
from waterlily_tpu.utils.metrics import ke_field, omega_mag_field


def make_sim(L=128, Re=1600):
    kappa = 2 * np.pi / L

    def tgv(i, x, t):
        a, b, c = x[0] * kappa, x[1] * kappa, x[2] * kappa
        return jnp.where(i == 0, jnp.cos(a) * jnp.sin(b) * jnp.sin(c),
               jnp.where(i == 1, -jnp.sin(a) * jnp.cos(b) * jnp.sin(c) / 2,
                         -jnp.sin(a) * jnp.sin(b) * jnp.cos(c) / 2))

    return Simulation((L, L, L), (0.0, 0.0, 0.0), L, U=1, nu=1 / (kappa * Re),
                      u0=lambda i, x: tgv(i, x, 0.0), perdir=(0, 1, 2))


def main(L=128, t_end=10.0):
    sim = make_sim(L)
    n_cells = L**3
    while sim.sim_time < t_end:
        sim.sim_step(sim.sim_time + 0.5, remeasure=False)
        ke = float(jnp.sum(interior(ke_field(sim.flow.state.u)))) / n_cells
        ens = float(jnp.sum(interior(omega_mag_field(sim.flow.state.u) ** 2))) / n_cells
        print(f"tU/L={sim.sim_time:6.2f}  KE={ke:.6f}  enstrophy={ens:.6f}")


if __name__ == "__main__":
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    main(L, float(sys.argv[2]) if len(sys.argv) > 2 else 10.0)
