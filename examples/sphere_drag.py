"""3D sphere (or donut) at Re=1e3 with drag history (BASELINE.json config 4):
`pressure_force` + `viscous_force` over the BDIM band each coarse step.
Run: python examples/sphere_drag.py [N] [t_end] [--donut]

On TPU the flat (x, y·z) engine is selected automatically; forces are
computed from the lazily-synced 3D state once per output interval only.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from waterlily_tpu import AutoBody, Simulation
from waterlily_tpu.utils.metrics import pressure_force, viscous_force


def make_sim(N=128, Re=1e3, donut=False):
    R = N // 8
    ctr = jnp.asarray([N / 3, N / 2, N / 2], jnp.float32)
    if donut:
        # torus of major radius R, minor radius R/2, axis x
        # (the reference's donut example geometry)
        def sdf(x, t):
            q = x - ctr
            ring = jnp.sqrt(q[1] ** 2 + q[2] ** 2) - R
            return jnp.sqrt(ring ** 2 + q[0] ** 2) - R / 2
    else:
        def sdf(x, t):
            return jnp.sqrt(jnp.sum((x - ctr) ** 2)) - R
    body = AutoBody(sdf)
    return Simulation((int(2.5 * N), N, N), (1.0, 0.0, 0.0), R, nu=R / Re,
                      body=body, exit_bc=True)


def main(N=128, t_end=10.0, donut=False):
    sim = make_sim(N, donut=donut)
    R = sim.L
    area = np.pi * R ** 2 if not donut else np.pi * ((1.5 * R) ** 2 - (0.5 * R) ** 2)
    print(f"grid {sim.flow.cfg.shape}, {'donut' if donut else 'sphere'}, Re=1e3")
    while sim.sim_time < t_end:
        sim.sim_step(sim.sim_time + 0.2, remeasure=False)
        fp = np.array(pressure_force(sim.flow.state.p, sim.body, sim.time))
        fv = np.array(viscous_force(sim.flow.state.u, sim.flow.state.nu,
                                    sim.body, sim.time))
        cd = -2 * (fp[0] + fv[0]) / area
        print(f"tU/L={sim.sim_time:6.2f}  C_d={cd:6.3f}  dt={sim.flow.dt[-1]:.3f}")
    # final frame: vorticity isosurface + body mesh (marching tetrahedra,
    # the `viz!` 3D analog — `ext/WaterLilyMakieExt.jl:153-284`)
    from waterlily_tpu.utils.mesh import viz3d

    out = viz3d(sim, fname="sphere_iso.png")
    print("isosurface render:", out)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    main(int(args[0]) if args else 128,
         float(args[1]) if len(args) > 1 else 10.0,
         donut="--donut" in sys.argv)
