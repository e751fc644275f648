"""Sharded 3D LES (BASELINE.json config 5): a 512³-class domain decomposed
over a device mesh with ICI halo exchange per stencil sweep and MG level,
Smagorinsky sub-grid stress via the `udf` forcing hook.

Run on real chips:      python examples/les_sharded.py 512 2 2
Run on a CPU test mesh: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
                        JAX_PLATFORMS=cpu python examples/les_sharded.py 64 4 2
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from waterlily_tpu import AutoBody, Simulation
from waterlily_tpu.parallel.dist import DistSimulation, make_mesh
from waterlily_tpu.utils.les import sgs, smagorinsky


def main(N=64, mx=4, my=2, t_end=1.0):
    R = N // 8
    ctr = jnp.asarray([N / 2, N / 2, N / 2], jnp.float32)
    body = AutoBody(lambda x, t: jnp.sqrt(jnp.sum((x - ctr) ** 2)) - R)
    sim = Simulation((N, N, N), (1.0, 0.0, 0.0), R, nu=R / 1e4, body=body,
                     engine="3d")
    mesh = make_mesh((mx, my), jax.devices()[:mx * my])
    dsim = DistSimulation(sim, mesh)
    print(f"{N}^3 over {mx}x{my} mesh = {mx*my} devices; Smagorinsky LES")
    les_udf = sgs(smagorinsky(Cs=0.17))
    step = 0
    while dsim.sim_time < t_end:
        dsim.step_once(remeasure=False, udf=les_udf)
        step += 1
        if step % 5 == 0:
            u = dsim.state.u
            print(f"tU/L={dsim.sim_time:6.3f}  dt={dsim.flow.dt[-1]:.4f}  "
                  f"max|u|={float(jnp.max(jnp.abs(u))):.3f}")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 64, int(a[1]) if len(a) > 1 else 4,
         int(a[2]) if len(a) > 2 else 2,
         float(a[3]) if len(a) > 3 else 1.0)
