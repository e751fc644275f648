"""Sharded 3D LES (BASELINE.json config 5): a 512³-class domain decomposed
over a device mesh with ICI halo exchange per stencil sweep and MG level,
Smagorinsky sub-grid stress via the `udf` forcing hook.

x-only decompositions run the flat (x, y·z) per-shard fast path with the
Pallas kernels (`DistSimulation(engine="auto")`); other mesh shapes use the
generic 3D engine.  The inner loop is one scanned device program per report
interval (`sim_step_n`).

Run on real chips:      python examples/les_sharded.py 512 8
Run on a CPU test mesh: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
                        python examples/les_sharded.py 64 4
(set platform cpu via waterlily_tpu.set_backend("cpu") if the TPU plugin
overrides JAX_PLATFORMS.)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from waterlily_tpu import AutoBody, Simulation
from waterlily_tpu.parallel.dist import DistSimulation, make_mesh
from waterlily_tpu.utils.les import sgs, smagorinsky


def main(N=64, mx=4, my=1, t_end=1.0):
    R = N // 8
    ctr = jnp.asarray([N / 2, N / 2, N / 2], jnp.float32)
    body = AutoBody(lambda x, t: jnp.sqrt(jnp.sum((x - ctr) ** 2)) - R)
    sim = Simulation((N, N, N), (1.0, 0.0, 0.0), R, nu=R / 1e4, body=body,
                     engine="3d")
    shape = (mx,) if my == 1 else (mx, my)
    mesh = make_mesh(shape, jax.devices()[:mx * my])
    dsim = DistSimulation(sim, mesh)
    eng = "flat" if dsim._flat_mode else "3d"
    print(f"{N}^3 over {'x'.join(map(str, shape))} mesh = {mx*my} devices; "
          f"Smagorinsky LES; engine={eng}")
    les_udf = sgs(smagorinsky(Cs=0.17))
    while dsim.sim_time < t_end:
        dsim.sim_step_n(5, udf=les_udf)
        u = dsim.u
        print(f"tU/L={dsim.sim_time:6.3f}  dt={dsim.sim.flow.dt[-1]:.4f}  "
              f"max|u|={float(jnp.max(jnp.abs(u))):.3f}")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 64, int(a[1]) if len(a) > 1 else 4,
         int(a[2]) if len(a) > 2 else 1,
         float(a[3]) if len(a) > 3 else 1.0)
