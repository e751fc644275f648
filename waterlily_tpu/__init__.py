"""waterlily_tpu — a TPU-native incompressible Navier-Stokes solver.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of WaterLily.jl
(reference: TzuYaoHuang/WaterLily.jl): 2D/3D unsteady incompressible flow on a
staggered Cartesian grid, immersed bodies via the Boundary Data Immersion
Method, a semi-coarsened geometric-multigrid pressure solver, moving/deforming
geometry from signed-distance functions differentiated with JAX AD, and
end-to-end differentiability of whole simulations via `jax.jacfwd`.

The compute path is pure-functional jnp/Pallas over pytree states, jitted into
single XLA programs per time step; multi-chip scaling shards the domain over a
`jax.sharding.Mesh` (the halo exchanges ride XLA collective-permutes over ICI).
"""
from .models import (AutoBody, Body, Flow, FlowCfg, FlowState, NoBody,  # noqa: F401
                     RigidMap, SetBody, cds, curvature, measure_fill,
                     measure_sdf, mom_step, quick, setmap, vanleer)
from .ops import bc, grid, multigrid, poisson  # noqa: F401
from .simulation import Simulation  # noqa: F401


def set_backend(name: str):
    """Select the execution platform ("cpu" / "tpu" / "gpu") — the analog of
    the reference's Preferences-persisted `set_backend`
    (`src/core.jl:85-96`); here it is just the JAX platform, settable until
    the first computation runs."""
    import jax

    jax.config.update("jax_platforms", name)


__version__ = "0.1.0"
