"""Multi-chip domain decomposition over a `jax.sharding.Mesh`.

This is the component the reference *does not have* (it is single-device;
distribution is an explicit development goal, `README.md:153-156` — the MPI
fork lives elsewhere).  The TPU-native design needs no communication code at
all: every stencil in this package is expressed as `jnp.roll`/slab updates, so
annotating the flow fields with a spatial `NamedSharding` makes XLA's SPMD
partitioner emit the 1-ghost halo exchanges as `collective-permute`s over ICI
and turn the CFL/residual-norm reductions into `all-reduce`s.  The multigrid
level stack shards its fine levels and replicates levels too coarse to split,
the standard coarse-grid-gather strategy.

Usage::

    mesh = make_mesh()                     # all local devices
    sim = Simulation(...)
    shard_simulation(sim, mesh)            # device_put state + levels
    sim.sim_step(...)                      # same host loop, SPMD under jit
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "mesh_axes_for", "state_sharding", "level_sharding",
           "shard_flow_state", "shard_levels", "shard_simulation"]


def make_mesh(shape: Optional[tuple[int, ...]] = None,
              axis_names: Optional[tuple[str, ...]] = None,
              devices=None) -> Mesh:
    """Build a device mesh for spatial decomposition.  Default: all local
    devices in a 1-D mesh over axis ``'x'`` (2-D meshes: ``shape=(a, b)``
    with axes ``('x', 'y')``)."""
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),)
    if axis_names is None:
        axis_names = ("x", "y", "z")[: len(shape)]
    arr = np.asarray(devices[: math.prod(shape)]).reshape(shape)
    return Mesh(arr, axis_names)


def mesh_axes_for(mesh: Mesh, D: int) -> tuple:
    """Map mesh axes onto the leading spatial dims: axis 'x' shards spatial
    dim 0, 'y' dim 1, 'z' dim 2; remaining dims unsharded."""
    names = list(mesh.axis_names)
    return tuple(names[d] if d < len(names) else None for d in range(D))


def state_sharding(mesh: Mesh, D: int):
    """NamedShardings for the FlowState fields (component axes replicated,
    spatial axes split over the mesh)."""
    sp = mesh_axes_for(mesh, D)
    return {
        "u": NamedSharding(mesh, P(None, *sp)),
        "u0": NamedSharding(mesh, P(None, *sp)),
        "p": NamedSharding(mesh, P(*sp)),
        "V": NamedSharding(mesh, P(None, *sp)),
        "mu0": NamedSharding(mesh, P(None, *sp)),
        "mu1": NamedSharding(mesh, P(None, None, *sp)),
        "nu": NamedSharding(mesh, P()),
    }


def _shardable(shape: tuple[int, ...], mesh: Mesh, D: int) -> bool:
    """Shard a level only if every mesh-split dim keeps >= 2 cells per shard;
    below that, replicate (coarse-grid gather)."""
    axes = mesh_axes_for(mesh, D)
    for d, ax in enumerate(axes):
        if ax is None:
            continue
        n_dev = mesh.shape[ax]
        if shape[d] < 2 * n_dev:
            return False
    return True


def level_sharding(mesh: Mesh, shape: tuple[int, ...]):
    """(L, D, iD) shardings for one Poisson level of padded ``shape``."""
    D = len(shape)
    if _shardable(shape, mesh, D):
        sp = mesh_axes_for(mesh, D)
    else:
        sp = (None,) * D
    return (NamedSharding(mesh, P(None, *sp)),
            NamedSharding(mesh, P(*sp)),
            NamedSharding(mesh, P(*sp)))


def shard_flow_state(state, mesh: Mesh):
    """device_put every FlowState leaf with its spatial sharding."""
    import dataclasses

    D = state.p.ndim
    sh = state_sharding(mesh, D)
    return dataclasses.replace(
        state, **{k: jax.device_put(getattr(state, k), s) for k, s in sh.items()})


def shard_levels(levels, mesh: Mesh):
    """device_put the multigrid stack; fine levels sharded, coarse replicated."""
    out = []
    for lev in levels:
        sL, sD, siD = level_sharding(mesh, lev.D.shape)
        out.append(type(lev)(jax.device_put(lev.L, sL),
                             jax.device_put(lev.D, sD),
                             jax.device_put(lev.iD, siD)))
    return tuple(out)


def shard_simulation(sim, mesh: Mesh):
    """Move a `Simulation`'s device state onto the mesh in place.  Subsequent
    `sim_step` calls execute SPMD: XLA inserts the halo collective-permutes
    and global all-reduces automatically."""
    sim.flow.state = shard_flow_state(sim.flow.state, mesh)
    sim.levels = shard_levels(sim.levels, mesh)
    sim.mesh = mesh
    return sim
