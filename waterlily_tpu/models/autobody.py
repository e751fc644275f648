"""Implicit geometry from signed-distance functions, differentiated with JAX.

TPU-native port of `/root/reference/src/AutoBody.jl`.  The reference builds a
GPU-safe forward-mode AD layer by hand (`src/core.jl:245-282`) to get
gradients/Jacobians of user sdf/map closures inside kernels; in JAX the same
quantities are `jax.grad`, `jax.jacfwd` and `jax.jvp`, which also nest freely
(the nested-dual case the reference works around is free here).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .body import INF, Body

__all__ = ["AutoBody", "FnMap", "curvature"]


@jax.tree_util.register_pytree_node_class
class FnMap:
    """Wrap a plain ``map(x, t)`` callable as a leafless pytree so bodies can
    hold either closures (static) or parameterized maps like `RigidMap`
    (traced) in the same field."""

    def __init__(self, fn: Callable):
        self.fn = fn

    def __call__(self, x, t):
        return self.fn(x, t)

    def tree_flatten(self):
        return (), self.fn

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux)


def _identity_map(x, t):
    return x


@jax.tree_util.register_pytree_node_class
class AutoBody(Body):
    """`AutoBody(sdf, map)` (`AutoBody.jl:1-13`): geometry implicitly defined
    by ``sdf(x, t)`` composed with a coordinate ``map(x, t)``; the distance is
    ``sdf(map(x, t), t)``."""

    def __init__(self, sdf: Callable, map: Optional[Callable] = None):
        self.sdf = sdf
        if map is None:
            map = FnMap(_identity_map)
        elif not isinstance(map, (FnMap,)) and not hasattr(map, "map_velocity"):
            map = FnMap(map)
        self.map = map

    def sdf_at(self, x, t):
        """`sdf(body,x,t) = body.sdf(body.map(x,t),t)` (`AutoBody.jl:19`)."""
        return self.sdf(self.map(x, t), t)

    def measure_at(self, x, t, fastd2=INF):
        """Distance, normal, velocity (`measure`, `AutoBody.jl:29-37`):

        * n = ∇sdf in the body frame, pulled back by Jᵀ (J = ∂map/∂x),
        * pseudo-sdf fix d /= |Jᵀn|,
        * V = -J⁻¹ ∂map/∂t.

        The reference's fast/NaN early-returns become `where` selects (same
        results, branch-free — the dense vmapped sweep computes everything).
        """
        xi = self.map(x, t)
        d = self.sdf(xi, t)
        n_b = jax.grad(lambda z: self.sdf(z, t))(xi)
        nan = jnp.any(jnp.isnan(n_b))
        n_b = jnp.where(jnp.isnan(n_b), 0.0, n_b)
        if hasattr(self.map, "map_jacobian"):
            J = self.map.map_jacobian(x, t)
            dmdt = self.map.map_velocity(x, t)
        else:
            J = jax.jacfwd(lambda z: self.map(z, t))(x)
            dmdt = jax.jvp(lambda tt: self.map(x, tt), (t,), (jnp.ones_like(t),))[1]
        n = J.T @ n_b
        m = jnp.sqrt(jnp.sum(n**2))
        msafe = jnp.where(m > 0, m, 1.0)
        V = -jnp.linalg.solve(J, dmdt)
        skip = (d * d > fastd2) | nan | (m == 0)
        return (jnp.where(skip, d, d / msafe),
                jnp.where(skip, jnp.zeros_like(n), n / msafe),
                jnp.where(skip, jnp.zeros_like(V), V))

    def tree_flatten(self):
        return (self.map,), self.sdf

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.sdf = aux
        obj.map = children[0]
        return obj


def curvature(A: jax.Array):
    """Mean and Gaussian curvature from the sdf Hessian
    (`curvature`, `AutoBody.jl:46-52`)."""
    H = 0.5 * jnp.trace(A)
    if A.shape == (3, 3):
        K = (A[0, 0] * A[1, 1] + A[0, 0] * A[2, 2] + A[1, 1] * A[2, 2]
             - A[0, 1] ** 2 - A[0, 2] ** 2 - A[1, 2] ** 2)
    else:
        K = jnp.zeros_like(H)
    return H, K
