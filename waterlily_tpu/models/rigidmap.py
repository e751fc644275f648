"""Rigid-body motion maps with analytic velocity/Jacobian.

TPU-native port of `/root/reference/src/RigidMap.jl`.  The reference injects
the map's time derivative through a ForwardDiff `Dual` overload of the call
operator (`RigidMap.jl:40-42`); here the velocity and Jacobian are explicit
methods that `AutoBody.measure_at` dispatches on — no dual-number trick needed.
All motion parameters are pytree leaves, so updating them (`setmap`) never
recompiles a jitted re-measure step.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from .autobody import AutoBody
from .body import Body, NoBody, SetBody

__all__ = ["RigidMap", "rotation", "setmap", "cross2"]


def rotation(theta):
    """Rotation matrix: single angle in 2D, x/y/z Euler angles in 3D
    (`rotation`, `RigidMap.jl:47-50`)."""
    theta = jnp.asarray(theta)
    if theta.ndim == 0:
        c, s = jnp.cos(theta), jnp.sin(theta)
        return jnp.stack([jnp.stack([c, s]), jnp.stack([-s, c])])
    t1, t2, t3 = theta[0], theta[1], theta[2]
    c1, s1 = jnp.cos(t1), jnp.sin(t1)
    c2, s2 = jnp.cos(t2), jnp.sin(t2)
    c3, s3 = jnp.cos(t3), jnp.sin(t3)
    return jnp.stack([
        jnp.stack([c3 * c2, c3 * s2 * s1 + s3 * c1, -c3 * s2 * c1 + s3 * s1]),
        jnp.stack([-s3 * c2, -s3 * s2 * s1 + c3 * c1, s3 * s2 * c1 + c3 * s1]),
        jnp.stack([s2, -c2 * s1, c2 * c1]),
    ])


def cross2(a, b):
    """2D scalar x vector cross product (`×`, `RigidMap.jl:46`)."""
    return a * jnp.stack([-b[1], b[0]])


@jax.tree_util.register_pytree_node_class
class RigidMap:
    """`RigidMap(x0, theta; xp, V, omega)` (`RigidMap.jl:28-38`):

        map(x, t)   = R (x - x0 - xp) + xp
        velocity    = -R (V + ω × (x - x0 - xp))
        jacobian    = R

    Drive it externally (ODE integration on the host) and push new parameters
    with `setmap` each step (`RigidMap.jl:13-26`)."""

    def __init__(self, x0, theta, xp=None, V=None, omega=None, R=None):
        self.x0 = jnp.asarray(x0)
        self.theta = jnp.asarray(theta)
        self.xp = jnp.zeros_like(self.x0) if xp is None else jnp.asarray(xp)
        self.V = jnp.zeros_like(self.x0) if V is None else jnp.asarray(V)
        self.omega = jnp.zeros_like(self.theta) if omega is None else jnp.asarray(omega)
        self.R = rotation(self.theta) if R is None else R

    def __call__(self, x, t=0.0):
        return self.R @ (x - self.x0 - self.xp) + self.xp

    def map_jacobian(self, x, t):
        """∂map/∂x — the rotation matrix (explicit form of the reference's
        ForwardDiff jacobian of the call, `RigidMap.jl:39`)."""
        return self.R

    def map_velocity(self, x, t):
        """∂map/∂t = −R̂(V + ω×(x−x₀−xₚ)) — the reference injects this
        through a Dual-number overload (`RigidMap.jl:40-42`); here it is an
        explicit method consumed by `AutoBody.measure_at`."""
        r = x - self.x0 - self.xp
        if self.theta.ndim == 0:
            w = cross2(self.omega, r)
        else:
            w = jnp.cross(self.omega, r)
        return -self.R @ (self.V + w)

    def replace(self, **kw):
        """Immutable parameter update; the rotation matrix is recomputed when
        theta changes (`constructorof`, `RigidMap.jl:53`)."""
        fields = dict(x0=self.x0, theta=self.theta, xp=self.xp, V=self.V,
                      omega=self.omega)
        fields.update(kw)
        return RigidMap(**fields)

    def tree_flatten(self):
        return (self.x0, self.theta, self.xp, self.V, self.omega, self.R), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.x0, obj.theta, obj.xp, obj.V, obj.omega, obj.R = children
        return obj


def setmap(body: Body, **kwargs) -> Body:
    """Update the motion parameters of every `RigidMap` in a body tree
    (`setmap`, `RigidMap.jl:54-56`)."""
    if isinstance(body, SetBody):
        return SetBody(body.op, setmap(body.a, **kwargs), setmap(body.b, **kwargs))
    if isinstance(body, NoBody):
        return body
    if isinstance(body, AutoBody) and isinstance(body.map, RigidMap):
        new = AutoBody.__new__(AutoBody)
        new.sdf = body.sdf
        new.map = body.map.replace(**kwargs)
        return new
    return body
