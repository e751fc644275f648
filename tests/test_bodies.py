"""Body framework tests — ports of `/root/reference/test/test_bodies.jl`:
kernel moments, analytic AutoBody measures (2D/3D, mapped, CSG), curvature,
fast-path behavior, RigidMap rotations/velocities, setmap recursion.
"""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from waterlily_tpu.models.autobody import AutoBody, curvature
from waterlily_tpu.models.body import (NoBody, kern0, kern1, measure_sdf,
                                       mu0_kernel, mu1_kernel)
from waterlily_tpu.models.rigidmap import RigidMap, setmap
from waterlily_tpu.ops.grid import loc_grid

F64 = jnp.float64


def measure(body, x, t=0.0, fastd2=float("inf")):
    x = jnp.asarray(x, F64)
    d, n, v = body.measure_at(x, jnp.asarray(t, F64), fastd2)
    return float(d), np.array(n), np.array(v)


def test_kernel_moments():
    assert float(mu0_kernel(jnp.asarray(3.0), 6)) == pytest.approx(float(mu0_kernel(jnp.asarray(0.5), 1)))
    assert float(mu0_kernel(jnp.asarray(0.0), 1)) == pytest.approx(0.5)
    assert float(mu0_kernel(jnp.asarray(np.finfo(np.float64).eps - 1), 1)) == 0.0
    assert float(mu1_kernel(jnp.asarray(0.0), 2)) == pytest.approx(2 * (0.25 - 1 / np.pi**2))


def test_nobody():
    d, n, v = measure(NoBody(), [2.0, 1.0])
    assert d == float("inf") and np.all(n == 0) and np.all(v == 0)


def circ(x, t):
    return jnp.sqrt(jnp.sum(x**2)) - 2.0


def test_autobody_measure():
    body1 = AutoBody(lambda x, t: circ(x, t) - t)
    body2 = AutoBody(circ, lambda x, t: x + t**2)
    s2 = math.sqrt(2)
    d, n, v = measure(body1, [s2, s2], 0.0)
    assert d == pytest.approx(0.0, abs=1e-9)
    assert np.allclose(n, [math.sqrt(0.5), math.sqrt(0.5)])
    assert np.allclose(v, 0)
    d, n, v = measure(body1, [2.0, 0.0, 0.0], 1.0)
    assert d == pytest.approx(-1.0)
    assert np.allclose(n, [1, 0, 0]) and np.allclose(v, 0)
    d, n, v = measure(body2, [s2, s2], 0.0)
    assert d == pytest.approx(0.0, abs=1e-9)
    assert np.allclose(n, [math.sqrt(0.5), math.sqrt(0.5)])
    d, n, v = measure(body2, [1.0, -1.0, -1.0], 1.0)
    assert d == pytest.approx(0.0, abs=1e-9)
    assert np.allclose(n, [1, 0, 0], atol=1e-9)
    assert np.allclose(v, [-2, -2, -2])


def test_setbody_csg():
    body1 = AutoBody(lambda x, t: circ(x, t) - t)
    body2 = AutoBody(circ, lambda x, t: x + t**2)
    s2 = math.sqrt(2)
    d, n, v = measure(body1 + body2, [-s2, -s2], 1.0)
    assert d == pytest.approx(-s2)
    assert np.allclose(n, [-math.sqrt(0.5), -math.sqrt(0.5)])
    assert np.allclose(v, [-2, -2])
    d, n, v = measure(body1 | body2, [-s2, -s2], 1.0)
    assert d == pytest.approx(-s2)
    d, n, v = measure(body1 - body2, [-s2, -s2], 1.0)
    assert d == pytest.approx(s2)
    assert np.allclose(n, [math.sqrt(0.5), math.sqrt(0.5)])
    assert np.allclose(v, [-2, -2])
    # exactly-equal-distance tie
    b = AutoBody(circ) + AutoBody(circ, lambda x, t: x - jnp.asarray([6.0, 0.0]))
    assert float(b.sdf_at(jnp.asarray([3.0, 0.0], F64), jnp.asarray(0.0, F64))) == pytest.approx(1.0)


def test_measure_sdf_csg_identity():
    body1 = AutoBody(lambda x, t: circ(x, t) - t)
    body2 = AutoBody(circ, lambda x, t: x + t**2)
    p = measure_sdf((body1 & body2) | body1, (4, 5), 0.0, jnp.float32)
    coords = loc_grid(None, (4, 5), jnp.float32)
    expect = np.sqrt(np.array(coords[0]) ** 2 + np.array(coords[1]) ** 2) - 2
    assert np.allclose(np.array(p)[1:-1, 1:-1], expect[1:-1, 1:-1], atol=1e-6)


def test_fast_path():
    body1 = AutoBody(lambda x, t: circ(x, t) - t)
    full = measure(body1, [3.0, 4.0], 0.0, fastd2=9.0)
    ref = measure(body1, [3.0, 4.0], 0.0)
    assert full[0] == pytest.approx(ref[0]) and np.allclose(full[1], ref[1])
    fast = measure(body1, [3.0, 4.0], 0.0, fastd2=8.0)
    assert fast[0] == pytest.approx(3.0)  # unnormalized distance
    assert np.all(fast[1] == 0) and np.all(fast[2] == 0)


def test_curvature():
    H, K = curvature(jnp.eye(2))
    assert float(H) == pytest.approx(1.0) and float(K) == 0.0
    A = jnp.asarray([[2.0, 1, 0], [1, 2, 1], [0, 1, 2]])
    H, K = curvature(A)
    assert float(H) == pytest.approx(3.0) and float(K) == pytest.approx(10.0)


def sdf_unit(x, t):
    return jnp.sqrt(jnp.sum(x**2)) - 1.0


def test_rigidmap_2d():
    body = AutoBody(sdf_unit, RigidMap(jnp.zeros(2, F64), jnp.asarray(0.0, F64)))
    d, n, v = measure(body, [1.5, 0.0])
    assert d == pytest.approx(0.5) and np.allclose(n, [1, 0]) and np.allclose(v, 0)
    body = setmap(body, theta=jnp.asarray(np.pi / 4, F64), V=jnp.asarray([1.0, 0.0], F64))
    d, n, v = measure(body, [1.5, 0.0])
    assert d == pytest.approx(0.5) and np.allclose(n, [1, 0]) and np.allclose(v, [1, 0])
    body = setmap(body, omega=jnp.asarray(0.1, F64))
    d, n, v = measure(body, [1.5, 0.0])
    assert d == pytest.approx(0.5) and np.allclose(n, [1, 0])
    assert np.allclose(v, [1, 1.5 * 0.1])


def test_rigidmap_3d():
    z3 = jnp.zeros(3, F64)
    body = AutoBody(sdf_unit, RigidMap(z3, z3, xp=jnp.asarray([-0.5, 0, 0], F64)))
    d, n, v = measure(body, [1.5, 0, 0])
    assert d == pytest.approx(0.5) and np.allclose(n, [1, 0, 0]) and np.allclose(v, 0)
    # 180° about x: unchanged
    body = setmap(body, theta=jnp.asarray([np.pi, 0, 0], F64))
    d, n, v = measure(body, [1.5, 0, 0])
    assert d == pytest.approx(0.5) and np.allclose(n, [1, 0, 0], atol=1e-12)
    # 180° about y with velocity
    body = setmap(body, theta=jnp.asarray([0, np.pi, 0], F64), V=jnp.asarray([1.0, 0, 0], F64))
    d, n, v = measure(body, [1.5, 0, 0])
    assert d == pytest.approx(1.5) and np.allclose(n, [1, 0, 0], atol=1e-12)
    assert np.allclose(v, [1, 0, 0], atol=1e-12)
    # linear + angular velocity
    body = setmap(body, theta=z3, V=jnp.asarray([1.0, 0, 0], F64),
                  omega=jnp.asarray([0, 0, 0.1], F64))
    d, n, v = measure(body, [1.5, 0, 0])
    assert d == pytest.approx(0.5) and np.allclose(v, [1, 0.2, 0])
    d, n, v = measure(body, [0, 1.5, 0])
    assert d == pytest.approx(0.5) and np.allclose(n, [0, 1, 0])
    assert np.allclose(v, [0.85, 0.05, 0])
    d, n, v = measure(body, [1.5, 1.5, 1.5])
    assert d == pytest.approx(math.sqrt(3 * 1.5**2) - 1)
    assert np.allclose(n, np.sqrt(1 / 3) * np.ones(3))
    assert np.allclose(v, [0.85, 0.2, 0])
    # two rotation rates
    body = setmap(body, V=jnp.asarray([1.0, 0, 0], F64),
                  omega=jnp.asarray([0, -0.1, 0.1], F64))
    d, n, v = measure(body, [1.5, 0, 0])
    assert d == pytest.approx(0.5) and np.allclose(v, [1, 0.2, 0.2])
    d, n, v = measure(body, [0, 1.5, 1.5])
    assert d == pytest.approx(math.sqrt(2 * 1.5**2) - 1)
    assert np.allclose(n, [0, math.sqrt(0.5), math.sqrt(0.5)])
    assert np.allclose(v, [0.7, 0.05, 0.05])


def test_setmap_recursion():
    body = (AutoBody(sdf_unit, RigidMap(jnp.zeros(2, F64), jnp.asarray(0.0, F64)))
            + AutoBody(sdf_unit, RigidMap(jnp.ones(2, F64), jnp.asarray(0.0, F64))))
    body = setmap(body, theta=jnp.asarray(np.pi / 4, F64), V=jnp.asarray([1.0, 0.0], F64))
    assert float(body.a.map.theta) == float(body.b.map.theta) == pytest.approx(np.pi / 4)
    assert np.allclose(np.array(body.a.map.V), [1, 0])
    assert np.allclose(np.array(body.b.map.V), [1, 0])


def test_annulus():
    rmap = RigidMap(jnp.zeros(2, F64), jnp.asarray(np.pi / 4, F64))
    body = (AutoBody(lambda x, t: jnp.sqrt(x @ x) - 1.0, rmap)
            - AutoBody(lambda x, t: jnp.sqrt(x @ x) - 0.5, rmap))
    d, n, v = measure(setmap(body, omega=jnp.asarray(1.0, F64)), [0.25, 0.0])
    assert d == pytest.approx(0.25)
    assert np.allclose(n, [-1, 0], atol=1e-12)
    assert np.allclose(v, [0, 0.25], atol=1e-12)


def test_sparse_measure_matches_dense():
    # gather-sparse banded measure (`measure_fill(sparse_k=)`) is bitwise
    # identical to the dense box sweep — incl. a scaled (pseudo-sdf) moving
    # map, where the raw-sdf gather gate must match the reference's fastd2
    # semantics (`AutoBody.jl:31`: the band test is gated on the RAW
    # composed distance)
    from waterlily_tpu.models.body import measure_fill

    N = 22
    ctr = jnp.full((3,), N / 2.0)
    body = AutoBody(
        lambda x, t: 0.8 * (jnp.sqrt(jnp.sum((x - ctr) ** 2)) - 4.0),
        lambda x, t: x - jnp.stack([1.5 * jnp.sin(0.3 * t), 0 * t, 0 * t]))
    shape = (N + 2,) * 3
    box = ((3, N - 1), (4, N - 2), (4, N - 2))
    dense = measure_fill(body, shape, 0.7, 1.0, F64, band_box=box)
    sp = measure_fill(body, shape, 0.7, 1.0, F64, band_box=box,
                      sparse_k=4096, want_count=True)
    assert int(sp[4]) > 0
    for a, b in zip(dense, sp):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_sparse_measure_count_reports_overflow():
    # when the candidate count exceeds the capacity the returned count
    # still reports the TRUE count, so the caller's escape can regrow
    from waterlily_tpu.models.body import measure_fill

    N = 22
    ctr = jnp.full((3,), N / 2.0)
    body = AutoBody(lambda x, t: jnp.sqrt(jnp.sum((x - ctr) ** 2)) - 5.0)
    shape = (N + 2,) * 3
    box = ((1, N + 1),) * 3
    full = measure_fill(body, shape, 0.0, 1.0, F64, band_box=((2, N),) * 3,
                        sparse_k=8192, want_count=True)
    small = measure_fill(body, shape, 0.0, 1.0, F64, band_box=((2, N),) * 3,
                         sparse_k=128, want_count=True)
    assert int(small[4]) == int(full[4]) > 128
