"""Particle pathline visualization.

TPU-native analog of the reference's Pathlines extension
(`/root/reference/ext/WaterLilyPathlinesExt.jl:19-58`): a swarm of passive
tracer particles advected through the flow, drawn as fading velocity-colored
segments.  The advection is a single jitted device computation (vmapped
staggered interpolation, `utils.interp.interp_vector`) — positions come to
host once per frame only for rasterization, mirroring the reference's
`Particles.update!` (GPU) + `PathlineCanvas` (CPU image) split.

Segments are rendered with matplotlib `LineCollection` using per-segment
alpha decay — the headless equivalent of the reference canvas's
`fade!`/`draw!` cycle (`WaterLilyPathlinesExt.jl:44-50`).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

__all__ = ["Particles", "pathlines_gif"]


def _jax():
    import jax
    import jax.numpy as jnp
    return jax, jnp


@dataclasses.dataclass
class Particles:
    """Tracer swarm state: positions in grid units (interior frame), ages in
    steps, and the RNG key used for respawning (`Pathlines.Particles`)."""
    pos: object          # (N, D) device array
    age: object          # (N,) int32
    key: object
    life: int = 255

    @classmethod
    def init(cls, n: int, shape, *, life: int = 255, seed: int = 0, dtype=None):
        """Scatter ``n`` particles uniformly over the interior of a
        ghost-padded ``shape`` grid."""
        jax, jnp = _jax()
        dtype = dtype or jnp.float32
        key = jax.random.PRNGKey(seed)
        key, k1, k2 = jax.random.split(key, 3)
        D = len(shape)
        lo = jnp.zeros(D, dtype)
        hi = jnp.asarray([s - 2 for s in shape], dtype)
        pos = lo + jax.random.uniform(k1, (n, D), dtype) * (hi - lo)
        age = jax.random.randint(k2, (n,), 0, life)
        return cls(pos=pos, age=age, key=key, life=life)


def _advect(pos, age, key, u, dt, hi, life):
    """RK2 midpoint advection + respawn of expired/escaped particles
    (`Particles.update!` semantics)."""
    jax, jnp = _jax()
    sample = jax.vmap(lambda x: _interp(x, u))
    v1 = sample(pos)
    v2 = sample(pos + 0.5 * dt * v1)
    new = pos + dt * v2
    age = age + 1
    out = jnp.any((new < 0) | (new > hi), axis=1) | (age >= life)
    key, k1, k2 = jax.random.split(key, 3)
    fresh = jax.random.uniform(k1, pos.shape, pos.dtype) * hi
    new = jnp.where(out[:, None], fresh, new)
    age = jnp.where(out, 0, age)
    return new, age, key, v2


def _interp(x, u):
    from .interp import interp_vector
    return interp_vector(x + 1.0, u)   # interior frame -> padded-array frame


_advect_jit = None


def _get_advect():
    global _advect_jit
    if _advect_jit is None:
        jax, _ = _jax()
        _advect_jit = jax.jit(_advect, static_argnames=("life",))
    return _advect_jit


def update_particles(p: Particles, sim, dt: Optional[float] = None):
    """Advance the swarm one step through ``sim``'s current velocity field;
    returns (particles, old_pos, velocities) for drawing."""
    jax, jnp = _jax()
    u = sim.flow.state.u
    cfg = sim.flow.cfg
    if dt is None:
        dt = sim.flow.dt[-2] if len(sim.flow.dt) > 1 else sim.flow.dt[-1]
    hi = jnp.asarray([s - 2 for s in cfg.shape], u.dtype)
    old = p.pos
    new, age, key, v = _get_advect()(p.pos, p.age, p.key, u,
                                     jnp.asarray(dt, u.dtype), hi, life=p.life)
    return (dataclasses.replace(p, pos=new, age=age, key=key), old, v)


class _SegmentTrail:
    """Host-side fading segment buffer (the `PathlineCanvas` analog):
    keeps recent segments with exponentially-decaying alpha."""

    def __init__(self, fadetau: float = 0.2, alpha_min: float = 0.02):
        self.segs: list[np.ndarray] = []     # (M, 2, 2) per frame
        self.speed: list[np.ndarray] = []
        self.alpha: list[float] = []
        self.fadetau = fadetau
        self.alpha_min = alpha_min

    def fade(self, dt_scaled: float):
        decay = float(np.exp(-dt_scaled / self.fadetau))
        self.alpha = [a * decay for a in self.alpha]
        keep = [i for i, a in enumerate(self.alpha) if a > self.alpha_min]
        self.segs = [self.segs[i] for i in keep]
        self.speed = [self.speed[i] for i in keep]
        self.alpha = [self.alpha[i] for i in keep]

    def draw(self, p0: np.ndarray, p1: np.ndarray, speed: np.ndarray):
        # drop teleporting (respawned) segments
        ok = np.linalg.norm(p1 - p0, axis=1) < 5.0
        self.segs.append(np.stack([p0[ok], p1[ok]], axis=1))
        self.speed.append(speed[ok])
        self.alpha.append(1.0)

    def render(self, ax, colormap="plasma", colorrange=(0, 3)):
        from matplotlib.collections import LineCollection
        from matplotlib.colors import Normalize
        import matplotlib.cm as cm

        norm = Normalize(*colorrange)
        cmap = cm.get_cmap(colormap)
        for segs, spd, a in zip(self.segs, self.speed, self.alpha):
            colors = cmap(norm(spd))
            colors[:, 3] = a
            ax.add_collection(LineCollection(segs, colors=colors, lw=0.8))


def pathlines_gif(sim, *, n: int = 10_000, duration: float = 1.0,
                  step: float = 0.05, life: int = 255, fadetau: float = 0.2,
                  colormap: str = "plasma", colorrange=(0.0, 3.0),
                  bgcolor: str = "black", remeasure: bool = False,
                  fname: str = "pathlines.gif", fps: int = 20, seed: int = 0):
    """Step a 2D simulation and write a fading-pathline animation — the
    `viz!`-with-Pathlines mode of the reference
    (`WaterLilyPathlinesExt.jl:19-58`)."""
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    cfg = sim.flow.cfg
    if cfg.D != 2:
        raise ValueError("pathlines_gif draws 2D simulations")
    nx, ny = (s - 2 for s in cfg.shape)
    p = Particles.init(n, cfg.shape, life=life, seed=seed)
    trail = _SegmentTrail(fadetau=fadetau)
    from matplotlib.animation import PillowWriter

    fig, ax = plt.subplots(figsize=(6, 6 * ny / nx), dpi=110)
    writer = PillowWriter(fps=fps)
    t0 = sim.sim_time
    frames = np.arange(t0 + step, t0 + duration + 1e-9, step)
    with writer.saving(fig, fname, dpi=110):
        for t in frames:
            sim.sim_step(float(t), remeasure=remeasure)
            p, old, v = update_particles(p, sim)
            dt_scaled = sim.flow.dt[-2] * sim.U / sim.L
            trail.fade(dt_scaled)
            trail.draw(np.asarray(old), np.asarray(p.pos),
                       np.linalg.norm(np.asarray(v), axis=1) / sim.U)
            ax.clear()
            ax.set_facecolor(bgcolor)
            ax.set_xlim(0, nx)
            ax.set_ylim(0, ny)
            ax.set_xticks([])
            ax.set_yticks([])
            ax.set_aspect("equal")
            trail.render(ax, colormap, colorrange)
            writer.grab_frame()
    plt.close(fig)
    return fname
