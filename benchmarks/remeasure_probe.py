"""Per-component device times of the moving-body remeasure (scan-slope).

The moving rung's cost over the static step is the per-iteration remeasure:
sparse/dense `measure_fill`, MG re-restriction (`update_mg`), the flat-level
restack incl. the coarse `dense_pinv` (an SVD per execution), `_band_box`,
and the flat-mirror moment refresh.  This probe times each in isolation with
`lax.scan`-slope (no tunnel term) so the moving-path levers are chosen from
measurements, not guesses.

Usage: python benchmarks/remeasure_probe.py [N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from waterlily_tpu.utils.cache import setup_compile_cache  # noqa: E402

setup_compile_cache()

K1, K2 = 3, 10


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(leaf.reshape(-1)[0])


def scan_slope(fn, x0, extra=()):
    def runner(K):
        @jax.jit
        def run(c, *e):
            def one(c, _):
                return fn(c, *e), None
            return jax.lax.scan(one, c, None, length=K)[0]
        return run

    ts = {}
    for K in (K1, K2):
        run = runner(K)
        out = run(x0, *extra)
        sync(out)
        base = time.perf_counter()
        sync(out)
        base = time.perf_counter() - base
        best = float("inf")
        prev = out
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(prev, *extra)
            sync(out)
            best = min(best, time.perf_counter() - t0 - base)
            prev = out
        ts[K] = best
    return (ts[K2] - ts[K1]) / (K2 - K1)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 128

    from waterlily_tpu import AutoBody, Simulation
    from waterlily_tpu.models.body import measure_fill
    from waterlily_tpu.ops import mgflat
    from waterlily_tpu.ops import multigrid as mg
    from waterlily_tpu.simulation import _band_box, _flat_moments

    radius = N // 8
    ctr = jnp.asarray([N / 3, N / 2, N / 2], jnp.float32)
    amp, om = radius / 2.0, 1.0 / radius

    def sdf(x, t):
        return jnp.sqrt(jnp.sum((x - ctr) ** 2)) - radius

    def map_fn(x, t):
        return x - jnp.stack([amp * jnp.sin(om * t), 0 * t, 0 * t])

    body = AutoBody(sdf, map_fn)
    sim = Simulation((N, N, N), (1.0, 0.0, 0.0), radius, nu=radius / 1e3,
                     body=body, dtype=jnp.float32)
    sim.sim_step_n(3, remeasure=True)      # settle band/K
    cfg = sim.flow.cfg
    box, sk = cfg.band_box, cfg.band_k
    eps_k, masks = float(sim.eps), sim.masks
    gm = sim._flat["g"]
    fstate = sim._flat["state"]
    print(f"# N={N} box={box} K={sk}", flush=True)

    def row(name, t):
        print(f"{name:28s} {t * 1e3:7.2f} ms", flush=True)

    def drive(t, dt=0.1):   # nudge t each rep to keep inputs distinct
        return t + dt

    t0 = jnp.asarray(1.0, jnp.float32)

    # measure_fill variants: carry = t (scalar), output folded to keep the
    # carry shape — use (t + tiny*field_probe) as the next carry
    def mf(t, sparse):
        V, m0, m1, sig = measure_fill(
            body, cfg.shape, t, eps_k, cfg.dtype, cfg.perdir, cfg.exit_bc,
            band_box=box, sparse_k=sk if sparse else None)[:4]
        return t + 0.1 + 0.0 * m0.reshape(-1)[0]

    row("measure sparse", scan_slope(lambda t: mf(t, True), t0))
    row("measure dense-box", scan_slope(lambda t: mf(t, False), t0))

    def raw_only(t):
        from waterlily_tpu.ops.grid import loc_grid
        sl = tuple(slice(a, b) for a, b in box)
        coords = loc_grid(None, cfg.shape, cfg.dtype)[(slice(None),) + sl]
        raw = jax.vmap(lambda x: body.sdf_at(x, t))(coords.reshape(3, -1).T)
        return t + 0.1 + 0.0 * raw[0]

    row("raw sdf sweep", scan_slope(raw_only, t0))

    # fixed measured fields for the downstream components
    V, m0, m1, sig = measure_fill(body, cfg.shape, t0, eps_k, cfg.dtype,
                                  cfg.perdir, cfg.exit_bc, band_box=box,
                                  sparse_k=sk)[:4]

    def upd(c, m0):
        levels = mg.update_mg(None, masks, m0 + 0.0 * c, cfg.perdir)
        return c + 0.1 + 0.0 * levels[-1].D.reshape(-1)[0]

    row("update_mg (re-restrict)", scan_slope(upd, t0, (m0,)))

    levels = mg.update_mg(None, masks, m0, cfg.perdir)

    def restack(c, levels):
        lv = [l._replace(D=l.D + 0.0 * c) for l in levels]
        fmg = mgflat._flatten_stack(tuple(lv), gm, masks)
        return c + 0.1 + 0.0 * fmg.fine.D.reshape(-1)[0]

    row("flat restack (+pinv)", scan_slope(restack, t0, (tuple(levels),)))

    # pinv alone: tail coarsest level
    tail = levels[-1]

    def pinv_only(c, tail):
        from waterlily_tpu.ops.poisson import dense_pinv
        lv = tail._replace(D=tail.D + 0.0 * c, Ainv=None)
        p = dense_pinv(lv, cfg.perdir)
        a = p.Ainv if p.Ainv is not None else p.D
        return c + 0.1 + 0.0 * a.reshape(-1)[0]

    row("dense_pinv (coarsest)", scan_slope(pinv_only, t0, (tail,)))

    def bb(c, V, m0, m1):
        band = _band_box(V + 0.0 * c, m0, m1, cfg.perdir, box)
        return c + 0.1 + 0.0 * band.reshape(-1)[0].astype(jnp.float32)

    row("_band_box", scan_slope(bb, t0, (V, m0, m1)))

    def fm(c, V, m0, m1, slab):
        d = _flat_moments(fstate, V + 0.0 * c, m0, m1, gm,
                          box if slab else None, cfg.shape)
        return c + 0.1 + 0.0 * d["mu0"].reshape(-1)[0]

    row("flat moments (slab)", scan_slope(lambda c, V, m0, m1: fm(c, V, m0, m1, True), t0, (V, m0, m1)))
    row("flat moments (full)", scan_slope(lambda c, V, m0, m1: fm(c, V, m0, m1, False), t0, (V, m0, m1)))




def insitu(N=128):
    """Full scan-iteration vs mom_step-only device times — the in-situ
    composition check (component sums can miss fusion/aliasing effects)."""
    import dataclasses

    from waterlily_tpu import AutoBody, Simulation
    from waterlily_tpu.models import flowflat as ff
    from waterlily_tpu.models.body import measure_fill
    from waterlily_tpu.ops import mgflat
    from waterlily_tpu.ops import multigrid as mg
    from waterlily_tpu.simulation import _band_box, _flat_moments

    radius = N // 8
    ctr = jnp.asarray([N / 3, N / 2, N / 2], jnp.float32)
    amp, om = radius / 2.0, 1.0 / radius
    body = AutoBody(
        lambda x, t: jnp.sqrt(jnp.sum((x - ctr) ** 2)) - radius,
        lambda x, t: x - jnp.stack([amp * jnp.sin(om * t), 0 * t, 0 * t]))
    sim = Simulation((N, N, N), (1.0, 0.0, 0.0), radius, nu=radius / 1e3,
                     body=body, dtype=jnp.float32)
    sim.sim_step_n(3, remeasure=True)
    cfg = sim.flow.cfg
    box = cfg.band_box
    eps_k, masks = float(sim.eps), sim.masks
    gm = sim._flat["g"]
    fstate = sim._flat["state"]
    fmg0 = sim._flat["fmg"]
    print(f"# insitu N={N} box={box}", flush=True)

    def row(name, t):
        print(f"{name:28s} {t * 1e3:7.2f} ms", flush=True)

    def step_only(carry):
        fstate, fmg, dt, t0 = carry
        fstate, dt_n, _, _ = ff.mom_step_flat_impl(cfg, fstate, fmg, masks,
                                                   gm, dt, t0)
        return (fstate, fmg, dt_n, t0 + dt)

    def full_iter(carry, with_restack=True, with_moments=True):
        fstate, fmg, dt, t0 = carry
        V, mu0, mu1, _ = measure_fill(body, cfg.shape, t0 + dt, eps_k,
                                      cfg.dtype, cfg.perdir, cfg.exit_bc,
                                      band_box=box)
        levels = mg.update_mg(None, masks, mu0, cfg.perdir)
        if with_restack:
            fmg = mgflat.restack_band(fmg, levels, gm, masks, box)
        if with_moments:
            fstate = dataclasses.replace(fstate, **_flat_moments(
                fstate, V, mu0, mu1, gm, box, cfg.shape))
        fstate, dt_n, _, _ = ff.mom_step_flat_impl(cfg, fstate, fmg, masks,
                                                   gm, dt, t0)
        return (fstate, fmg, dt_n, t0 + dt)

    c0 = (fstate, fmg0, jnp.asarray(sim.flow.dt[-1], jnp.float32),
          jnp.asarray(sim.time, jnp.float32))
    row("mom_step only", scan_slope(step_only, c0))
    row("full iter", scan_slope(full_iter, c0))
    row("iter no restack", scan_slope(
        lambda c: full_iter(c, with_restack=False), c0))
    row("iter no moments", scan_slope(
        lambda c: full_iter(c, with_moments=False), c0))
    row("iter measure+step only", scan_slope(
        lambda c: full_iter(c, with_restack=False, with_moments=False), c0))


if __name__ == "__main__":
    if "insitu" in sys.argv:
        insitu(int(sys.argv[2]) if len(sys.argv) > 2 else 128)
    else:
        main()
