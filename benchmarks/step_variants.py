"""Whole-step timing across solver/kernel tuning variants on real hardware.

Each variant times `mom_step_flat_impl` (warm state, settled dt) at N³ and
reports ms/step + Mcell/s + the settled per-solve iteration counts, so
tuning decisions (band-sparse BDIM, fine_smooth_it, smoother depth) are made
step-level numbers, not kernel microbenches.

Usage: python benchmarks/step_variants.py [N] [reps] [variant ...]
Variants: base band nb_fs2 band_fs2 band_fused  (default: band nb_fs2 band_fs2)
  base      full-field BDIM kernel, smoother defaults
  band      band-sparse BDIM (cfg.band_x from the measured sphere)
  nb_fs2    full-field BDIM, fine_smooth_it=2
  band_fs2  band + fine_smooth_it=2
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from waterlily_tpu.utils.cache import setup_compile_cache  # noqa: E402

setup_compile_cache()


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    variants = sys.argv[3:] or ["band", "nb_fs2", "band_fs2"]
    from waterlily_tpu import AutoBody, Simulation
    from waterlily_tpu.models import flowflat as ffm
    from waterlily_tpu.ops import pallas_flat as plf

    if jax.default_backend() == "cpu":
        plf._INTERPRET = True

    radius = N // 8
    ctr = jnp.asarray([N / 3, N / 2, N / 2], jnp.float32)
    body = AutoBody(lambda x, t: jnp.sqrt(jnp.sum((x - ctr) ** 2)) - radius)
    sim = Simulation((N, N, N), (1.0, 0.0, 0.0), radius, nu=radius / 1e3,
                     body=body, dtype=jnp.float32, engine="flat")
    sim.sim_step_n(3)      # settle dt, warm-start p
    g = sim._flat["g"]
    masks = sim.masks
    fmg = sim._flat["fmg"]
    state = sim._flat["state"]
    dt = jnp.asarray(sim.flow.dt[-1], jnp.float32)
    base_cfg = sim.flow.cfg
    print(f"# N={N}^3 reps={reps} band_x={base_cfg.band_x} "
          f"settled iters={sim.pois_n[-2:]}", flush=True)

    mods = {
        "base": dict(band_x=None),
        "band": dict(),
        "nb_fs2": dict(band_x=None, fine_smooth_it=2),
        "band_fs2": dict(fine_smooth_it=2),
        "band_fs3": dict(fine_smooth_it=3),
        "band_si3": dict(smooth_it=3),
        "band_si4": dict(smooth_it=4),
        "band_si5": dict(smooth_it=5),
        "band_si3fs5": dict(smooth_it=3, fine_smooth_it=5),
        "band_si4fs6": dict(smooth_it=4, fine_smooth_it=6),
        # round-4 solver-budget levers (auto TPU base is smooth_it=2 + mp)
        "band_nopre": dict(fine_presmooth=False),
        "band_fs1": dict(fine_smooth_it=1),
        "band_nopre_fs1": dict(fine_presmooth=False, fine_smooth_it=1),
        "band_nopre_si3": dict(fine_presmooth=False, smooth_it=3),
        "band_nompre": dict(mp_smooth=False),
    }
    # env-flag variants (read at trace time): name suffixes after '+'
    # e.g. "band+share" sets WLTPU_CONV_SHARE=1, "band+bx8" sets WLTPU_GS_BX=8
    probe = jax.jit(lambda st: st.u.reshape(-1)[0])
    for name in variants:
        base_name, *envs = name.split("+")
        os.environ.pop("WLTPU_CONV_SHARE", None)
        os.environ.pop("WLTPU_CONV_BX", None)
        os.environ.pop("WLTPU_BCDIV_BX", None)
        os.environ.pop("WLTPU_PROJ_BX", None)
        os.environ.pop("WLTPU_CONV_V2", None)
        os.environ.pop("WLTPU_GS_BX", None)
        os.environ.pop("WLTPU_GS_PIPE", None)
        os.environ.pop("WLTPU_INC_PIPE", None)
        for e in envs:
            if e.startswith("cbx"):
                os.environ["WLTPU_CONV_BX"] = e[3:]
            elif e.startswith("pbx"):
                os.environ["WLTPU_PROJ_BX"] = e[3:]
            elif e.startswith("dbx"):
                os.environ["WLTPU_BCDIV_BX"] = e[3:]
            elif e == "v1":
                os.environ["WLTPU_CONV_V2"] = "0"
            elif e == "share":
                os.environ["WLTPU_CONV_SHARE"] = "1"
            elif e == "pipe":
                os.environ["WLTPU_GS_PIPE"] = "1"
            elif e == "ipipe":
                os.environ["WLTPU_INC_PIPE"] = "1"
            elif e.startswith("bx"):
                os.environ["WLTPU_GS_BX"] = e[2:]
        cfg = dataclasses.replace(base_cfg, **mods[base_name])

        @jax.jit
        def step(state, fmg, dt):
            st, dt_n, it, _ = ffm.mom_step_flat_impl(cfg, state, fmg, masks,
                                                     g, dt, jnp.float32(0.0))
            return st, dt_n, it

        try:
            st, dt_n, it = step(state, fmg, dt)
            float(probe(st))
            t0 = time.perf_counter()
            float(probe(st))
            base = time.perf_counter() - t0
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                o = st
                for _ in range(reps):
                    o, dt_n, it = step(state, fmg, dt)
                float(probe(o))
                best = min(best, time.perf_counter() - t0 - base)
            ms = best / reps * 1e3
            print(f"{name:11s} {ms:8.2f} ms/step  {N**3 / (ms * 1e-3) / 1e6:7.1f}"
                  f" Mcell/s   iters={[int(v) for v in it]}", flush=True)
        except Exception as e:  # pragma: no cover
            print(f"{name:11s} FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
