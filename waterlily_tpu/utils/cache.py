"""Persistent-compile-cache setup shared by the bench/profiling entry points.

TPU executables are portable across hosts (they run device-side), so they
share one cache dir — critical here because the first 256³ compile on the
tunneled backend is ~10 min.  XLA:CPU AOT results are NOT portable: they
encode the compile machine's ISA and can SEGFAULT when loaded on a host
missing those features (observed with entries written by the remote-compile
service into a home dir shared with this host), so the CPU cache dir is
scoped by a cpuinfo-flags fingerprint.
"""
from __future__ import annotations

import hashlib
import os

import jax

__all__ = ["setup_compile_cache", "strip_mosaic_locations"]


def strip_mosaic_locations() -> None:
    """Make persistent-cache keys insensitive to source-location churn.

    JAX's cache key strips debug info from the OUTER stablehlo module, but a
    Pallas kernel's Mosaic payload (the serialized MLIR inside the
    `tpu_custom_call` backend config) keeps its locations — so ANY line shift
    in a traced file (even a comment reflow) used to produce a different key
    and a cold 256³ compile (~10 min on the tunneled backend; this is what
    zeroed the round-4 driver benchmark).  Monkey-patch the Mosaic
    serialization entry to round-trip the module through location-free
    bytecode first: byte-identical payloads → stable keys across pure code
    motion.  Verified: line shifts and file renames of a kernel no longer
    change the key; logic changes still do.  Cost: one asm round trip per
    pallas_call lowering (ms).  Mosaic error messages lose line info;
    disable with WLTPU_STRIP_LOCS=0 when debugging a kernel crash.
    """
    if os.environ.get("WLTPU_STRIP_LOCS", "1") == "0":
        return
    try:
        import jax._src.tpu_custom_call as tcc
        from jax._src.lib.mlir import ir
    except ImportError:  # pragma: no cover - future jax refactors
        return
    if getattr(tcc, "_wltpu_locs_stripped", False):
        return
    orig = tcc._lower_mosaic_module_to_asm

    def patched(module, **kw):
        try:
            with module.context:
                module = ir.Module.parse(module.operation.get_asm(
                    binary=True, enable_debug_info=False))
        except Exception:  # pragma: no cover - fall back to located module
            pass
        return orig(module, **kw)

    tcc._lower_mosaic_module_to_asm = patched
    tcc._wltpu_locs_stripped = True


def _cpu_fingerprint() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((l for l in f if l.startswith("flags")), "")
    except OSError:  # pragma: no cover
        flags = ""
    return hashlib.sha1(flags.encode()).hexdigest()[:10]


def setup_compile_cache(platform: str | None = None) -> str:
    """Point jax at the right persistent cache dir and return it.

    ``platform``: "cpu" → host-scoped dir; anything else (or None, meaning
    whatever backend jax resolves — normally the TPU) → the shared dir.
    """
    if platform is None:
        platform = os.environ.get("WLTPU_PLATFORM", "")
    if platform == "cpu":
        # NO persistent cache on XLA:CPU — deserializing CPU AOT entries
        # segfaults this jaxlib (see tests/conftest.py note)
        jax.config.update("jax_platforms", platform)
        return ""
    d = os.path.expanduser("~/.cache/jax_comp_cache")
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    strip_mosaic_locations()
    if platform:
        jax.config.update("jax_platforms", platform)
    return d
