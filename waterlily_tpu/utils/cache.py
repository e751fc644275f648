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

__all__ = ["setup_compile_cache"]


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
    if platform:
        jax.config.update("jax_platforms", platform)
    return d
