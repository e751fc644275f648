"""Test harness configuration.

All tests run on a virtual 8-device CPU mesh so that sharding paths are
exercised without TPU hardware (mirrors the reference's backend-matrix harness,
`/root/reference/test/runtests.jl:22-33`; our backend axis is
{single-device, 8-device-mesh} instead of {Array, CuArray, ROCArray}).

Note: the env-var form `JAX_PLATFORMS=cpu` is overridden by the TPU plugin in
this environment, so the platform is forced through `jax.config` instead.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compile cache: the shard_map/while_loop solver programs dominate
# suite wall time on CPU; warm runs skip them entirely.  The dir is scoped by
# a CPU-feature fingerprint — XLA:CPU AOT results encode the compile
# machine's ISA and SEGFAULT when another host (e.g. the remote-compile
# service sharing this home dir) wrote entries with features this host
# lacks.
import hashlib  # noqa: E402

try:
    with open("/proc/cpuinfo") as _f:
        _flags = next((l for l in _f if l.startswith("flags")), "")
except OSError:  # pragma: no cover
    _flags = ""
_fp = hashlib.sha1(_flags.encode()).hexdigest()[:10]
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser(f"~/.cache/jax_cache_cpu_{_fp}"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
