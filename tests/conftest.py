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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_backend_optimization_level" not in flags:
    # tests measure correctness, not speed: the light XLA:CPU pipeline cuts
    # per-test compile time ~30% (the suite is compile-dominated on the
    # 1-core driver host)
    flags = (flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# NO persistent compile cache on XLA:CPU: deserializing CPU AOT entries
# segfaults this host's jaxlib (reproduced twice at ~100 in-process
# compiles, stack in `compilation_cache.get_executable_and_time`; foreign-
# host entries additionally warn '+prefer-no-scatter not supported').  The
# TPU benchmarks keep their persistent cache (device-side executables
# deserialize fine) via `waterlily_tpu.utils.cache.setup_compile_cache`.


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _free_compiled_code_between_modules():
    """XLA:CPU JIT segfaults once the code emitted by ~100 live executables
    in one process crosses an addressing limit (reproduced 3x at the same
    suite position, same test, different cache settings; each crashing test
    passes standalone).  Dropping the jit caches between test modules frees
    the dead executables' code and keeps the suite under the limit."""
    yield
    import jax

    jax.clear_caches()
