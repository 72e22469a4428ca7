import os

# Tests run on a virtual 8-device CPU mesh. The environment's sitecustomize
# registers the tunneled TPU backend in every process and forces
# jax_platforms to "axon,cpu", so env vars alone don't stick — override the
# config before any backend initializes (they init lazily on first use).
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()


# XLA:CPU compilation hygiene: the suite compiles hundreds of programs in
# one process, and XLA:CPU has been observed to SEGFAULT inside
# backend_compile after enough cumulative in-process compilation (the
# crash point drifts between runs; any single file passes alone).
# Two mitigations:
#  - a persistent SAME-HOST compile cache so repeat suite runs (and the
#    driver's) load instead of recompile — cross-machine AOT reloads are
#    the documented SIGILL hazard, so this dir is only ever written by
#    this host's CPU test runs;
#  - jax.clear_caches() after each test module, bounding live-executable
#    accumulation inside the process.
_cpu_cache = os.environ.get(
    "WVPK_TEST_COMPILE_CACHE",
    os.path.expanduser("~/.cache/wvpk-xla/cpu-tests"))
if _cpu_cache:
    os.makedirs(_cpu_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cpu_cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    yield
    jax.clear_caches()
