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
