import os

# Tests run on a virtual multi-device CPU topology; flags must be set before
# the jax backend initializes.  Note: the axon TPU plugin prepends itself to
# JAX_PLATFORMS, so the env var alone is not enough — use jax.config.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
