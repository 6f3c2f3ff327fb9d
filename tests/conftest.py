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

# The native ogg-opus extension (moshi_tpu/moshi_native*.so) is built, not
# committed (.gitignore): build it on demand so a fresh checkout is green.
def _ensure_native_ext():
    import glob
    import pathlib
    import subprocess

    root = pathlib.Path(__file__).resolve().parent.parent
    if glob.glob(str(root / "moshi_tpu" / "moshi_native*.so")):
        return
    try:
        subprocess.run(["bash", str(root / "native" / "build.sh")],
                       check=True, capture_output=True, timeout=120)
    except Exception:
        pass  # tests that need it will fail with a clear ImportError


_ensure_native_ext()
