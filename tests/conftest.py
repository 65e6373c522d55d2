import os

# Tests run on a virtual 8-device CPU mesh; env must be set before jax
# initializes its backends.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The axon TPU plugin (if present) force-selects itself through
# jax.config at interpreter startup, overriding JAX_PLATFORMS; undo that
# so unit tests run on the virtual CPU mesh.
import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
