import os
import sys

# Run tests on a virtual 8-device CPU mesh. The axon TPU plugin (when
# present) force-updates jax_platforms to "axon,cpu" in sitecustomize, so
# an env var is not enough — re-update the config before first backend use.
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except ImportError:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
