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


# Quick tier: modules dominated by interpret-mode Pallas kernels or
# multi-round golden runs are marked slow so `-m "not slow"` gives a
# ~2-minute signal during iteration (full suite ~9 min on 2 CPUs).
_SLOW_MODULES = {
    "test_viterbi_funnel", "test_mesh_consistency", "test_posterior_batch",
    "test_realign_device", "test_multidb_golden", "test_multidb_dbs",
    "test_viterbi_rows", "test_viterbi_lanes", "test_merge_interim",
    "test_hhblits_iterative", "test_hhblits_golden",
    "test_prefilter_pallas", "test_prefilter_pallas2",
}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        if item.module.__name__ in _SLOW_MODULES:
            item.add_marker(_pytest.mark.slow)
