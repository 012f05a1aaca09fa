"""Test configuration: force an 8-device virtual CPU mesh.

Sharded code paths are tested without TPU hardware by splitting the host
CPU into 8 XLA devices — the JAX equivalent of a fake multi-node backend
(SURVEY.md §4).  Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_backend_optimization_level" not in flags:
    # the suite is XLA:CPU-compile-bound (DUALCNN init alone is 29 s at the
    # default level, 7 s at level 0); tests assert semantics, not CPU speed
    flags = (flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = flags

import jax

# the env var alone can be overridden by an ambient TPU plugin in this
# environment; the config update is authoritative
jax.config.update("jax_platforms", "cpu")

# the suite is dominated by XLA:CPU compiles of the model-family graphs;
# persist them so iterating on tests costs seconds, not 18 minutes
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("HYPELCNN_TEST_CACHE", "/tmp/hypelcnn_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def synthetic_loader():
    from hypelcnn_tpu.data.loaders.synthetic import SyntheticDataLoader
    return SyntheticDataLoader("synthetic://?h=48&w=64&bands=12&classes=5&seed=3")


@pytest.fixture(scope="session")
def small_scene(synthetic_loader):
    return synthetic_loader.load_data(neighborhood=1, normalize=True)


@pytest.fixture(scope="session")
def small_samples(synthetic_loader):
    np.random.seed(0)
    return synthetic_loader.load_samples(train_data_ratio=0.5, test_data_ratio=0.1)
