"""Test environment: force CPU with a virtual 8-device mesh so sharding
paths are exercised without a TPU pod (the TPU-native analogue of the
reference's synthetic-blobs 'fake backend', SURVEY.md §4)."""

import os

# NOTE: this environment's sitecustomize force-registers the axon TPU
# backend and re-exports JAX_PLATFORMS=axon, so the env var alone is not
# enough — the jax.config update below is what actually pins tests to CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def blob_dataset():
    from cvaegan_tpu.data.tabular import TabularDataset

    return TabularDataset.synthetic_blobs(seed=0)


@pytest.fixture(scope="session")
def imbalanced_dataset():
    from cvaegan_tpu.data.tabular import TabularDataset

    return TabularDataset.imbalanced_classification(seed=0)


@pytest.fixture()
def fast_settings():
    """Short epoch counts for smoke training runs."""
    from cvaegan_tpu.core import config as config_lib

    old_gan = config_lib.settings.gan.epochs
    old_clf = config_lib.settings.classifier.epochs
    old_paths = config_lib.settings.paths
    old_batch = config_lib.settings.gan.batch_size
    config_lib.settings.gan.epochs = 2
    config_lib.settings.classifier.epochs = 2
    yield config_lib.settings
    config_lib.settings.gan.epochs = old_gan
    config_lib.settings.classifier.epochs = old_clf
    config_lib.settings.gan.batch_size = old_batch
    config_lib.settings.paths = old_paths
