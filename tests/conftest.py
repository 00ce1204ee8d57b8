"""Test configuration: force an 8-device virtual CPU platform.

This gives every test a multi-device environment ("multi-node without a
cluster") regardless of the hardware the suite runs on — the TPU chip is
reserved for benchmarks.  Must run before jax is imported anywhere.
"""

import os

# Force CPU. NOTE: setting JAX_PLATFORMS is NOT enough on this machine — a
# sitecustomize hook registers the tunneled TPU ("axon") PJRT plugin in
# every Python process and re-prioritizes it; per-op dispatch over that
# tunnel is slow, single-client, and reserved for bench runs.  The config
# update below wins because it runs before any backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Shrink InceptionV3 input in tests (random-init weights anyway): 16x less
# compute on this 1-core host; parity-relevant runs use real weights + 299.
os.environ.setdefault("PHENDIFF_INCEPTION_RESIZE", "75")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
# Persistent compile cache: UNet graphs take 20-80s to compile on this
# 1-core host; cache them across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/phendiff_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_image_root(tmp_path_factory):
    """A tiny 2-class imagefolder dataset (16 images/class, 32x32 RGB)."""
    from PIL import Image

    root = tmp_path_factory.mktemp("tiny_imagefolder")
    rg = np.random.default_rng(42)
    for cls in ("DMSO", "drug"):
        d = root / cls
        d.mkdir()
        for i in range(16):
            arr = rg.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"img_{i:03d}.png")
    return root
