"""HF-datasets ingestion tests (capability the reference stubs out with
NotImplementedError, utils_dataset.py:58-65)."""

import numpy as np
import pytest

datasets = pytest.importorskip("datasets")

from phendiff_tpu.data.hf_datasets import HFDatasetAdapter, load_hf_imagefolder
from phendiff_tpu.data.imagefolder import LoaderConfig


@pytest.fixture(scope="module")
def hf_ds():
    from PIL import Image

    rng = np.random.default_rng(0)
    imgs = [
        Image.fromarray(rng.integers(0, 255, (24, 24, 3), dtype=np.uint8))
        for _ in range(12)
    ]
    labels = [i % 2 for i in range(12)]
    return datasets.Dataset.from_dict(
        {"image": imgs, "label": labels}
    ).cast_column(
        "label", datasets.ClassLabel(names=["DMSO", "drug"])
    ).cast_column("image", datasets.Image())


def test_adapter_batches(hf_ds):
    adapter = HFDatasetAdapter(
        hf_ds, LoaderConfig(batch_size=4, definition=(16, 16), seed=0)
    )
    assert adapter.classes == ("DMSO", "drug")
    assert len(adapter) == 3
    batches = list(adapter.epoch(0))
    assert len(batches) == 3
    imgs, labels = batches[0]
    assert imgs.shape == (4, 16, 16, 3) and imgs.dtype == np.float32
    assert imgs.min() >= -1.0 and imgs.max() <= 1.0
    assert labels.dtype == np.int32


def test_adapter_determinism_and_skip(hf_ds):
    cfg = LoaderConfig(batch_size=4, definition=(16, 16), seed=5)
    a = HFDatasetAdapter(hf_ds, cfg)
    e0 = list(a.epoch(0))
    e0b = list(a.epoch(0))
    np.testing.assert_array_equal(e0[1][1], e0b[1][1])
    skipped = list(a.epoch(0, skip_batches=1))
    np.testing.assert_array_equal(skipped[0][1], e0[1][1])


def test_load_hf_imagefolder(tiny_image_root):
    adapter = load_hf_imagefolder(
        str(tiny_image_root),
        LoaderConfig(batch_size=8, definition=(16, 16)),
    )
    assert adapter.classes == ("DMSO", "drug")
    imgs, labels = next(iter(adapter.epoch(0)))
    assert imgs.shape == (8, 16, 16, 3)
    assert set(np.unique(labels)) <= {0, 1}
