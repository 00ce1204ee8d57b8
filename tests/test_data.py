"""Dataset layer tests (reference parity: utils_dataset.py behavior)."""

import numpy as np
import pytest

from phendiff_tpu.data import (
    DatasetIndex,
    ImageFolderLoader,
    LoaderConfig,
    balanced_subsample,
    load_image,
    scan_imagefolder,
)


def test_scan_imagefolder(tiny_image_root):
    idx = scan_imagefolder(tiny_image_root)
    assert idx.classes == ("DMSO", "drug")  # sorted class names → labels
    assert len(idx) == 32
    np.testing.assert_array_equal(idx.class_counts(), [16, 16])


def test_scan_missing_root():
    with pytest.raises(FileNotFoundError):
        scan_imagefolder("/nonexistent/path")


def test_balanced_subsample_deterministic(tiny_image_root):
    idx = scan_imagefolder(tiny_image_root)
    a = balanced_subsample(idx, 50, seed=7)
    b = balanced_subsample(idx, 50, seed=7)
    assert a.paths == b.paths  # resume reproducibility
    np.testing.assert_array_equal(a.class_counts(), [8, 8])
    c = balanced_subsample(idx, 50, seed=8)
    assert a.paths != c.paths


def test_balanced_subsample_requires_balance(tiny_image_root):
    idx = scan_imagefolder(tiny_image_root)
    unbal = idx.subset(range(len(idx) - 3))
    with pytest.raises(ValueError):
        balanced_subsample(unbal, 50, seed=0)


def test_load_image_normalized_and_raw(tiny_image_root):
    idx = scan_imagefolder(tiny_image_root)
    norm = load_image(idx.paths[0], (16, 16), normalize=True)
    assert norm.shape == (16, 16, 3) and norm.dtype == np.float32
    assert norm.min() >= -1.0 and norm.max() <= 1.0
    raw = load_image(idx.paths[0], (16, 16), normalize=False)
    assert raw.dtype == np.uint8 and raw.shape == (16, 16, 3)


def test_loader_epoch_determinism_and_skip(tiny_image_root):
    idx = scan_imagefolder(tiny_image_root)
    cfg = LoaderConfig(batch_size=4, definition=(16, 16), seed=3)
    loader = ImageFolderLoader(idx, cfg)
    assert len(loader) == 8
    e0 = list(loader.epoch(0))
    e0b = list(loader.epoch(0))
    for (xa, ya), (xb, yb) in zip(e0, e0b):
        np.testing.assert_array_equal(xa, xb)
        np.testing.assert_array_equal(ya, yb)
    # exact-resume: skipping k batches matches the tail of the full epoch
    skipped = list(loader.epoch(0, skip_batches=3))
    assert len(skipped) == 5
    np.testing.assert_array_equal(skipped[0][1], e0[3][1])
    # different epoch → different order
    e1 = list(loader.epoch(1))
    assert any(
        not np.array_equal(a[1], b[1]) for a, b in zip(e0, e1)
    )


def test_loader_sharding_partitions(tiny_image_root):
    idx = scan_imagefolder(tiny_image_root)
    seen = []
    for shard in range(2):
        cfg = LoaderConfig(
            batch_size=4, definition=(16, 16), seed=3, num_shards=2, shard_index=shard
        )
        loader = ImageFolderLoader(idx, cfg)
        assert len(loader) == 4
        for _, labels in loader.epoch(0):
            seen.append(labels)
    total = np.concatenate(seen)
    assert total.shape[0] == 32  # shards together cover the whole epoch


def test_random_flip_changes_images(tiny_image_root):
    idx = scan_imagefolder(tiny_image_root)
    base = LoaderConfig(batch_size=8, definition=(16, 16), seed=1, shuffle=False)
    flip = LoaderConfig(
        batch_size=8, definition=(16, 16), seed=1, shuffle=False, random_flip=True
    )
    x0, _ = next(iter(ImageFolderLoader(idx, base).epoch(0)))
    x1, _ = next(iter(ImageFolderLoader(idx, flip).epoch(0)))
    assert not np.allclose(x0, x1)
    # flips preserve the pixel multiset
    np.testing.assert_allclose(np.sort(x0.ravel()), np.sort(x1.ravel()))
