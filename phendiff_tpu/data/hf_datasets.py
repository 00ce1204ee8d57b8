"""HuggingFace-datasets ingestion.

The reference's HF-datasets path exists but raises NotImplementedError
(``utils_dataset.py:58-65, 79-88, 134-136``).  This module implements it:
an HF dataset (imagefolder-style or any dataset with image+label columns)
is adapted to the same batch pipeline as ``ImageFolderLoader`` — decode to
numpy, then the native C++ resize/normalize/flip kernels.

Works with on-disk arrow datasets and ``load_dataset("imagefolder", ...)``
outputs; zero-egress environments can load from local paths.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Optional, Sequence, Tuple

import numpy as np

from phendiff_tpu.data import native
from phendiff_tpu.data.imagefolder import LoaderConfig


def _to_uint8_rgb(img) -> np.ndarray:
    """PIL image / array → HWC uint8 RGB."""
    if hasattr(img, "convert"):  # PIL
        return np.asarray(img.convert("RGB"), dtype=np.uint8)
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    if arr.dtype != np.uint8:
        arr = np.clip(arr, 0, 255).astype(np.uint8)
    return arr


@dataclasses.dataclass
class HFDatasetAdapter:
    """Adapts an HF dataset to the batch-loader interface.

    ``class_names`` mirrors ``DatasetIndex.classes`` (taken from the label
    feature's names when present).
    """

    dataset: "object"  # datasets.Dataset
    config: LoaderConfig
    image_key: str = "image"
    label_key: str = "label"

    def __post_init__(self):
        feat = self.dataset.features.get(self.label_key)
        self.classes: Tuple[str, ...] = (
            tuple(feat.names) if hasattr(feat, "names") else
            tuple(sorted({str(l) for l in self.dataset[self.label_key]}))
        )

    def __len__(self) -> int:
        n = len(self.dataset) // self.config.num_shards
        if self.config.drop_last:
            return n // self.config.batch_size
        return -(-n // self.config.batch_size)

    @property
    def nb_classes(self) -> int:
        return len(self.classes)

    def _epoch_order(self, epoch: int) -> np.ndarray:
        order = np.arange(len(self.dataset))
        if self.config.shuffle:
            rng = np.random.default_rng((self.config.seed, epoch))
            rng.shuffle(order)
        n = len(order) // self.config.num_shards
        start = self.config.shard_index * n
        return order[start : start + n]

    def epoch(self, epoch: int = 0, skip_batches: int = 0
              ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        cfg = self.config
        order = self._epoch_order(epoch)
        rng = np.random.default_rng((cfg.seed, epoch, cfg.shard_index, 1))
        for b in range(skip_batches, len(self)):
            idxs = order[b * cfg.batch_size : (b + 1) * cfg.batch_size]
            if len(idxs) == 0:
                return
            rows = self.dataset[[int(i) for i in idxs]]
            raws = [_to_uint8_rgb(im) for im in rows[self.image_key]]
            labels = np.asarray(rows[self.label_key], dtype=np.int32)
            if cfg.normalize:
                flips = None
                if cfg.random_flip:
                    flips = (rng.random((len(idxs), 2)) < 0.5).astype(np.int32)
                imgs = native.batch_resize_normalize(
                    raws, cfg.definition, flips=flips
                )
            else:
                imgs = np.stack(
                    [native.resize_u8(r, cfg.definition) for r in raws]
                )
            yield imgs, labels


def load_hf_imagefolder(
    path: str, config: LoaderConfig, split: str = "train",
    image_key: str = "image", label_key: str = "label",
) -> HFDatasetAdapter:
    """``datasets.load_dataset("imagefolder", data_dir=path)`` → adapter."""
    import datasets

    ds = datasets.load_dataset("imagefolder", data_dir=path, split=split)
    return HFDatasetAdapter(ds, config, image_key, label_key)
