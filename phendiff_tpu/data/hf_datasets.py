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
        if hasattr(feat, "names"):  # ClassLabel: values are 0..n-1 already
            self.classes: Tuple[str, ...] = tuple(feat.names)
            self._label_map = None
        else:
            # plain integer/str label column: remap raw values to dense
            # 0..n-1 positions (numeric order when possible) so class
            # indices, names, and the Evaluator's per-class pairing agree
            raw = sorted(
                set(self.dataset[self.label_key]),
                key=lambda v: (0, int(v)) if str(v).lstrip("-").isdigit()
                else (1, str(v)),
            )
            self.classes = tuple(str(v) for v in raw)
            self._label_map = {v: i for i, v in enumerate(raw)}

    def _map_labels(self, values) -> np.ndarray:
        if self._label_map is None:
            return np.asarray(values, dtype=np.int32)
        return np.asarray([self._label_map[v] for v in values], dtype=np.int32)

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
            labels = self._map_labels(rows[self.label_key])
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


    # -- evaluation support (mirrors DatasetIndex/ImageFolderLoader) --------
    def for_class(self, class_label: int) -> "HFDatasetAdapter":
        """Adapter restricted to one class (Evaluator reference features).

        ``class_label`` is the dense 0..n-1 index; for non-ClassLabel
        columns it is translated back to the raw label value before
        filtering."""
        if self._label_map is None:
            pred = lambda l: int(l) == int(class_label)
        else:
            target = {i: v for v, i in self._label_map.items()}[int(class_label)]
            pred = lambda l: l == target
        sub = self.dataset.filter(pred, input_columns=self.label_key)
        return HFDatasetAdapter(sub, self.config, self.image_key, self.label_key)

    def raw_images(
        self, batch_size: int, definition: Tuple[int, int]
    ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Sequential un-shuffled uint8 pass (metrics reference stream)."""
        n = len(self.dataset)
        for start in range(0, n, batch_size):
            idxs = list(range(start, min(start + batch_size, n)))
            rows = self.dataset[idxs]
            raws = [_to_uint8_rgb(im) for im in rows[self.image_key]]
            labels = self._map_labels(rows[self.label_key])
            imgs = np.stack([native.resize_u8(r, definition) for r in raws])
            yield imgs, labels


def load_hf_imagefolder(
    path: str, config: LoaderConfig, split: str = "train",
    image_key: str = "image", label_key: str = "label",
) -> HFDatasetAdapter:
    """``datasets.load_dataset("imagefolder", data_dir=path)`` → adapter."""
    import datasets

    ds = datasets.load_dataset("imagefolder", data_dir=path, split=split)
    return HFDatasetAdapter(ds, config, image_key, label_key)


def load_hf_dataset(
    name: str, config: LoaderConfig, *, split: str = "train",
    config_name: Optional[str] = None, cache_dir: Optional[str] = None,
    image_key: str = "image", label_key: str = "label",
) -> HFDatasetAdapter:
    """Load any HF dataset by name/path (the reference's --dataset_name /
    --dataset_config_name / --split / --cache_dir surface).

    A local directory of class subfolders loads as an "imagefolder"; an
    arrow dataset on disk loads directly; anything else is treated as a
    hub id (which requires network access).
    """
    import os

    import datasets

    if os.path.isdir(name):
        # on-disk arrow: Dataset.save_to_disk writes dataset_info.json +
        # *.arrow at the top level; DatasetDict.save_to_disk writes only
        # dataset_dict.json with per-split subdirectories
        if (
            os.path.exists(os.path.join(name, "dataset_info.json"))
            or os.path.exists(os.path.join(name, "dataset_dict.json"))
            or any(f.endswith(".arrow") for f in os.listdir(name))
        ):
            ds = datasets.load_from_disk(name)
            if isinstance(ds, datasets.DatasetDict):
                ds = ds[split] if split else ds[next(iter(ds))]
        else:
            ds = datasets.load_dataset(
                "imagefolder", data_dir=name, split=split or "train",
                cache_dir=cache_dir,
            )
    else:
        ds = datasets.load_dataset(
            name, config_name, split=split or "train", cache_dir=cache_dir
        )
    return HFDatasetAdapter(ds, config, image_key, label_key)
