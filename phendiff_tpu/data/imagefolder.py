"""Host-side image-folder dataset → device-prefetched batch pipeline.

Capability parity with the reference's dataset layer
(``src/utils_dataset.py``):

* ``ImageFolder`` semantics: one subdirectory per class, sorted class names
  → integer labels (``utils_dataset.py:104-118``);
* transforms: bilinear resize to ``definition``, scale to [-1, 1], optional
  random horizontal/vertical flips on the fly (``:104-118``);
* a parallel "raw" view (resize only, uint8) used as the FID reference set
  (``NoLabelsDataset``, ``:28-47``);
* class-balanced subsampling to ``perc_samples``% per class with a
  dedicated seed, asserting balance (``_select_subset_of_dataset``,
  ``:141-217``).

TPU-first design: instead of torch DataLoader worker processes, a
single-pass numpy pipeline with background-thread prefetch; batches are
yielded as numpy NHWC and the train loop places them onto the device mesh
(sharded along the batch axis).  Decode/resize can optionally run through
the native C++ kernel in ``phendiff_tpu/data/native.py`` when built.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
from pathlib import Path
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

IMG_EXTENSIONS = {".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff", ".webp"}


@dataclasses.dataclass(frozen=True)
class DatasetIndex:
    """Immutable file index: paths, integer labels, class names."""

    paths: Tuple[str, ...]
    labels: Tuple[int, ...]
    classes: Tuple[str, ...]

    def __len__(self) -> int:
        return len(self.paths)

    @property
    def nb_classes(self) -> int:
        return len(self.classes)

    def class_counts(self) -> np.ndarray:
        return np.bincount(np.array(self.labels), minlength=self.nb_classes)

    def subset(self, indices: Sequence[int]) -> "DatasetIndex":
        return DatasetIndex(
            paths=tuple(self.paths[i] for i in indices),
            labels=tuple(self.labels[i] for i in indices),
            classes=self.classes,
        )

    def for_class(self, label: int) -> "DatasetIndex":
        idx = [i for i, l in enumerate(self.labels) if l == label]
        return self.subset(idx)


def scan_imagefolder(root) -> DatasetIndex:
    root = Path(root)
    if not root.is_dir():
        raise FileNotFoundError(f"dataset root not found: {root}")
    classes = sorted(d.name for d in root.iterdir() if d.is_dir())
    if not classes:
        raise ValueError(f"no class subdirectories under {root}")
    paths: List[str] = []
    labels: List[int] = []
    for ci, cname in enumerate(classes):
        files = sorted(
            p for p in (root / cname).rglob("*")
            if p.suffix.lower() in IMG_EXTENSIONS
        )
        paths.extend(str(p) for p in files)
        labels.extend([ci] * len(files))
    if not paths:
        raise ValueError(f"no images found under {root}")
    return DatasetIndex(tuple(paths), tuple(labels), tuple(classes))


def balanced_subsample(
    index: DatasetIndex, perc_samples: float, seed: int
) -> DatasetIndex:
    """Keep ``perc_samples``% of each class, chosen with a dedicated RNG so
    resumed runs see the same subset (reference ``utils_dataset.py:141-217``,
    including its balance assertion)."""
    if not 0 < perc_samples <= 100:
        raise ValueError("perc_samples must be in (0, 100]")
    if perc_samples == 100:
        return index
    counts = index.class_counts()
    if not np.all(counts == counts[0]):
        raise ValueError(
            f"balanced_subsample requires a class-balanced dataset; got {counts}"
        )
    per_class = max(1, round(counts[0] * perc_samples / 100))
    rng = np.random.default_rng(seed)
    keep: List[int] = []
    labels = np.array(index.labels)
    for ci in range(index.nb_classes):
        cls_idx = np.nonzero(labels == ci)[0]
        keep.extend(rng.choice(cls_idx, size=per_class, replace=False).tolist())
    keep.sort()
    return index.subset(keep)


def _resize_bilinear(img: Image.Image, definition: Tuple[int, int]) -> Image.Image:
    # PIL wants (W, H); definition is (H, W) like the reference flag.
    return img.resize((definition[1], definition[0]), Image.BILINEAR)


def decode_image(path: str) -> np.ndarray:
    """Decode to HWC uint8 at native resolution (PIL handles the format zoo;
    everything after the decode runs through the native C++ kernels)."""
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def load_image(
    path: str, definition: Tuple[int, int], normalize: bool = True
) -> np.ndarray:
    """Decode + resize one image. normalize=True → float32 in [-1, 1];
    False → the 'raw' uint8 stream used as the metrics reference."""
    from phendiff_tpu.data import native

    raw = decode_image(path)
    if not normalize:
        return native.resize_u8(raw, definition)
    return native.resize_normalize(raw, definition, normalize=True)


@dataclasses.dataclass
class LoaderConfig:
    batch_size: int = 16
    definition: Tuple[int, int] = (128, 128)
    normalize: bool = True
    # "f32": ship normalized [-1,1] float32 batches (default).  "uint8":
    # quantize the resized pixels back to uint8 in the producer thread and
    # ship those (4x fewer bytes over a host→device tunnel; the train step
    # normalizes on device).  The quantization matches torchvision's
    # Resize→ToTensor in the reference transform (utils_dataset.py:104-118),
    # which also rounds to uint8 after the resize.
    transport: str = "f32"
    random_flip: bool = False  # H and V flips, each with p=0.5 (data_aug_on_the_fly)
    shuffle: bool = True
    drop_last: bool = True
    seed: int = 0
    prefetch: int = 2
    num_shards: int = 1  # data-parallel process count
    shard_index: int = 0


class ImageFolderLoader:
    """Epoch-based batch iterator over a DatasetIndex.

    Deterministic given (seed, epoch): resume can skip already-consumed
    batches exactly (the reference's resume semantics,
    ``utils_training.py:57-96``) by re-creating the epoch iterator and
    slicing — no mutable DataLoader state to checkpoint.
    """

    def __init__(self, index: DatasetIndex, config: LoaderConfig):
        self.index = index
        self.config = config

    def __len__(self) -> int:  # batches per epoch for this shard
        n = len(self.index) // self.config.num_shards
        if self.config.drop_last:
            return n // self.config.batch_size
        return -(-n // self.config.batch_size)

    def _epoch_order(self, epoch: int) -> np.ndarray:
        order = np.arange(len(self.index))
        if self.config.shuffle:
            rng = np.random.default_rng((self.config.seed, epoch))
            rng.shuffle(order)
        # contiguous shard split (all shards agree on the permutation)
        n = len(order) // self.config.num_shards
        start = self.config.shard_index * n
        return order[start : start + n]

    def _make_batch(
        self, idxs: np.ndarray, rng: np.random.Generator
    ) -> Tuple[np.ndarray, np.ndarray]:
        cfg = self.config
        labels = np.array([self.index.labels[i] for i in idxs], dtype=np.int32)
        if cfg.normalize:
            # decode (PIL) → batched native resize/normalize/flip (C++)
            from phendiff_tpu.data import native

            raws = [decode_image(self.index.paths[i]) for i in idxs]
            flips = None
            if cfg.random_flip:
                flips = (rng.random((len(idxs), 2)) < 0.5).astype(np.int32)
            imgs = native.batch_resize_normalize(
                raws, cfg.definition, flips=flips
            )
            if cfg.transport == "uint8":
                # quantize in the producer thread (overlapped with device
                # work); the train step de-quantizes on device
                imgs = np.clip(
                    np.round((imgs + 1.0) * 127.5), 0, 255
                ).astype(np.uint8)
        else:
            imgs = np.stack(
                [load_image(self.index.paths[i], cfg.definition, False) for i in idxs]
            )
        return imgs, labels

    def epoch(
        self, epoch: int = 0, skip_batches: int = 0
    ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        cfg = self.config
        order = self._epoch_order(epoch)
        nb = len(self)
        rng = np.random.default_rng((cfg.seed, epoch, cfg.shard_index, 1))

        def producer(q: queue.Queue):
            try:
                for b in range(skip_batches, nb):
                    idxs = order[b * cfg.batch_size : (b + 1) * cfg.batch_size]
                    if len(idxs) == 0:
                        break
                    q.put(self._make_batch(idxs, rng))
            finally:
                q.put(None)

        q: queue.Queue = queue.Queue(maxsize=max(cfg.prefetch, 1))
        t = threading.Thread(target=producer, args=(q,), daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                return
            yield item

    def all_images(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Sequential un-shuffled pass over the full (un-sharded) index."""
        cfg = self.config
        rng = np.random.default_rng(0)
        n = len(self.index)
        for start in range(0, n, cfg.batch_size):
            idxs = np.arange(start, min(start + cfg.batch_size, n))
            yield self._make_batch(idxs, rng)
