"""Evaluation: per-class generation → FID/ISC/KID → best-model tracking.

Capability parity with the reference's eval engine
(``utils_training.py:576-1001``):

* swap EMA weights in for inference (here: simply *use* the EMA tree —
  no store/copy_to mutation, fixing the missing-restore quirk noted in
  SURVEY.md §3.2);
* fixed eval seed (``rng.EVAL_SEED``) for reproducible sample panels;
* per-class generation batches; unconditional mode when
  ``proba_uncond == 1`` (single pseudo-class, ``:705-717``);
* per-class FID/ISC/KID against the raw dataset stream with persistent
  reference-feature caching keyed by class name (``:947-1001``);
* best-model = lower mean ``main_metric`` across classes, initialized to
  +inf (``utils_misc.py:350-370``).

TPU-native difference: generated images stay on device through the
Inception feature extractor — features are gathered, not PNG files
(the reference round-trips through disk between ranks, ``:712-766``).
Sample panels are still written via the tracker for human review.
"""

from __future__ import annotations

import dataclasses
import hashlib
import logging
import math
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from phendiff_tpu.core.rng import EVAL_SEED
from phendiff_tpu.data.imagefolder import DatasetIndex, ImageFolderLoader, LoaderConfig
from phendiff_tpu.metrics.fidelity import FeatureCache, MetricsConfig, calculate_metrics
from phendiff_tpu.metrics.inception import InceptionExtractor
from phendiff_tpu.pipelines.conditional_ddim import to_images

Array = jax.Array

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class EvalConfig:
    # Reference default (args_parser.py:222-228): 1000 generated images per
    # class — enough for a usable FID and for KID's subset_size=1000.
    nb_generated_images: int = 1000
    eval_batch_size: int = 32
    num_inference_steps: int = 50
    guidance_factor: float = 0.0  # CFG weight used for eval generation
    main_metric: str = "frechet_inception_distance"  # lower is better
    metrics: MetricsConfig = dataclasses.field(default_factory=MetricsConfig)
    unconditional: bool = False  # proba_uncond == 1 mode


def get_initial_best_metric() -> float:
    return math.inf


def is_it_best_model(current: float, best: float) -> bool:
    """Lower-is-better (utils_misc.py:350-366)."""
    return current < best


class Evaluator:
    def __init__(
        self,
        config: EvalConfig,
        raw_index: DatasetIndex,  # un-normalized reference set
        definition,
        cache_root: Optional[str] = None,
        extractor: Optional[InceptionExtractor] = None,
        shard_fn: Optional[Callable] = None,  # labels -> mesh-sharded labels
    ):
        self.config = config
        self.raw_index = raw_index
        self.definition = definition
        self.extractor = extractor or InceptionExtractor()
        self.cache = FeatureCache(cache_root) if cache_root else None
        if not getattr(self.extractor, "pretrained", True):
            logger.warning(
                "InceptionV3 is RANDOM-INIT (no pretrained weights found): "
                "FID/ISC/KID values are not comparable to torch-fidelity or "
                "across machines, and best-model selection runs on "
                "random-projection features. Provide a converted weights "
                "file (metrics/inception.py convert_torch_weights) for "
                "reference-parity metrics."
            )
        cfg = config
        if cfg.metrics.kid and cfg.nb_generated_images < cfg.metrics.kid_subset_size:
            logger.warning(
                "KID will be SKIPPED: nb_generated_images=%d < "
                "kid_subset_size=%d (reference behavior is a silent skip; "
                "raise nb_generated_images or lower kid_subset_size).",
                cfg.nb_generated_images, cfg.metrics.kid_subset_size,
            )
        if cfg.metrics.fid and cfg.nb_generated_images < 500:
            logger.warning(
                "FID over %d samples is high-variance; the reference "
                "default is 1000 per class.", cfg.nb_generated_images,
            )
        # Sharding the label batch over the mesh makes the whole generation
        # scan data-parallel (the TPU-native version of the reference's
        # per-rank eval-batch sharding, utils_training.py:128-139).
        self.shard_fn = shard_fn or (lambda x: x)

    # -- reference features (cached per class) -----------------------------
    def _cache_key(self, class_label: int, class_name: str) -> str:
        """Cache key tied to the reference-set identity, not just the class
        name: the same shared ``.fidelity_cache`` may be hit by runs with
        different definitions, perc_samples subsets, or dataset sources —
        a name-only key silently reuses features of the wrong reference
        distribution.  Derived WITHOUT materializing the per-class subset:
        on the HF route ``for_class`` runs a full ``datasets.filter`` scan,
        which must only happen on cache misses (inside ``compute``)."""
        h = hashlib.md5()
        h.update(repr(self.definition).encode())
        if isinstance(self.raw_index, DatasetIndex):
            # per-class path list (cheap: list filtering, no IO)
            for p in self.raw_index.for_class(class_label).paths:
                h.update(p.encode())
        else:  # HF adapter: parent fingerprint + class label identify it
            ds = self.raw_index.dataset
            h.update(str(getattr(ds, "_fingerprint", len(ds))).encode())
            h.update(str(class_label).encode())
        return f"{class_name}_{h.hexdigest()[:10]}"

    def _reference_features(self, class_label: int, class_name: str):
        def compute():
            src = self.raw_index.for_class(class_label)
            if isinstance(src, DatasetIndex):
                loader = ImageFolderLoader(
                    src,
                    LoaderConfig(
                        batch_size=self.config.eval_batch_size,
                        definition=self.definition,
                        normalize=False,
                        shuffle=False,
                        drop_last=False,
                    ),
                )
                stream = loader.all_images()
            else:  # HFDatasetAdapter (duck-typed raw_images())
                stream = src.raw_images(
                    self.config.eval_batch_size, self.definition
                )
            feats, _ = self.extractor.features_for(
                batch.astype(np.float32) / 255.0 for batch, _ in stream
            )
            return {"features": feats}

        if self.cache is not None:
            key = self._cache_key(class_label, class_name)
            return self.cache.get_or_compute(key, compute)["features"]
        return compute()["features"]

    # -- generation --------------------------------------------------------
    @staticmethod
    def _gather(x) -> np.ndarray:
        """``np.asarray`` that also handles MULTI-PROCESS-sharded arrays:
        each process contributes its addressable shards and allgathers the
        rest, so every process holds the identical full array — the
        TPU-native version of the reference's rank-sharded generation
        funneled to a main-process metric pass
        (``utils_training.py:712-766``, which round-trips through PNG
        files on disk between ranks)."""
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils

            local = np.concatenate([
                np.asarray(s.data)
                for s in sorted(x.addressable_shards, key=lambda s: s.index)
            ])
            gathered = np.asarray(multihost_utils.process_allgather(local))
            return gathered.reshape((-1,) + tuple(x.shape[1:]))
        return np.asarray(x)

    def _generate_class(
        self, generate_fn: Callable, class_label: int, rng: Array
    ):
        """generate_fn(labels, rng, num_inference_steps) → [-1,1] images."""
        cfg = self.config
        feats, logits, first_batch = [], [], None
        # Always generate FULL batches and trim the surplus at the end: a
        # ragged tail batch would (a) trigger a second compile of the
        # sampling scan and (b) silently fall off the device mesh when the
        # tail is not divisible by the mesh size.
        n_batches = -(-cfg.nb_generated_images // cfg.eval_batch_size)
        for _ in range(n_batches):
            bs = cfg.eval_batch_size
            rng, sub = jax.random.split(rng)
            labels = self.shard_fn(jnp.full((bs,), class_label, dtype=jnp.int32))
            out = generate_fn(labels, sub, cfg.num_inference_steps)
            imgs01 = to_images(out)
            f, l = self.extractor(imgs01)
            feats.append(self._gather(f))
            logits.append(self._gather(l))
            if first_batch is None:
                first_batch = self._gather(imgs01)[:50]
        n = cfg.nb_generated_images
        return (
            np.concatenate(feats)[:n],
            np.concatenate(logits)[:n],
            first_batch,
        )

    # -- full pass ---------------------------------------------------------
    def evaluate(
        self,
        generate_fn: Callable,
        step: int,
        tracker=None,
    ) -> Dict[str, float]:
        """Returns flat metrics incl. ``main_metric_mean``."""
        cfg = self.config
        rng = jax.random.key(EVAL_SEED)
        if cfg.unconditional:
            class_items = [(0, "unconditional")]
        else:
            class_items = list(enumerate(self.raw_index.classes))

        all_metrics: Dict[str, float] = {}
        mains: List[float] = []
        for label, name in class_items:
            rng, sub = jax.random.split(rng)
            feats, logits, panel = self._generate_class(generate_fn, label, sub)
            real = None
            if cfg.metrics.fid or cfg.metrics.kid:
                real = self._reference_features(label, name)
            m = calculate_metrics(feats, real, logits, cfg.metrics)
            for k, v in m.items():
                all_metrics[f"{name}/{k}"] = v
            if cfg.main_metric in m:
                mains.append(m[cfg.main_metric])
            if tracker is not None and panel is not None:
                tracker.log_images(f"samples/{name}", panel, step)
        if mains:
            all_metrics["main_metric_mean"] = float(np.mean(mains))
        # Metric records carry the weight provenance: 1.0 = pinned
        # FID-Inception weights (torch-fidelity parity), 0.0 = random-init
        # fallback (values NOT comparable across machines).
        all_metrics["inception_pretrained"] = float(
            bool(getattr(self.extractor, "pretrained", False))
        )
        if tracker is not None:
            tracker.log(all_metrics, step)
        return all_metrics
