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


@dataclasses.dataclass
class EvalConfig:
    nb_generated_images: int = 128
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
        # Sharding the label batch over the mesh makes the whole generation
        # scan data-parallel (the TPU-native version of the reference's
        # per-rank eval-batch sharding, utils_training.py:128-139).
        self.shard_fn = shard_fn or (lambda x: x)

    # -- reference features (cached per class) -----------------------------
    def _reference_features(self, class_label: int, class_name: str):
        def compute():
            idx = self.raw_index.for_class(class_label)
            loader = ImageFolderLoader(
                idx,
                LoaderConfig(
                    batch_size=self.config.eval_batch_size,
                    definition=self.definition,
                    normalize=False,
                    shuffle=False,
                    drop_last=False,
                ),
            )
            feats, _ = self.extractor.features_for(
                batch.astype(np.float32) / 255.0 for batch, _ in loader.all_images()
            )
            return {"features": feats}

        if self.cache is not None:
            return self.cache.get_or_compute(class_name, compute)["features"]
        return compute()["features"]

    # -- generation --------------------------------------------------------
    def _generate_class(
        self, generate_fn: Callable, class_label: int, rng: Array
    ):
        """generate_fn(labels, rng, num_inference_steps) → [-1,1] images."""
        cfg = self.config
        feats, logits, first_batch = [], [], None
        remaining = cfg.nb_generated_images
        while remaining > 0:
            bs = min(cfg.eval_batch_size, remaining)
            rng, sub = jax.random.split(rng)
            labels = self.shard_fn(jnp.full((bs,), class_label, dtype=jnp.int32))
            out = generate_fn(labels, sub, cfg.num_inference_steps)
            imgs01 = to_images(out)
            f, l = self.extractor(imgs01)
            feats.append(np.asarray(f))
            logits.append(np.asarray(l))
            if first_batch is None:
                first_batch = np.asarray(imgs01[:50])
            remaining -= bs
        return np.concatenate(feats), np.concatenate(logits), first_batch

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
        if tracker is not None:
            tracker.log(all_metrics, step)
        return all_metrics
