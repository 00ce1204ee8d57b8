"""Batched inference engine for deployment.

The reference stops at experiment scripts; this is the productionization
layer the north star asks for ("large-scale production deployment and
serving"): load a trained pipeline once, pre-compile fixed-shape programs
for the operations a service needs (class-conditional generation, DDIB
class transfer, inversion), and serve requests of arbitrary size by
padding into those fixed shapes — no recompiles at serving time, no
host↔device chatter beyond input/output copies.

Design:

* every op is compiled for ONE canonical batch shape (``max_batch``); a
  request of k ≤ max_batch images is zero-padded, executed, and sliced —
  XLA-friendly static shapes, predictable p99 latency;
* programs are compiled eagerly at startup (``warmup()``) so the first
  request does not pay the compile;
* requests ride the data-parallel mesh when more than one device is
  visible (batch sharded along ``data``).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from phendiff_tpu.parallel import make_mesh, shard_batch
from phendiff_tpu.pipelines import transfer as T
from phendiff_tpu.pipelines.conditional_ddim import to_images
from phendiff_tpu.pipelines.ddim_pipeline import ConditionalDDIMPipeline
from phendiff_tpu.pipelines.sd_img2img import SDImg2ImgPipeline


@dataclasses.dataclass
class EngineConfig:
    max_batch: int = 32
    num_inference_steps: int = 50
    guidance_factor: float = 0.0
    ops: tuple = ("generate", "transfer", "invert")


class InferenceEngine:
    def __init__(self, pipeline, config: EngineConfig = EngineConfig()):
        self.pipe = pipeline
        self.config = config
        self.mesh = make_mesh()
        self.is_sd = isinstance(pipeline, SDImg2ImgPipeline)
        if not isinstance(pipeline, (ConditionalDDIMPipeline, SDImg2ImgPipeline)):
            raise TypeError(f"unsupported pipeline type {type(pipeline)}")
        self._compiled: Dict[str, object] = {}
        self._stats = {"requests": 0, "images": 0, "total_s": 0.0}
        # The checkpoint rides through every compiled program as a TRACED
        # ARGUMENT (not a captured constant): compiles stay small at full
        # width, and swap_params() hot-reloads a new same-architecture
        # checkpoint with ZERO recompiles — the production rollout path.
        self._ptree = pipeline.params_tree

    def swap_params(self, pipeline) -> None:
        """Hot-swap the served checkpoint (same architecture) without
        recompiling any op program."""
        if pipeline.arch_fingerprint() != self.pipe.arch_fingerprint():
            raise ValueError(
                "swap_params requires an identical architecture "
                "(arch_fingerprint mismatch)"
            )
        self.pipe = pipeline
        self._ptree = pipeline.params_tree

    # -- shapes ------------------------------------------------------------
    @property
    def image_shape(self):
        if self.is_sd:
            res = self.pipe.unet_config.sample_size * 8  # VAE downscale
            return (res, res, 3)
        res = self.pipe.unet_config.sample_size
        return (res, res, self.pipe.unet_config.in_channels)

    def _pad(self, arr: np.ndarray) -> np.ndarray:
        b = arr.shape[0]
        if b > self.config.max_batch:
            raise ValueError(f"batch {b} exceeds max_batch {self.config.max_batch}")
        if b == self.config.max_batch:
            return arr
        pad = np.zeros(
            (self.config.max_batch - b,) + arr.shape[1:], dtype=arr.dtype
        )
        return np.concatenate([arr, pad])

    # -- op builders -------------------------------------------------------
    def _abstract_ptree(self):
        return jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), self._ptree
        )

    def _build_generate(self):
        cfg = self.config

        def run(ptree, labels, rng):
            if self.is_sd:
                return self.pipe.generate(
                    labels, rng, num_inference_steps=cfg.num_inference_steps,
                    guidance_scale=cfg.guidance_factor, params=ptree,
                )
            return self.pipe.generate(
                labels, rng, num_inference_steps=cfg.num_inference_steps,
                guidance_factor=cfg.guidance_factor, params=ptree,
            )

        labels = jax.ShapeDtypeStruct((cfg.max_batch,), jnp.int32)
        return jax.jit(run).lower(
            self._abstract_ptree(), labels, jax.random.key(0)
        ).compile()

    def _build_transfer(self):
        cfg = self.config

        def run(ptree, images, src, tgt):
            if self.is_sd:
                x = self.pipe.encode_images(images, params=ptree["vae"])
                out = T.ddib(
                    self.pipe.denoiser_fn(ptree["unet"]), self.pipe.schedule, x,
                    self.pipe.encode_class(src, ptree["class_embedding"]),
                    self.pipe.encode_class(tgt, ptree["class_embedding"]),
                    num_inference_steps=cfg.num_inference_steps,
                )
                return self.pipe.decode_latents(out, ptree["vae"])
            return T.ddib(
                self.pipe.denoiser_fn(ptree), self.pipe.schedule, images,
                self.pipe.class_embeddings(src, ptree),
                self.pipe.class_embeddings(tgt, ptree),
                num_inference_steps=cfg.num_inference_steps,
            )

        shape = (cfg.max_batch,) + self.image_shape
        args = (
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct((cfg.max_batch,), jnp.int32),
            jax.ShapeDtypeStruct((cfg.max_batch,), jnp.int32),
        )
        return jax.jit(run).lower(self._abstract_ptree(), *args).compile()

    def _build_invert(self):
        cfg = self.config

        def run(ptree, images, labels):
            return self.pipe.invert(
                images, labels, num_inference_steps=cfg.num_inference_steps,
                params=ptree,
            )

        shape = (cfg.max_batch,) + self.image_shape
        args = (
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct((cfg.max_batch,), jnp.int32),
        )
        return jax.jit(run).lower(self._abstract_ptree(), *args).compile()

    # -- lifecycle ---------------------------------------------------------
    def warmup(self) -> Dict[str, float]:
        """Compile all configured ops; returns compile seconds per op."""
        builders = {
            "generate": self._build_generate,
            "transfer": self._build_transfer,
            "invert": self._build_invert,
        }
        times = {}
        for op in self.config.ops:
            t0 = time.perf_counter()
            self._compiled[op] = builders[op]()
            times[op] = time.perf_counter() - t0
        return times

    def _get(self, op: str):
        if op not in self._compiled:
            raise RuntimeError(f"op '{op}' not warmed up (ops={self.config.ops})")
        return self._compiled[op]

    # -- public API --------------------------------------------------------
    def generate(self, class_labels: np.ndarray, seed: int = 0) -> np.ndarray:
        """labels [k] → images [k, H, W, C] in [0, 1]."""
        k = len(class_labels)
        labels = self._pad(np.asarray(class_labels, np.int32))
        t0 = time.perf_counter()
        out = self._get("generate")(
            self._ptree, jnp.asarray(labels), jax.random.key(seed)
        )
        out = np.asarray(to_images(out[:k]))
        self._account(k, t0)
        return out

    def transfer(
        self,
        images01: np.ndarray,  # [k, H, W, C] in [0, 1]
        source_labels: np.ndarray,
        target_labels: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """DDIB class transfer; target defaults to the binary flip."""
        k = len(images01)
        src = np.asarray(source_labels, np.int32)
        tgt = (
            np.asarray(target_labels, np.int32)
            if target_labels is not None
            else (1 - src).astype(np.int32)
        )
        x = self._pad(np.asarray(images01, np.float32) * 2.0 - 1.0)
        t0 = time.perf_counter()
        out = self._get("transfer")(
            self._ptree, jnp.asarray(x), jnp.asarray(self._pad(src)),
            jnp.asarray(self._pad(tgt)),
        )
        out = np.asarray(to_images(out[:k]))
        self._account(k, t0)
        return out

    def invert(self, images01: np.ndarray, labels: np.ndarray) -> np.ndarray:
        k = len(images01)
        x = self._pad(np.asarray(images01, np.float32) * 2.0 - 1.0)
        t0 = time.perf_counter()
        out = self._get("invert")(
            self._ptree, jnp.asarray(x),
            jnp.asarray(self._pad(np.asarray(labels, np.int32))),
        )
        self._account(k, t0)
        return np.asarray(out[:k])

    def _account(self, k: int, t0: float):
        self._stats["requests"] += 1
        self._stats["images"] += k
        self._stats["total_s"] += time.perf_counter() - t0

    def stats(self) -> Dict[str, float]:
        s = dict(self._stats)
        if s["total_s"] > 0:
            s["images_per_sec"] = s["images"] / s["total_s"]
        return s
