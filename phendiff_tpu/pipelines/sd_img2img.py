"""SD img2img pipeline with class conditioning instead of text.

Capability parity with the reference's
``CustomStableDiffusionImg2ImgPipeline``
(``src/custom_pipeline_stable_diffusion_img2img/custom_pipeline_stable_diffusion_img2img.py``):

* components: VAE (frozen), SD UNet, DDIM schedule, custom class embedding
  replacing the CLIP text encoder (``:62-144``);
* ``_encode_class`` semantics: int labels → embedding rows → CLIP-shape
  (B, 77, 1024) sequences; the CFG unconditional branch uses a zeros
  sequence, and cond+uncond run as ONE batched UNet pass (``:220-281,
  670-693`` — the reference already batches here, unlike its DDIM pipeline);
* ``prepare_latents``: no image → pure noise at the latent shape;
  4-channel input → passed through as latents; 3-channel image →
  VAE-encode × scaling_factor, with optional forward noising (``:384-445``);
* ``strength`` truncates the timestep schedule by count (``:375-382``);
  ``add_forward_noise_to_image`` decouples noising from truncation;
* output types: latents or decoded images (``:708-730``).

The denoise loop itself is the shared ``conditional_ddim.ddim_sample`` scan
(conditioning tensors are opaque to it), so DDIM/SD sampling share one
compiled-loop implementation.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from phendiff_tpu.core import scheduler as S
from phendiff_tpu.models.autoencoder_kl import (
    AutoencoderKL,
    AutoencoderKLConfig,
    decode_from_latents,
    encode_to_latents,
)
from phendiff_tpu.models.embeddings import ClassEmbedding, pad_to_clip_sequence
from phendiff_tpu.models.sd_unet import SDUNet, SDUNetConfig
from phendiff_tpu.pipelines import conditional_ddim as sampler
from phendiff_tpu.pipelines import io

Array = jax.Array

CLIP_SEQ_LEN = 77
VAE_DOWNSCALE = 8


@dataclasses.dataclass
class SDImg2ImgPipeline:
    unet_config: SDUNetConfig
    vae_config: AutoencoderKLConfig
    scheduler_config: S.SchedulerConfig
    num_classes: int
    class_embedding_dim: int
    unet_params: dict
    vae_params: dict
    class_embedding_params: dict
    dtype: jnp.dtype = jnp.float32

    def __post_init__(self):
        self._unet = SDUNet(self.unet_config, dtype=self.dtype)
        self._vae = AutoencoderKL(self.vae_config, dtype=self.dtype)
        self._class_embedding = ClassEmbedding(
            self.num_classes, self.class_embedding_dim
        )
        self._schedule = S.make_schedule(self.scheduler_config)

    # -- construction ------------------------------------------------------
    @classmethod
    def init_random(
        cls,
        unet_config: SDUNetConfig,
        vae_config: AutoencoderKLConfig,
        scheduler_config: S.SchedulerConfig,
        num_classes: int = 2,
        class_embedding_dim: int = 1024,
        seed: int = 0,
        dtype=jnp.float32,
    ) -> "SDImg2ImgPipeline":
        k1, k2, k3 = jax.random.split(jax.random.key(seed), 3)
        unet = SDUNet(unet_config, dtype=dtype)
        latent = jnp.zeros(
            (1, unet_config.sample_size, unet_config.sample_size,
             unet_config.in_channels)
        )
        ctx = jnp.zeros((1, CLIP_SEQ_LEN, unet_config.cross_attention_dim))
        unet_params = unet.init(k1, latent, jnp.array([0]), ctx)
        vae = AutoencoderKL(vae_config, dtype=dtype)
        vae_params = vae.init(k2, jnp.zeros((1, 32, 32, vae_config.in_channels)))
        ce = ClassEmbedding(num_classes, class_embedding_dim)
        ce_params = ce.init(k3, jnp.array([0]))
        return cls(
            unet_config, vae_config, scheduler_config, num_classes,
            class_embedding_dim, unet_params, vae_params, ce_params, dtype=dtype,
        )

    # -- components --------------------------------------------------------
    @property
    def schedule(self) -> S.NoiseSchedule:
        return self._schedule

    @property
    def vae(self) -> AutoencoderKL:
        return self._vae

    @property
    def unet(self) -> SDUNet:
        return self._unet

    def encode_class(self, class_labels: Array, params=None) -> Array:
        """labels → (B, 77, D) conditioning sequences (the reference's
        ``_encode_class`` + CLIP-shape hack)."""
        emb = self._class_embedding.apply(
            params or self.class_embedding_params, class_labels
        )
        return pad_to_clip_sequence(emb, CLIP_SEQ_LEN)

    def denoiser_fn(self, params=None):
        variables = self.unet_params if params is None else params

        def fn(x, t, class_seq):
            return self._unet.apply(variables, x, t, class_seq)

        return fn

    # -- latent plumbing ---------------------------------------------------
    def encode_images(
        self, images: Array, rng: Optional[Array] = None, params=None
    ) -> Array:
        return encode_to_latents(
            self._vae, self.vae_params if params is None else params,
            images, rng,
        )

    def decode_latents(self, latents: Array, params=None) -> Array:
        return decode_from_latents(
            self._vae, self.vae_params if params is None else params, latents
        )

    # -- checkpoint-as-data ------------------------------------------------
    @property
    def params_tree(self) -> dict:
        """Every checkpoint array as ONE pytree — for passing through jit
        as a TRACED ARGUMENT rather than capturing into the program as
        compile-time constants.  Baking the full-width tree (3.5 GB) into
        the HLO slows lowering severely and forces a recompile per
        checkpoint; as an argument, one compiled program serves every
        same-architecture checkpoint (the reference swaps checkpoints for
        free, ``img2img_comparison.py:100`` — pipelines are data, not
        programs)."""
        return {
            "unet": self.unet_params,
            "vae": self.vae_params,
            "class_embedding": self.class_embedding_params,
        }

    def arch_fingerprint(self) -> str:
        """Architecture identity (configs, not weights): two pipelines with
        equal fingerprints can share one compiled transfer program."""
        import json as _json

        return _json.dumps(
            {
                "kind": "SDImg2ImgPipeline",
                "unet": self.unet_config.to_json_dict(),
                "vae": self.vae_config.to_json_dict(),
                "scheduler": self.scheduler_config.to_json_dict(),
                "num_classes": self.num_classes,
                "class_embedding_dim": self.class_embedding_dim,
                "dtype": str(self.dtype),
            },
            sort_keys=True,
        )

    def prepare_latents(
        self,
        image: Optional[Array],
        batch_size: int,
        rng: Optional[Array],
    ) -> Array:
        lat_res = self.unet_config.sample_size
        c = self.unet_config.in_channels
        if image is None:
            if rng is None:
                raise ValueError("pure-noise start requires rng")
            return jax.random.normal(
                rng, (batch_size, lat_res, lat_res, c), dtype=jnp.float32
            )
        if image.shape[-1] == c:
            return image  # already latents (reference :384-445)
        return self.encode_images(image, rng)

    # -- sampling ----------------------------------------------------------
    def generate(
        self,
        class_labels: Array,
        rng: Array,
        *,
        image: Optional[Array] = None,
        latents: Optional[Array] = None,
        strength: Optional[float] = None,
        add_forward_noise: bool = False,
        num_inference_steps: int = 50,
        guidance_scale: float = 0.0,
        guidance_equation: str = "imagen",
        eta: float = 0.0,
        output_type: str = "image",  # "image" | "latent" | "image+latent"
        params=None,
    ):
        """``params``, when given, is a full ``params_tree``-shaped dict
        (``{"unet", "vae", "class_embedding"}``) used in place of the held
        checkpoint — pass it through a surrounding jit as a traced argument
        to sample from swapped weights (EMA, another checkpoint) without
        re-tracing."""
        p = params or {}
        b = int(class_labels.shape[0])
        rng, k_prep = jax.random.split(rng)
        start = latents if latents is not None else self.prepare_latents(
            image, b, k_prep
        )
        class_seq = self.encode_class(class_labels, p.get("class_embedding"))
        out_latents = sampler.ddim_sample(
            self.denoiser_fn(p.get("unet")),
            self._schedule,
            class_seq,
            start_image=start,
            rng=rng,
            add_forward_noise=add_forward_noise,
            num_inference_steps=num_inference_steps,
            strength=strength,
            guidance=sampler.GuidanceConfig(guidance_scale, guidance_equation),
            eta=eta,
        )
        if output_type == "latent":
            return out_latents
        images = self.decode_latents(out_latents, p.get("vae"))
        if output_type == "image+latent":
            return images, out_latents
        return images

    def invert(
        self,
        image_or_latents: Array,
        class_labels: Array,
        *,
        num_inference_steps: int = 50,
        params=None,
    ) -> Array:
        """DDIM inversion in latent space (LDM preprocess + inversion,
        reference ``_LDM_preprocess`` + ``_inversion``).  ``params`` as in
        :meth:`generate` — a ``params_tree``-shaped dict."""
        p = params or {}
        if image_or_latents.shape[-1] != self.unet_config.in_channels:
            latents = self.encode_images(image_or_latents, params=p.get("vae"))
        else:
            latents = image_or_latents
        class_seq = self.encode_class(class_labels, p.get("class_embedding"))
        return sampler.ddim_invert(
            self.denoiser_fn(p.get("unet")), self._schedule, latents, class_seq,
            num_inference_steps=num_inference_steps,
        )

    # -- persistence -------------------------------------------------------
    def save_pretrained(self, dirpath: str) -> None:
        io.save_model_index(
            dirpath,
            "SDImg2ImgPipeline",
            {"unet": "unet", "vae": "vae", "scheduler": "scheduler",
             "class_embedding": "class_embedding"},
        )
        as_np = lambda t: jax.tree.map(
            lambda x: np.asarray(x, dtype=np.float32), t
        )
        io.save_component(
            os.path.join(dirpath, "unet"),
            self.unet_config.to_json_dict(), as_np(self.unet_params),
        )
        io.save_component(
            os.path.join(dirpath, "vae"),
            self.vae_config.to_json_dict(), as_np(self.vae_params),
        )
        io.save_component(
            os.path.join(dirpath, "scheduler"),
            self.scheduler_config.to_json_dict(),
        )
        io.save_component(
            os.path.join(dirpath, "class_embedding"),
            {"_class_name": "CustomEmbedding",
             "num_classes": self.num_classes,
             "embedding_dim": self.class_embedding_dim},
            as_np(self.class_embedding_params),
        )

    @classmethod
    def from_pretrained(cls, dirpath: str, dtype=jnp.float32) -> "SDImg2ImgPipeline":
        index = io.load_model_index(dirpath)
        if index.get("_class_name") != "SDImg2ImgPipeline":
            raise ValueError(f"not an SDImg2ImgPipeline folder: {dirpath}")
        unet_raw, unet_params = io.load_component(os.path.join(dirpath, "unet"))
        vae_raw, vae_params = io.load_component(os.path.join(dirpath, "vae"))
        sched_raw, _ = io.load_component(os.path.join(dirpath, "scheduler"))
        ce_raw, ce_params = io.load_component(
            os.path.join(dirpath, "class_embedding")
        )
        to_jnp = lambda t: jax.tree.map(jnp.asarray, t)
        return cls(
            SDUNetConfig.from_json(unet_raw),
            AutoencoderKLConfig.from_json(vae_raw),
            S.SchedulerConfig.from_json(sched_raw),
            ce_raw["num_classes"],
            ce_raw["embedding_dim"],
            to_jnp(unet_params),
            to_jnp(vae_params),
            to_jnp(ce_params),
            dtype=dtype,
        )

    def replace_params(
        self, unet_params=None, class_embedding_params=None, vae_params=None
    ) -> "SDImg2ImgPipeline":
        return SDImg2ImgPipeline(
            self.unet_config, self.vae_config, self.scheduler_config,
            self.num_classes, self.class_embedding_dim,
            unet_params if unet_params is not None else self.unet_params,
            vae_params if vae_params is not None else self.vae_params,
            class_embedding_params
            if class_embedding_params is not None
            else self.class_embedding_params,
            dtype=self.dtype,
        )

    def cast_params(self, dtype=jnp.bfloat16) -> "SDImg2ImgPipeline":
        """Pipeline with all floating param leaves stored in ``dtype``.

        For INFERENCE only (sampling/transfer/eval; training keeps f32
        master params).  Halves the resident weight footprint (1.7 GB vs
        3.5 GB at full SD-2.1 width) and per-forward weight reads;
        measured r5 throughput-neutral at 128px/b64 (the denoise scan is
        compute-bound there) — the win is HBM headroom, e.g. 2x the
        checkpoints resident for sweeps.  Parity: the reference's
        comparison app runs under fp16 autocast
        (``img2img_comparison.py:56-59``)."""
        from phendiff_tpu.core.precision import cast_floating

        return self.replace_params(
            unet_params=cast_floating(self.unet_params, dtype),
            vae_params=cast_floating(self.vae_params, dtype),
            class_embedding_params=cast_floating(
                self.class_embedding_params, dtype
            ),
        )
