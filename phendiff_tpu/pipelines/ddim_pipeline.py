"""ConditionalDDIMPipeline: model + schedule bundle with save/load.

The object-level counterpart of the reference's ``ConditionalDDIMPipeline``
(``src/pipeline_conditional_ddim/pipeline_conditionial_ddim.py``): bundles
the conditional UNet2D and a DDIM schedule, exposes generation / inversion,
and round-trips through a diffusers-layout folder.  All heavy lifting is
the functional scans in ``conditional_ddim.py`` — this class only owns
params and configs (so it is cheap to rebuild after each EMA swap, like the
reference does at ``utils_training.py:685-694``).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from phendiff_tpu.core import scheduler as S
from phendiff_tpu.models.config import UNet2DConfig
from phendiff_tpu.models.unet2d import CondUNet2D
from phendiff_tpu.ops import lane_pack as _lane_pack
from phendiff_tpu.pipelines import conditional_ddim as sampler
from phendiff_tpu.pipelines import io

Array = jax.Array


@dataclasses.dataclass
class ConditionalDDIMPipeline:
    unet_config: UNet2DConfig
    scheduler_config: S.SchedulerConfig
    params: dict  # flax variables {"params": ...}
    dtype: jnp.dtype = jnp.float32
    # Lane-packed execution of narrow-channel levels (ops/lane_pack.py):
    # identical params/checkpoints, exact numerics, +16% on the flagship.
    # None → ops.lane_pack.default_enabled() (env PHENDIFF_LANE_PACK).
    lane_pack: Optional[bool] = None

    def __post_init__(self):
        if self.lane_pack is None:
            self.lane_pack = _lane_pack.default_enabled()
        self._model = CondUNet2D(
            self.unet_config, dtype=self.dtype, lane_pack=self.lane_pack
        )
        self._schedule = S.make_schedule(self.scheduler_config)

    # -- construction -----------------------------------------------------
    @classmethod
    def init_random(
        cls,
        unet_config: UNet2DConfig,
        scheduler_config: S.SchedulerConfig,
        seed: int = 0,
        dtype=jnp.float32,
    ) -> "ConditionalDDIMPipeline":
        model = CondUNet2D(unet_config, dtype=dtype)
        res = unet_config.sample_size
        x = jnp.zeros((1, res, res, unet_config.in_channels))
        labels = (
            jnp.array([0]) if unet_config.num_class_embeds is not None else None
        )
        params = model.init(
            jax.random.key(seed), x, jnp.array([0]), class_labels=labels
        )
        return cls(unet_config, scheduler_config, params, dtype=dtype)

    # -- component access --------------------------------------------------
    @property
    def model(self) -> CondUNet2D:
        return self._model

    @property
    def schedule(self) -> S.NoiseSchedule:
        return self._schedule

    @property
    def num_classes(self) -> Optional[int]:
        return self.unet_config.num_class_embeds

    def class_embeddings(self, class_labels: Array, params=None) -> Array:
        """Rows of the internal class-embedding table for given labels."""
        p = (params or self.params)["params"]["class_embedding"]["embedding"]
        return jnp.asarray(p)[class_labels]

    def denoiser_fn(self, params=None) -> sampler.DenoiserFn:
        variables = self.params if params is None else params

        def fn(x, t, class_emb):
            return self._model.apply(variables, x, t, class_emb=class_emb)

        return fn

    # -- checkpoint-as-data ------------------------------------------------
    @property
    def params_tree(self) -> dict:
        """The checkpoint as one pytree for jit-argument threading (see
        ``SDImg2ImgPipeline.params_tree``)."""
        return self.params

    def cast_params(self, dtype=jnp.bfloat16) -> "ConditionalDDIMPipeline":
        """Pipeline with floating param leaves stored in ``dtype`` — for
        INFERENCE weight-streaming economy (see
        ``SDImg2ImgPipeline.cast_params``); training keeps f32 masters."""
        from phendiff_tpu.core.precision import cast_floating

        return dataclasses.replace(
            self, params=cast_floating(self.params, dtype)
        )

    def arch_fingerprint(self) -> str:
        """Architecture identity: equal fingerprints ⇒ one compiled
        transfer program serves both checkpoints."""
        import json as _json

        return _json.dumps(
            {
                "kind": "ConditionalDDIMPipeline",
                "unet": self.unet_config.to_json_dict(),
                "scheduler": self.scheduler_config.to_json_dict(),
                "dtype": str(self.dtype),
                "lane_pack": bool(self.lane_pack),
            },
            sort_keys=True,
        )

    # -- sampling ----------------------------------------------------------
    def generate(
        self,
        class_labels: Optional[Array],
        rng: Array,
        *,
        num_inference_steps: int = sampler.DEFAULT_NUM_INFERENCE_STEPS,
        guidance_factor: Union[float, Array] = 0.0,
        guidance_equation: str = "imagen",
        eta: float = 0.0,
        start_image: Optional[Array] = None,
        add_forward_noise: bool = False,
        frac_diffusion_skipped: float = 0.0,
        batch_size: Optional[int] = None,
        unconditional: bool = False,
        params=None,
    ) -> Array:
        """Sample images; returns [-1,1] NHWC.

        ``unconditional=True`` (or ``class_labels=None``) samples with a
        zeros class embedding — the reference's proba_uncond==1 eval mode
        (``utils_training.py:705-717``) — and is the only mode for models
        with ``num_class_embeds=None`` (e.g. the orig-google-ddpm config).
        """
        if class_labels is None:
            unconditional = True
        if unconditional:
            b = batch_size or (
                int(class_labels.shape[0]) if class_labels is not None else 1
            )
            class_emb = jnp.zeros((b, self.unet_config.time_embed_dim))
        else:
            b = int(class_labels.shape[0])
            class_emb = self.class_embeddings(class_labels, params)
        res = self.unet_config.sample_size
        shape = (b, res, res, self.unet_config.in_channels)
        return sampler.ddim_sample(
            self.denoiser_fn(params),
            self._schedule,
            class_emb,
            shape=shape,
            rng=rng,
            start_image=start_image,
            add_forward_noise=add_forward_noise,
            num_inference_steps=num_inference_steps,
            frac_diffusion_skipped=frac_diffusion_skipped,
            guidance=sampler.GuidanceConfig(guidance_factor, guidance_equation),
            eta=eta,
        )

    def invert(
        self,
        image: Array,
        class_labels: Array,
        *,
        num_inference_steps: int = sampler.DEFAULT_NUM_INFERENCE_STEPS,
        params=None,
    ) -> Array:
        class_emb = self.class_embeddings(class_labels, params)
        return sampler.ddim_invert(
            self.denoiser_fn(params),
            self._schedule,
            image,
            class_emb,
            num_inference_steps=num_inference_steps,
        )

    # -- persistence -------------------------------------------------------
    def save_pretrained(self, dirpath: str) -> None:
        io.save_model_index(
            dirpath,
            "ConditionalDDIMPipeline",
            {"unet": "unet", "scheduler": "scheduler"},
        )
        io.save_component(
            os.path.join(dirpath, "unet"),
            self.unet_config.to_json_dict(),
            jax.tree.map(lambda x: np.asarray(x, dtype=np.float32), self.params),
        )
        io.save_component(
            os.path.join(dirpath, "scheduler"),
            self.scheduler_config.to_json_dict(),
        )

    @classmethod
    def from_pretrained(cls, dirpath: str, dtype=jnp.float32) -> "ConditionalDDIMPipeline":
        index = io.load_model_index(dirpath)
        if index.get("_class_name") != "ConditionalDDIMPipeline":
            raise ValueError(f"not a ConditionalDDIMPipeline folder: {dirpath}")
        unet_cfg_raw, params = io.load_component(os.path.join(dirpath, "unet"))
        sched_cfg_raw, _ = io.load_component(os.path.join(dirpath, "scheduler"))
        unet_config = UNet2DConfig.from_json(unet_cfg_raw)
        scheduler_config = S.SchedulerConfig.from_json(sched_cfg_raw)
        params = jax.tree.map(jnp.asarray, params)
        return cls(unet_config, scheduler_config, params, dtype=dtype)

    def replace_params(self, params) -> "ConditionalDDIMPipeline":
        return ConditionalDDIMPipeline(
            self.unet_config, self.scheduler_config, params,
            dtype=self.dtype, lane_pack=self.lane_pack,
        )
