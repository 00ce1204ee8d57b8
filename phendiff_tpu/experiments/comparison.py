"""Img2img class-transfer comparison experiment engine.

Capability parity with the reference's experiment driver
(``img2img_comparison.py:54-155`` + ``utils_Img2Img.py:190-563``):

* loads train/test imagefolder splits with file basenames kept for output
  naming (``load_datasets``, ``utils_Img2Img.py:190-242``);
* loads named pipelines from pretrained folders (Hydra ``call(cfg.pipeline)``
  → here a plain config dict);
* loops methods × pipelines × splits × batches, with the binary-class
  assumption ``target = 1 - orig`` (``:343-344``);
* saves outputs as ``output_dir/method/pipe/split/target_class/
  <basename>_to_<target_class>.png`` (``:281-291, 390-400``);
* debug mode stops after one batch (``DEBUG_BATCHES_LIMIT``, ``:46``);
* ``compute_metrics``: pooled FID/ISC/KID of all transfers vs the whole
  true split, then per-target-class vs that class's folder; KID
  auto-disabled when too few samples; optional flat ``sweep_metric``
  re-log (``:462-563``).

TPU-native notes: each (pipeline, method) pair jits ONE transfer function
reused across batches/splits; batches ride the data-parallel mesh.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
from functools import partial
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from phendiff_tpu.data.imagefolder import (
    DatasetIndex,
    ImageFolderLoader,
    LoaderConfig,
    scan_imagefolder,
)
from phendiff_tpu.metrics.fidelity import MetricsConfig, calculate_metrics
from phendiff_tpu.metrics.inception import InceptionExtractor
from phendiff_tpu.pipelines import transfer as T
from phendiff_tpu.pipelines.conditional_ddim import to_images
from phendiff_tpu.pipelines.ddim_pipeline import ConditionalDDIMPipeline
from phendiff_tpu.pipelines.sd_img2img import SDImg2ImgPipeline

METHODS = T.TRANSFER_METHODS


@dataclasses.dataclass
class MethodParams:
    """Per-method knobs (the reference's class_transfer_method config group)."""

    guidance_scale: float = 2.5
    frac_diffusion_skipped: float = 0.5
    guidance_loss_scale: float = 1e-3
    p: float = 2.0
    batch_size: int = 16


@dataclasses.dataclass
class ComparisonConfig:
    output_dir: str = "comparison_out"
    pipelines: Dict[str, str] = dataclasses.field(default_factory=dict)  # name → folder
    dataset_train: str = ""
    dataset_test: Optional[str] = None
    definition: Tuple[int, int] = (128, 128)
    methods: Tuple[str, ...] = ("ddib",)
    method_params: Dict[str, MethodParams] = dataclasses.field(default_factory=dict)
    num_inference_steps: int = 100
    metrics: MetricsConfig = dataclasses.field(
        default_factory=lambda: MetricsConfig(fid=True, isc=True, kid=True)
    )
    sweep_metric: Optional[str] = None  # "method/pipe/split/metric"
    debug: bool = False
    seed: int = 0
    # Segmented execution of SD pipelines (host-driven stepwise loops over
    # per-stage programs instead of one jitted scan): None = auto-select
    # when the UNet is too large for a monolithic program on constrained
    # compile transports (the full-width SD-2.1 case, docs/BENCHMARKS.md).
    segmented_sd: Optional[bool] = None
    # On the segmented route, spread the stage programs over all local
    # devices as a pipeline (parallel/pp.py) instead of running them on
    # one chip — a full-width UNet whose params exceed one chip's HBM
    # runs across the slice.  Ignored on the jitted (monolithic) route.
    pipeline_parallel: bool = False
    # Storage dtype for the loaded checkpoints' floating leaves.  bf16
    # halves the resident weight footprint (1.7 GB vs 3.5 GB at full SD
    # width) — throughput-neutral at 128px/b64 where the scan is
    # compute-bound (measured r5: 27.99 vs 27.95 transfers/s) but it
    # doubles the checkpoints that fit per chip for multi-checkpoint
    # sweeps.  The reference's comparison app runs under fp16 autocast
    # unconditionally (img2img_comparison.py:56-59), so half precision is
    # the parity default; set None to keep checkpoints as stored on disk.
    inference_param_dtype: Optional[str] = "bfloat16"

    @classmethod
    def from_yaml(cls, path: str) -> "ComparisonConfig":
        import yaml

        with open(path) as f:
            raw = yaml.safe_load(f)
        mp = {
            k: MethodParams(**v) for k, v in (raw.pop("method_params", {}) or {}).items()
        }
        metrics = MetricsConfig(**raw.pop("metrics", {}))
        for key in ("definition", "methods"):
            if key in raw and isinstance(raw[key], list):
                raw[key] = tuple(raw[key])
        return cls(method_params=mp, metrics=metrics, **raw)


# Above this UNet param count, auto-routing PROBES the monolithic compile
# first (one jitted scan is ~13.5x the host-driven per-stage chain when the
# transport takes the 866M HLO — r4 measurement, docs/BENCHMARKS.md) and
# falls back to the segmented route only when the probe fails
# (models/sd_segmented.py's rationale: r2/r3 transports rejected it).
_SEGMENTED_AUTO_PARAMS = 200_000_000


def _make_segmented_transfer_fn(
    pipe: SDImg2ImgPipeline, method: str, params: MethodParams, steps: int,
    pipeline_parallel: bool = False,
):
    """Full-width SD route: VAE encode → host-driven stepwise transfer over
    the segmented stage programs → VAE decode.  Matches the reference's
    SD-as-first-class-pipeline comparison path
    (``img2img_comparison.py:100,136-155``) at widths the jitted scan
    cannot reach."""
    from phendiff_tpu.models.autoencoder_kl import (
        decode_from_latents,
        encode_to_latents,
    )
    from phendiff_tpu.models.sd_segmented import SegmentedSDUNet
    from phendiff_tpu.pipelines.conditional_ddim import (
        GuidanceConfig,
        ddim_sample_stepwise,
    )

    schedule = pipe.schedule
    use_pp = pipeline_parallel and len(jax.devices()) > 1
    if use_pp:
        from phendiff_tpu.parallel.pp import PipelinedSDUNet

        pp = PipelinedSDUNet(pipe.unet_config, dtype=pipe.dtype)
        # placement is cached per unet-params identity so a checkpoint
        # sweep re-places each checkpoint once, not once per batch
        placed_of: Dict[int, dict] = {}

        def _placed(unet_params):
            key = id(unet_params)
            if key not in placed_of:
                placed_of[key] = pp.place_params(unet_params)
            return placed_of[key]
    else:
        seg = SegmentedSDUNet(pipe.unet_config, dtype=pipe.dtype)

    encode = jax.jit(
        lambda vp, images: encode_to_latents(pipe.vae, vp, images)
    )
    decode = jax.jit(lambda vp, lat: decode_from_latents(pipe.vae, vp, lat))

    def fn(ptree, images, src_labels, tgt_labels, rng):
        unet_params = ptree["unet"]
        if use_pp:
            placed = _placed(unet_params)

            def denoiser(x, t, emb):
                return pp(placed, x, t, emb)
        else:
            def denoiser(x, t, emb):
                return seg(unet_params, x, t, emb)

        x = encode(ptree["vae"], images)
        src_emb = pipe.encode_class(src_labels, ptree["class_embedding"])
        tgt_emb = pipe.encode_class(tgt_labels, ptree["class_embedding"])
        if method == "ddib":
            out = T.ddib_stepwise(denoiser, schedule, x, src_emb, tgt_emb,
                                  num_inference_steps=steps)
        elif method == "inverted_regeneration":
            out = T.ddib_stepwise(denoiser, schedule, x, src_emb, src_emb,
                                  num_inference_steps=steps)
        elif method == "classifier_free_guidance_forward_start":
            out = ddim_sample_stepwise(
                denoiser, schedule, tgt_emb,
                start_image=x, rng=rng, add_forward_noise=True,
                num_inference_steps=steps,
                frac_diffusion_skipped=params.frac_diffusion_skipped,
                guidance=GuidanceConfig(params.guidance_scale),
            )
        elif method == "linear_interp_custom_guidance_inverted_start":
            if use_pp:
                fwd_vjp = lambda xx, tt, e: pp.forward_with_input_vjp(
                    _placed(unet_params), xx, tt, e
                )
            else:
                fwd_vjp = lambda xx, tt, e: seg.forward_with_input_vjp(
                    unet_params, xx, tt, e
                )
            out = T.guided_inverted_start_stepwise(
                denoiser, fwd_vjp,
                schedule, x, src_emb, tgt_emb,
                guidance_loss_scale=params.guidance_loss_scale, p=params.p,
                num_inference_steps=steps,
            )
        else:
            raise ValueError(f"unknown transfer method: {method}")
        return decode(ptree["vae"], out)

    return fn


def _make_transfer_fn(
    pipe, method: str, params: MethodParams, steps: int,
    segmented: bool = False,
    pipeline_parallel: bool = False,
):
    """One jitted function (params_tree, images, src_labels, tgt_labels,
    rng) → images.

    The checkpoint tree is a TRACED ARGUMENT, not a closure capture: a
    captured full-width tree (3.5 GB) is baked into the HLO as constants —
    slower lowering, doubled host memory, and a recompile per checkpoint.
    As an argument, one compiled program serves every same-architecture
    checkpoint (the reference's comparison treats pipelines as data,
    ``img2img_comparison.py:100``)."""
    is_sd = isinstance(pipe, SDImg2ImgPipeline)
    if segmented and is_sd:
        return _make_segmented_transfer_fn(
            pipe, method, params, steps, pipeline_parallel=pipeline_parallel
        )

    schedule = pipe.schedule

    def core(ptree, images, src_labels, tgt_labels, rng):
        if is_sd:
            denoiser = pipe.denoiser_fn(ptree["unet"])
            embed = lambda l: pipe.encode_class(l, ptree["class_embedding"])
            x = pipe.encode_images(images, params=ptree["vae"])
        else:
            denoiser = pipe.denoiser_fn(ptree)
            embed = lambda l: pipe.class_embeddings(l, ptree)
            x = images
        src_emb = embed(src_labels)
        tgt_emb = embed(tgt_labels)
        if method == "ddib":
            out = T.ddib(denoiser, schedule, x, src_emb, tgt_emb,
                         num_inference_steps=steps)
        elif method == "inverted_regeneration":
            out = T.inverted_regeneration(denoiser, schedule, x, src_emb,
                                          num_inference_steps=steps)
        elif method == "classifier_free_guidance_forward_start":
            out = T.cfg_forward_start(
                denoiser, schedule, x, tgt_emb, rng,
                guidance_scale=params.guidance_scale,
                frac_diffusion_skipped=params.frac_diffusion_skipped,
                num_inference_steps=steps,
            )
        elif method == "linear_interp_custom_guidance_inverted_start":
            out = T.guided_inverted_start(
                denoiser, schedule, x, src_emb, tgt_emb,
                guidance_loss_scale=params.guidance_loss_scale, p=params.p,
                num_inference_steps=steps,
            )
        else:
            raise ValueError(f"unknown transfer method: {method}")
        if is_sd:
            out = pipe.decode_latents(out, params=ptree["vae"])
        return out

    return jax.jit(core)


def _save_batch(
    images01: np.ndarray,
    basenames: List[str],
    tgt_labels: np.ndarray,
    classes: Tuple[str, ...],
    out_dir: str,
):
    from PIL import Image

    arr = (np.clip(images01, 0, 1) * 255).astype(np.uint8)
    for img, base, tgt in zip(arr, basenames, tgt_labels):
        cls = classes[int(tgt)]
        d = os.path.join(out_dir, cls)
        os.makedirs(d, exist_ok=True)
        stem = os.path.splitext(os.path.basename(base))[0]
        Image.fromarray(img).save(os.path.join(d, f"{stem}_to_{cls}.png"))


class ComparisonExperiment:
    def __init__(self, config: ComparisonConfig, tracker=None, devices=None):
        from phendiff_tpu.parallel import make_mesh

        self.config = config
        self.tracker = tracker
        # Transfer batches ride the data axis of the device mesh — the
        # TPU-native version of the reference sharding its comparison
        # inference across ranks (accelerator.prepare(dataloader) +
        # prepare_model(unet, evaluation_mode=True),
        # utils_Img2Img.py:316-317).  ``devices`` narrows the mesh (tests).
        self.mesh = make_mesh(devices)
        self._mono_probe: Dict[tuple, bool] = {}
        # One transfer program per (architecture, method, route) — NOT per
        # checkpoint: the params ride through jit as traced arguments, so
        # an N-checkpoint sweep compiles each method once (the reference
        # swaps checkpoints into one torch graph for free,
        # img2img_comparison.py:100; milestone-5 sweep parity).
        self._transfer_fns: Dict[tuple, Callable] = {}
        self.pipes = {
            name: self._load_pipeline(path)
            for name, path in config.pipelines.items()
        }
        if config.inference_param_dtype:
            # one cast at load time; every transfer/probe/shard below sees
            # the half-precision tree (ComparisonConfig.inference_param_dtype)
            self.pipes = {
                name: pipe.cast_params(config.inference_param_dtype)
                for name, pipe in self.pipes.items()
            }
        self.splits: Dict[str, DatasetIndex] = {
            "train": scan_imagefolder(config.dataset_train)
        }
        if config.dataset_test:
            self.splits["test"] = scan_imagefolder(config.dataset_test)
        self.extractor = InceptionExtractor()
        if not getattr(self.extractor, "pretrained", True):
            logging.getLogger(__name__).warning(
                "InceptionV3 is RANDOM-INIT: comparison FID/ISC/KID are not "
                "comparable to torch-fidelity or across machines."
            )

    @staticmethod
    def _load_pipeline(path: str):
        from phendiff_tpu.pipelines.io import load_model_index

        kind = load_model_index(path).get("_class_name")
        if kind == "ConditionalDDIMPipeline":
            return ConditionalDDIMPipeline.from_pretrained(path)
        if kind == "SDImg2ImgPipeline":
            return SDImg2ImgPipeline.from_pretrained(path)
        raise ValueError(f"unknown pipeline kind {kind} at {path}")

    def _transfer_fn(
        self, pipe, method: str, params: MethodParams, segmented: bool,
        pipeline_parallel: bool = False,
    ) -> Callable:
        """The (cached) transfer program for this architecture + method.
        MethodParams are per-method constants in the config, so the key
        (arch, method, steps, route) pins them too."""
        key = (
            pipe.arch_fingerprint(), method, self.config.num_inference_steps,
            segmented, pipeline_parallel,
        )
        if key not in self._transfer_fns:
            self._transfer_fns[key] = _make_transfer_fn(
                pipe, method, params, self.config.num_inference_steps,
                segmented=segmented, pipeline_parallel=pipeline_parallel,
            )
        return self._transfer_fns[key]

    def _use_segmented(self, pipe, method: str, params: MethodParams) -> bool:
        if not isinstance(pipe, SDImg2ImgPipeline):
            return False
        if self.config.segmented_sd is not None:
            return self.config.segmented_sd
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(pipe.unet_params))
        if n <= _SEGMENTED_AUTO_PARAMS:
            return False
        return not self._probe_monolithic_transfer(pipe, method, params)

    def _probe_monolithic_transfer(
        self, pipe, method: str, params: MethodParams
    ) -> bool:
        """Can the backend compile the MONOLITHIC full-width transfer scan?

        Mirrors ``train.trainer.probe_sd_monolithic_compile``: lower +
        AOT-compile the whole jitted transfer (VAE encode → 2N-step scan →
        decode) from ABSTRACT image/label inputs — no device buffers, so a
        failure leaves nothing to clean up.  Probed per (pipe, method)
        because program size is method-dependent (the reconstruction-guided
        method differentiates through the UNet every step).  Any exception
        (compile-transport rejection, OOM during compile) → segmented.

        Probed per (architecture, method): an AOT-compiled program is
        reused by every same-architecture checkpoint (params are traced
        arguments), so the probe result transfers too."""
        key = (pipe.arch_fingerprint(), method, self.config.num_inference_steps)
        if key in self._mono_probe:
            return self._mono_probe[key]
        log = logging.getLogger(__name__)
        try:
            fn = self._transfer_fn(pipe, method, params, segmented=False)
            from phendiff_tpu.parallel.mesh import DATA_AXIS

            dp = int(self.mesh.shape[DATA_AXIS])
            bs = params.batch_size + ((-params.batch_size) % dp)
            h, w = self.config.definition
            img = jax.ShapeDtypeStruct((bs, h, w, 3), jnp.float32)
            lab = jax.ShapeDtypeStruct((bs,), jnp.int32)
            ptree = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                pipe.params_tree,
            )
            fn.lower(ptree, img, lab, lab, jax.random.key(0)).compile()
            ok = True
            log.info(
                "monolithic %s transfer compiles at full width: using the "
                "one-program scan route", method,
            )
        except Exception as e:  # transport/OOM → the segmented fallback
            ok = False
            log.warning(
                "monolithic %s transfer compile failed (%s: %.200s); "
                "using the segmented per-stage route",
                method, type(e).__name__, e,
            )
        self._mono_probe[key] = ok
        return ok

    def _shard(self, images, src, tgt, enabled=True):
        """Pad a (possibly ragged-tail) batch to the mesh's data-axis size
        by repeating the last row, and place it batch-sharded on the mesh;
        returns device arrays + the real (untrimmed) count.

        ``enabled=False`` (the pipeline-parallel route) skips sharding:
        there the devices hold pipeline STAGES, not batch shards, and the
        executor moves activations stage-to-stage itself."""
        n_real = images.shape[0]
        if not enabled:
            return (jnp.asarray(images), jnp.asarray(src),
                    jnp.asarray(tgt)), n_real
        from phendiff_tpu.parallel import shard_batch
        from phendiff_tpu.parallel.mesh import DATA_AXIS

        dp = int(self.mesh.shape[DATA_AXIS])
        pad = (-n_real) % dp
        if pad:
            images = np.concatenate([images, np.repeat(images[-1:], pad, 0)])
            src = np.concatenate([src, np.repeat(src[-1:], pad)])
            tgt = np.concatenate([tgt, np.repeat(tgt[-1:], pad)])
        return shard_batch(self.mesh, (images, src, tgt)), n_real

    # -- transfers ---------------------------------------------------------
    def run_transfers(self) -> None:
        import time

        cfg = self.config
        log = logging.getLogger(__name__)
        rng = jax.random.key(cfg.seed)
        # per-(method, pipeline) wall seconds — sweep evidence that only the
        # FIRST same-architecture checkpoint pays the compile (the program
        # cache above); surfaced in timings.json next to metrics.json
        self.transfer_timings: Dict[str, Dict[str, float]] = {}
        for method in cfg.methods:
            params = cfg.method_params.get(method, MethodParams())
            for pipe_name, pipe in self.pipes.items():
                t_pipe = time.perf_counter()
                n_images = 0
                segmented = self._use_segmented(pipe, method, params)
                fn = self._transfer_fn(
                    pipe, method, params, segmented,
                    pipeline_parallel=cfg.pipeline_parallel,
                )
                ptree = pipe.params_tree
                data_parallel = not (
                    segmented and cfg.pipeline_parallel
                    and len(jax.devices()) > 1
                )
                for split_name, index in self.splits.items():
                    out_dir = os.path.join(
                        cfg.output_dir, method, pipe_name, split_name
                    )
                    from phendiff_tpu.data.imagefolder import load_image

                    bs = params.batch_size
                    for start in range(0, len(index), bs):
                        idxs = range(start, min(start + bs, len(index)))
                        images = np.stack([
                            load_image(index.paths[i], cfg.definition)
                            for i in idxs
                        ])
                        src = np.array([index.labels[i] for i in idxs],
                                       dtype=np.int32)
                        tgt = (1 - src).astype(np.int32)  # binary-class flip
                        basenames = [index.paths[i] for i in idxs]
                        rng, sub = jax.random.split(rng)
                        # batch-sharded over the mesh's data axis; the pad
                        # rows are trimmed right below (milestone 5's
                        # sharded batched img2img comparison)
                        (im_d, src_d, tgt_d), n_real = self._shard(
                            images, src, tgt, enabled=data_parallel
                        )
                        out = fn(ptree, im_d, src_d, tgt_d, sub)
                        out01 = np.asarray(to_images(out))[:n_real]
                        _save_batch(
                            out01, basenames, tgt, index.classes, out_dir,
                        )
                        if start == 0:
                            # first-batch orig/transferred pairs panel
                            # (reference wandb Table, utils_Img2Img.py:402-452)
                            from phendiff_tpu.obs.images import side_by_side

                            panel = side_by_side(
                                images[:8], np.asarray(out)[:n_real][:8]
                            )
                            panel.save(os.path.join(out_dir, "_pairs.png"))
                        n_images += n_real
                        if cfg.debug:
                            break
                wall = time.perf_counter() - t_pipe
                self.transfer_timings[f"{method}/{pipe_name}"] = {
                    "wall_s": round(wall, 3),
                    "images": n_images,
                    "images_per_sec": round(n_images / wall, 4) if wall else 0.0,
                }
                log.info(
                    "transfers %s/%s: %.1f s for %d images (%.3f img/s)",
                    method, pipe_name, wall, n_images,
                    n_images / wall if wall else 0.0,
                )
        with open(os.path.join(cfg.output_dir, "timings.json"), "w") as f:
            json.dump(self.transfer_timings, f, indent=2, sort_keys=True)

    # -- metrics -----------------------------------------------------------
    def _features_of_dir(self, d: str) -> Optional[np.ndarray]:
        idx = scan_imagefolder(d)
        loader = ImageFolderLoader(
            idx,
            LoaderConfig(batch_size=32, definition=self.config.definition,
                         normalize=False, shuffle=False, drop_last=False),
        )
        feats, logits = self.extractor.features_for(
            b.astype(np.float32) / 255.0 for b, _ in loader.all_images()
        )
        return feats, logits

    def _features_of_index(self, index: DatasetIndex) -> np.ndarray:
        loader = ImageFolderLoader(
            index,
            LoaderConfig(batch_size=32, definition=self.config.definition,
                         normalize=False, shuffle=False, drop_last=False),
        )
        feats, _ = self.extractor.features_for(
            b.astype(np.float32) / 255.0 for b, _ in loader.all_images()
        )
        return feats

    def compute_metrics(self) -> Dict[str, float]:
        cfg = self.config
        results: Dict[str, float] = {}
        for method in cfg.methods:
            for pipe_name in self.pipes:
                for split_name, index in self.splits.items():
                    out_dir = os.path.join(
                        cfg.output_dir, method, pipe_name, split_name
                    )
                    if not os.path.isdir(out_dir):
                        continue
                    fake_feats, fake_logits = self._features_of_dir(out_dir)
                    real_feats = self._features_of_index(index)
                    pooled = calculate_metrics(
                        fake_feats, real_feats, fake_logits, cfg.metrics
                    )
                    prefix = f"{method}/{pipe_name}/{split_name}"
                    for k, v in pooled.items():
                        results[f"{prefix}/{k}"] = v
                    # per-target-class metrics vs that class's true images
                    fake_idx = scan_imagefolder(out_dir)
                    for label, cname in enumerate(index.classes):
                        if cname not in fake_idx.classes:
                            continue
                        f_label = fake_idx.classes.index(cname)
                        ff, fl = (
                            self._features_of_index(fake_idx.for_class(f_label)),
                            None,
                        )
                        rf = self._features_of_index(index.for_class(label))
                        m = calculate_metrics(
                            ff, rf, None,
                            dataclasses.replace(cfg.metrics, isc=False),
                        )
                        for k, v in m.items():
                            results[f"{prefix}/{cname}/{k}"] = v
        if cfg.sweep_metric and cfg.sweep_metric in results:
            results["sweep_metric"] = results[cfg.sweep_metric]
        with open(os.path.join(cfg.output_dir, "metrics.json"), "w") as f:
            json.dump(results, f, indent=2, sort_keys=True)
        if self.tracker is not None:
            self.tracker.log(results, 0)
        return results

    def run(self) -> Dict[str, float]:
        self.run_transfers()
        return self.compute_metrics()
