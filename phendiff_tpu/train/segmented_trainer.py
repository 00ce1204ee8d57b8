"""Training orchestrator for the FULL-WIDTH segmented SD fine-tune.

``SegmentedSDTrainStep`` is a step primitive; this module makes it a real
training run with the same run-loop semantics as the standard ``Trainer``
(reference ``train.py:367-432`` + ``src/utils_training.py:541-640``):

* epoch loop over the shared data plumbing (``trainer.build_data``) with a
  frozen-VAE encode to latents per batch (``utils_training.py:237-241``);
* UNet *and* class-embedding training (``components_to_train``) through the
  step's ``ctx`` stage, global grad-norm clip at ``max_grad_norm``
  (``utils_training.py:439-449``), per-stage EMA;
* Orbax checkpointing of the complete per-stage state
  (params / EMA / per-stage optimizer states / step) with rotation and
  "latest" resume incl. exact skip of consumed batches
  (``utils_training.py:57-96``);
* periodic EMA-weighted eval: HOST-DRIVEN stepwise generation through the
  segmented stage programs (no monolithic sampling scan — the full-width
  HLO exceeds constrained compile transports, models/sd_segmented.py),
  FID/ISC/KID via the standard ``Evaluator``, best-model
  ``save_pretrained`` gated on the mean per-class main metric
  (``utils_training.py:576-640, 1004-1061``).

Why not reuse ``Trainer`` directly: its step is ONE jitted function over
the mesh; the segmented path is a host-driven chain of per-stage programs
with its own state layout (per-stage optimizer states, donated buffers).
Everything around the step — data, eval metrics, checkpoint rotation,
tracker — is shared.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from phendiff_tpu.core.precision import Policy
from phendiff_tpu.models.autoencoder_kl import decode_from_latents, encode_to_latents
from phendiff_tpu.models.sd_segmented import SegmentedSDUNet
from phendiff_tpu.obs.trackers import make_tracker
from phendiff_tpu.pipelines.conditional_ddim import (
    GuidanceConfig,
    ddim_sample_stepwise,
)
from phendiff_tpu.pipelines.sd_img2img import SDImg2ImgPipeline
from phendiff_tpu.train.checkpoints import CheckpointManager
from phendiff_tpu.train.eval_loop import (
    Evaluator,
    get_initial_best_metric,
    is_it_best_model,
)
from phendiff_tpu.train.segmented_train import CtxEmbed, SegmentedSDTrainStep
from phendiff_tpu.train.trainer import RunPaths, TrainerConfig, build_data
from phendiff_tpu.train.train_loop import make_lr_schedule

Array = jax.Array


class SegmentedSDTrainer:
    """Run loop around ``SegmentedSDTrainStep``.

    ``clip_mode``: "recompute" (default; ≤1 stage's grads live, 2× backward
    — the only mode that fits FULL WIDTH with EMA on a 16 GB chip:
    params+moments+EMA ≈ 13.8 GB leave no room for a 3.5 GB cached grad
    tree) or "cache" (single backward + one gradient-sized cache; faster
    when headroom exists, e.g. smaller widths or EMA disabled) — see
    segmented_train.py.  ``donate=True`` reuses param/opt/EMA buffers in
    place (required for full width on 16 GB)."""

    def __init__(
        self,
        pipe: SDImg2ImgPipeline,
        config: TrainerConfig,
        paths: RunPaths,
        components_to_train: Tuple[str, ...] = ("denoiser", "class_embedding"),
        clip_mode: str = "recompute",
        cache_dtype=None,
        donate: bool = True,
        tracker=None,
        seg: Optional[SegmentedSDUNet] = None,
        copy_params: bool = True,
        attention_fine_tuning: bool = False,
    ):
        """``copy_params=False`` adopts the pipeline's param arrays instead
        of copying them — REQUIRED at full width (a second 3.5 GB param
        tree does not fit beside params+EMA+moments on 16 GB).  The caller
        must then drop its own references (``pipe.unet_params = None``)
        and treat the pipeline object as config-only.

        ``attention_fine_tuning`` narrows the trainable UNet leaves to the
        Transformer2D blocks (reference ``train.py:202-220``), exactly as
        the monolithic route's mask (``trainer.attention_param_mask``) —
        here as per-leaf ``multi_transform`` routing, which stays exact
        under per-stage optimizer application."""
        for c in components_to_train:
            if c not in ("denoiser", "class_embedding"):
                raise ValueError(
                    f"unsupported component for the SD family on the "
                    f"segmented route: {c}"
                )
        if attention_fine_tuning and "denoiser" not in components_to_train:
            # same invariant as check_args / reference train.py:206-209
            raise ValueError(
                "Attention fine tuning requires 'denoiser' to be trained"
            )
        self.config = config
        self.paths = paths
        self.pipe = pipe
        self.donate = donate
        policy = Policy.from_mixed_precision(config.mixed_precision)
        self.seg = seg or SegmentedSDUNet(pipe.unet_config, dtype=policy.compute_jnp)
        self.ctx_module = CtxEmbed(
            pipe.num_classes, pipe.class_embedding_dim,
            dtype=policy.compute_jnp,
        )

        # per-leaf optimizer (global clipping is the STEP's job via
        # max_grad_norm — a chained clip_by_global_norm would be rejected)
        opt_cfg = config.train.optimizer
        base = optax.adamw(
            learning_rate=make_lr_schedule(opt_cfg),
            b1=opt_cfg.adam_beta1,
            b2=opt_cfg.adam_beta2,
            eps=opt_cfg.adam_epsilon,
            weight_decay=opt_cfg.adam_weight_decay,
        )
        active = set(components_to_train)
        if active == {"denoiser", "class_embedding"} and not attention_fine_tuning:
            optimizer = base
        else:
            # freeze by component: the ctx stage holds the embedding; every
            # other top-level module belongs to the denoiser (name-keyed
            # per-leaf routing, exact under per-stage application).  Under
            # attention fine-tuning only the Transformer2D modules keep the
            # "unet" label (exact-name regex, no substring matching).
            from phendiff_tpu.train.trainer import _ATTENTION_MODULE_RE

            def module_label(name: str) -> str:
                if name == "class_embedding":
                    return "ce"
                if attention_fine_tuning and not _ATTENTION_MODULE_RE.match(name):
                    return "frozen"
                return "unet"

            def label_fn(tree):
                def walk(t, lbl):
                    if isinstance(t, dict):
                        return {
                            k: walk(v, lbl if lbl is not None else module_label(k))
                            for k, v in t.items()
                        }
                    return lbl if lbl is not None else "unet"

                return walk(tree, None)

            optimizer = optax.multi_transform(
                {
                    "unet": base if "denoiser" in active else optax.set_to_zero(),
                    "ce": base
                    if "class_embedding" in active
                    else optax.set_to_zero(),
                    "frozen": optax.set_to_zero(),
                },
                label_fn,
            )
        max_norm = opt_cfg.max_grad_norm if opt_cfg.max_grad_norm and opt_cfg.max_grad_norm > 0 else None
        self._lr_sched = make_lr_schedule(opt_cfg)
        self.step_fn = SegmentedSDTrainStep(
            self.seg, pipe.schedule, optimizer,
            proba_uncond=config.train.proba_uncond,
            ema=config.train.ema,
            max_grad_norm=max_norm,
            clip_mode=clip_mode,
            cache_dtype=cache_dtype,
            ctx_module=self.ctx_module,
        )

        # params: UNet stages + the ctx (class embedding) stage, merged
        # into one per-module tree (f32 leaves; copied by default so
        # donation never invalidates the pipeline object's arrays).  On
        # resume, skip materialization entirely — maybe_resume restores
        # from ABSTRACT shapes, so no throwaway 13.8 GB state is allocated
        # just to be overwritten.
        self.params = None
        self.ema_params = None
        self.opt_state = None
        self.global_step = 0
        if config.resume_from_checkpoint is None:
            cp = (lambda v: jax.tree.map(jnp.copy, v)) if copy_params else (
                lambda v: v
            )
            merged = {k: cp(v) for k, v in pipe.unet_params["params"].items()}
            merged["class_embedding"] = jax.tree.map(
                jnp.copy, pipe.class_embedding_params["params"]
            )
            self.params = {"params": merged}
            self.ema_params = jax.tree.map(jnp.copy, self.params)
            self.opt_state = self.step_fn.init_opt_state(self.params)

        self.vae_params = pipe.vae_params  # frozen

        def _enc(vp, images, rng):
            if images.dtype == jnp.uint8:
                # uint8 transport (TrainerConfig.upload_uint8; see
                # train_loop.make_train_step for the quantization contract)
                x = images.astype(jnp.float32) / 127.5 - 1.0
            else:
                x = images.astype(jnp.float32)
            return encode_to_latents(pipe.vae, vp, x, rng)

        self._encode = jax.jit(_enc)
        self._decode = jax.jit(
            lambda vp, latents: decode_from_latents(pipe.vae, vp, latents)
        )
        self._ctx_apply = jax.jit(
            lambda p, labels: self.ctx_module.apply(p, labels)
        )

        self.ckpt = CheckpointManager(
            paths.checkpoints, config.checkpoints_total_limit
        )
        self.tracker = tracker or make_tracker(config.tracker, paths.run_dir)
        self.best_metric = get_initial_best_metric()

        self.index, self.loader, eval_index = build_data(config)
        self.evaluator = None
        if config.compute_metrics:
            self.evaluator = Evaluator(
                config.eval, eval_index, config.definition,
                cache_root=paths.fidelity_cache,
            )

    # -- state (de)serialization -------------------------------------------
    def _payload(self) -> Dict:
        return {
            "step": jnp.asarray(self.global_step, jnp.int32),
            "params": self.params,
            "ema": self.ema_params,
            "opt": self.opt_state,
        }

    def _abstract_payload(self) -> Dict:
        """Shape/dtype skeleton of the checkpoint payload, computed WITHOUT
        allocating any device buffers (resume at full width cannot afford a
        13.8 GB throwaway state)."""
        cfg = self.pipe.unet_config
        lat = cfg.sample_size

        def shapes():
            unet = jax.eval_shape(
                self.seg.init, jax.random.key(0),
                jnp.zeros((1, lat, lat, cfg.in_channels)),
                jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, 77, cfg.cross_attention_dim)),
            )
            ce = jax.eval_shape(
                self.ctx_module.init, jax.random.key(0),
                jnp.zeros((1,), jnp.int32),
            )
            merged = dict(unet["params"])
            merged["class_embedding"] = ce["params"]["class_embedding"]
            return {"params": merged}

        params = shapes()
        opt = jax.eval_shape(self.step_fn.init_opt_state, params)
        return {
            "step": jax.ShapeDtypeStruct((), jnp.int32),
            "params": params,
            "ema": params,
            "opt": opt,
        }

    def maybe_resume(self) -> Tuple[int, int]:
        """Returns (first_epoch, batches_to_skip_in_first_epoch) — exact
        consumed-batch skip, reference ``utils_training.py:57-96``."""
        cfg = self.config
        if cfg.resume_from_checkpoint is None:
            return 0, 0
        step = (
            None
            if cfg.resume_from_checkpoint == "latest"
            else int(cfg.resume_from_checkpoint)
        )
        restored = self.ckpt.restore(self._abstract_payload(), step)
        self.params = restored["params"]
        self.ema_params = restored["ema"]
        self.opt_state = restored["opt"]
        self.global_step = int(restored["step"])
        steps_per_epoch = len(self.loader)
        return (
            self.global_step // steps_per_epoch,
            self.global_step % steps_per_epoch,
        )

    # -- eval / best model -------------------------------------------------
    def _ema_unet_params(self) -> dict:
        return {
            "params": {
                k: v
                for k, v in self.ema_params["params"].items()
                if k != "class_embedding"
            }
        }

    def _ema_ce_params(self) -> dict:
        """In the PIPELINE's class_embedding component layout."""
        return {"params": self.ema_params["params"]["class_embedding"]}

    def _ema_ctx_params(self) -> dict:
        """In the ctx MODULE's layout (class_embedding submodule level)."""
        return {
            "params": {
                "class_embedding": self.ema_params["params"]["class_embedding"]
            }
        }

    def make_generate_fn(self):
        """EMA-weighted ``(labels, rng, num_inference_steps) → [-1,1]
        images`` through the segmented stage programs."""
        cfg = self.config
        unet_p = self._ema_unet_params()
        ce_p = self._ema_ctx_params()
        lat = self.pipe.unet_config.sample_size
        c = self.pipe.unet_config.in_channels

        def denoiser(x, t, seq):
            return self.seg(unet_p, x, t, seq)

        def generate(labels, rng, num_inference_steps):
            class_seq = self._ctx_apply(ce_p, labels)
            latents = ddim_sample_stepwise(
                denoiser, self.pipe.schedule, class_seq,
                shape=(labels.shape[0], lat, lat, c), rng=rng,
                num_inference_steps=num_inference_steps,
                guidance=GuidanceConfig(cfg.eval.guidance_factor),
            )
            return self._decode(self.vae_params, latents)

        return generate

    def save_pipeline(self, dirpath: str) -> None:
        """EMA-weighted diffusers-layout ``save_pretrained``
        (``utils_training.py:1004-1061``)."""
        as_np = lambda t: jax.tree.map(np.asarray, t)
        self.pipe.replace_params(
            unet_params=as_np(self._ema_unet_params()),
            class_embedding_params=as_np(self._ema_ce_params()),
        ).save_pretrained(dirpath)

    def _run_eval(self):
        generate_fn = self.make_generate_fn()
        mean_main = None
        if self.evaluator is not None:
            metrics = self.evaluator.evaluate(
                generate_fn, self.global_step, tracker=self.tracker
            )
            mean_main = metrics.get("main_metric_mean")
        save_dir = self.paths.full_pipeline_save
        populated = os.path.isdir(save_dir) and bool(os.listdir(save_dir))
        if mean_main is None:
            if not populated:
                self.save_pipeline(save_dir)
        elif is_it_best_model(mean_main, self.best_metric):
            self.best_metric = mean_main
            self.save_pipeline(save_dir)

    # -- main loop ---------------------------------------------------------
    def _flush_metrics(self, pending, timer) -> None:
        """Materialize + log a PREVIOUS step's metrics.  Deferring this by
        one step is what pipelines the host: step N+1's decode (loader
        thread), VAE-encode dispatch and ~25 stage-program dispatches all
        run while the device is still executing step N — the reference
        gets the same overlap from its prefetching DataLoader workers
        (utils_training.py:212-256).  The blocking float() here is then
        device-bound residual time, reported as ``perf/t_await_s``."""
        if pending is None:
            return
        step_no, epoch, metrics, times = pending
        t0 = time.perf_counter()
        # ONE packed fetch — per-scalar fetches cost a ~30 ms tunnel round
        # trip EACH (see Trainer._flush_metrics)
        keys = sorted(k for k, v in metrics.items() if jnp.ndim(v) == 0)
        packed = np.asarray(
            jnp.stack([metrics[k].astype(jnp.float32) for k in keys])
        )
        host = dict(zip(keys, map(float, packed)))
        times["perf/t_await_s"] = time.perf_counter() - t0
        host["epoch"] = epoch
        host["lr"] = float(self._lr_sched(step_no))
        host.update(times)
        host.update(timer.stats(self.config.train_batch_size))
        self.tracker.log(host, step_no)
        if host.get("nonfinite"):
            self.tracker.alert(
                "NaN", f"non-finite loss at step {step_no}"
            )

    def run(self):
        from phendiff_tpu.obs.profiling import StepTimer

        cfg = self.config
        first_epoch, skip = self.maybe_resume()
        root_key = jax.random.key(cfg.seed)
        timer = StepTimer()
        done = False
        pending = None  # one-step-deferred metrics (host/device overlap)

        for epoch in range(first_epoch, cfg.num_epochs):
            skip_batches = skip if epoch == first_epoch else 0
            t_iter = time.perf_counter()
            for images, labels in self.loader.epoch(epoch, skip_batches):
                # phase decomposition (VERDICT r3 #2's creep hunt): time
                # blocked on the loader vs host dispatch vs device await
                t_data_end = time.perf_counter()
                rng = jax.random.fold_in(root_key, self.global_step)
                k_enc, k_step = jax.random.split(rng)
                latents = self._encode(
                    self.vae_params, jnp.asarray(images), k_enc
                )
                self.params, self.opt_state, self.ema_params, metrics = (
                    self.step_fn(
                        self.params, self.opt_state, latents,
                        jnp.asarray(labels), k_step,
                        donate=self.donate,
                        ema_params=self.ema_params,
                        step=self.global_step,
                    )
                )
                self.global_step += 1
                timer.tick()
                times = {
                    "perf/t_data_s": t_data_end - t_iter,
                    "perf/t_dispatch_s": time.perf_counter() - t_data_end,
                }
                self._flush_metrics(pending, timer)
                pending = (self.global_step, epoch, metrics, times)
                if self.global_step % cfg.checkpointing_steps == 0:
                    self._flush_metrics(pending, timer)
                    pending = None
                    self.ckpt.save(self.global_step, self._payload())
                if (
                    cfg.eval_every_opti_steps
                    and self.global_step % cfg.eval_every_opti_steps == 0
                ):
                    self._flush_metrics(pending, timer)
                    pending = None
                    self._run_eval()
                if cfg.max_train_steps and self.global_step >= cfg.max_train_steps:
                    done = True
                    break
                t_iter = time.perf_counter()
            self._flush_metrics(pending, timer)
            pending = None
            precise = (
                cfg.precise_first_n_epochs is not None
                and epoch < cfg.precise_first_n_epochs
            )
            if precise or (
                cfg.eval_every_epochs
                and (epoch + 1) % cfg.eval_every_epochs == 0
            ):
                self._run_eval()
            if done:
                break
        if cfg.save_final_checkpoint:
            self.ckpt.save(self.global_step, self._payload())
        return self._payload()
