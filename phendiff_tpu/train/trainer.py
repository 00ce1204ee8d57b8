"""Training orchestrator: run-dir layout, epoch loop, eval cadence, resume,
best-model persistence.

Capability parity with the reference's ``train.py`` main loop +
``utils_training.py`` engine + ``utils_misc.create_repo_structure``:

* run-dir layout ``exp_parent/experiment/run/{checkpoints, full_pipeline_save}``
  with a shared ``.fidelity_cache`` at the parent (``utils_misc.py:197-275``);
* epoch loop with per-epoch or per-optimization-step eval cadence
  (``train.py:367-432``, ``utils_training.py:338-361``);
* checkpoint every ``checkpointing_steps`` with rotation, resume from
  "latest" with exact skip of consumed batches (``utils_training.py:57-96``);
* EMA-weighted best-model ``save_pretrained`` gated on the mean per-class
  main metric; never overwrites a populated save at run start
  (``utils_training.py:1004-1061``);
* NaN loss / grad-norm alerts (``utils_training.py:328-336,441-449``);
* lr × sqrt(data-parallel size) scaling (``train.py:268-285``).

Both model families plug in through three callables (model_apply /
embed_fn / encode_fn) built by ``for_ddim_pipeline`` / ``for_sd_pipeline``.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import math
import os
import re
import time
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from phendiff_tpu.core.precision import Policy
from phendiff_tpu.data.imagefolder import (
    DatasetIndex,
    ImageFolderLoader,
    LoaderConfig,
    balanced_subsample,
    scan_imagefolder,
)
from phendiff_tpu.models.embeddings import pad_to_clip_sequence
from phendiff_tpu.obs.trackers import Tracker, make_tracker
from phendiff_tpu.parallel import (
    make_mesh,
    shard_batch,
    shard_train_state,
)
from phendiff_tpu.parallel.mesh import DATA_AXIS
from phendiff_tpu.pipelines.ddim_pipeline import ConditionalDDIMPipeline
from phendiff_tpu.pipelines.sd_img2img import SDImg2ImgPipeline
from phendiff_tpu.train.checkpoints import CheckpointManager
from phendiff_tpu.train.eval_loop import (
    EvalConfig,
    Evaluator,
    get_initial_best_metric,
    is_it_best_model,
)
from phendiff_tpu.train.train_loop import (
    TrainConfig,
    TrainState,
    init_train_state,
    make_optimizer,
    make_train_step,
)

Array = jax.Array


@dataclasses.dataclass
class RunPaths:
    """Run directory layout (reference docstring utils_misc.py:197-213)."""

    run_dir: str
    checkpoints: str
    full_pipeline_save: str
    fidelity_cache: str

    @classmethod
    def create(cls, exp_parent: str, experiment: str, run_name: str) -> "RunPaths":
        run_dir = os.path.join(exp_parent, experiment, run_name)
        paths = cls(
            run_dir=run_dir,
            checkpoints=os.path.join(run_dir, "checkpoints"),
            full_pipeline_save=os.path.join(run_dir, "full_pipeline_save"),
            fidelity_cache=os.path.join(exp_parent, ".fidelity_cache"),
        )
        for p in (paths.run_dir, paths.checkpoints, paths.fidelity_cache):
            os.makedirs(p, exist_ok=True)
        return paths


@dataclasses.dataclass
class TrainerConfig:
    # data (reference args: train_data_dir, definition, perc_samples, ...)
    train_data_dir: str = ""
    # HF-datasets route (reference --dataset_name/--split, which the
    # reference itself stubs with NotImplementedError): local arrow /
    # imagefolder path or hub id, loaded via data/hf_datasets.py
    dataset_name: Optional[str] = None
    dataset_config_name: Optional[str] = None
    split: str = "train"
    cache_dir: Optional[str] = None
    definition: Tuple[int, int] = (128, 128)
    perc_samples: float = 100.0
    # metrics reference set: full dataset (reference default) vs the
    # perc_samples-subsampled training set
    compute_metrics_full_dataset: bool = True
    seed: int = 0
    data_aug_on_the_fly: bool = True
    loader_prefetch: int = 2
    train_batch_size: int = 16
    # run control
    num_epochs: int = 10
    max_train_steps: Optional[int] = None
    eval_every_epochs: Optional[int] = 1
    eval_every_opti_steps: Optional[int] = None
    # additionally eval every epoch during the first n epochs
    precise_first_n_epochs: Optional[int] = None
    checkpointing_steps: int = 1000
    checkpoints_total_limit: Optional[int] = None
    resume_from_checkpoint: Optional[str] = None  # "latest" or a step number
    mixed_precision: str = "bf16"
    compute_metrics: bool = True
    # Rematerialize UNet blocks in backward. With the fused attention
    # backward kernel, 128px training fits batch 96+ WITHOUT remat on a
    # 16GB v5e and runs ~19% faster (160.9 vs 130.5 samples/s at batch 32);
    # enable for larger resolutions/models where activations exceed HBM.
    remat: bool = False
    # Tensor parallelism: shard params over a model mesh axis
    # (parallel/tp.py rules); devices are split data x model.  1 = pure
    # data parallelism (the reference's only mode).
    model_parallel: int = 1
    # Write the end-of-run checkpoint (reference behavior).  Profiling /
    # benchmark runs set False: over a dev tunnel the 14 GB full-width
    # state downloads at ~3 MB/s (~80 min) — not a cost a timing run
    # should pay.
    save_final_checkpoint: bool = True
    # Materialize+log metrics every N steps (one stacked host fetch for
    # all N records).  1 = per-step (reference cadence).  On tunnel
    # runtimes each host fetch costs a ~30 ms flush round trip, so N>1
    # removes it from the per-step critical path; every record is still
    # logged (with its own step number) — only materialization batches.
    # NaN alerts lag by at most N-1 steps.
    metrics_flush_every: int = 1
    # Ship training batches as uint8 and normalize on device (4x fewer
    # host→device bytes; the post-resize uint8 quantization is exactly
    # what the reference's torchvision Resize→ToTensor does).  Off by
    # default to keep the f32-exact pipeline.
    upload_uint8: bool = False
    # engine configs
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    eval: EvalConfig = dataclasses.field(default_factory=EvalConfig)
    tracker: str = "jsonl"


def build_data(config: TrainerConfig):
    """Training data plumbing shared by both trainers: per-host shard of
    the global batch (multi-host: each process loads 1/process_count of
    every batch — replaces the reference's per-rank DataLoader + DDP).

    Returns ``(index, loader, eval_index)`` where ``eval_index`` is the
    metrics reference set (full dataset by default, reference behavior)."""
    loader_cfg = LoaderConfig(
        batch_size=config.train_batch_size // jax.process_count(),
        definition=config.definition,
        transport="uint8" if config.upload_uint8 else "f32",
        random_flip=config.data_aug_on_the_fly,
        seed=config.seed,
        prefetch=config.loader_prefetch,
        num_shards=jax.process_count(),
        shard_index=jax.process_index(),
    )
    if config.dataset_name is not None:
        from phendiff_tpu.data.hf_datasets import load_hf_dataset

        if config.perc_samples < 100:
            raise NotImplementedError(
                "perc_samples subsampling is not supported on the "
                "HF-datasets route yet; use an imagefolder"
            )
        adapter = load_hf_dataset(
            config.dataset_name, loader_cfg, split=config.split,
            config_name=config.dataset_config_name,
            cache_dir=config.cache_dir,
        )
        return adapter, adapter, adapter
    full_index = scan_imagefolder(config.train_data_dir)
    index = full_index
    if config.perc_samples < 100:
        index = balanced_subsample(full_index, config.perc_samples, config.seed)
    eval_index = full_index if config.compute_metrics_full_dataset else index
    return index, ImageFolderLoader(index, loader_cfg), eval_index


class Trainer:
    def __init__(
        self,
        config: TrainerConfig,
        paths: RunPaths,
        *,
        model_apply: Callable,
        embed_fn: Callable,
        trainable_params: dict,
        schedule,
        generate_fn_builder: Callable,  # (state) -> generate_fn for eval
        save_pipeline_fn: Callable,  # (state, dirpath) -> None
        encode_fn: Optional[Callable] = None,
        encode_inside_grad: bool = False,
        tracker: Optional[Tracker] = None,
        devices=None,
        trainable_mask=None,
        copy_params: bool = True,
    ):
        self.config = config
        self.paths = paths
        self.mesh = make_mesh(devices, model_parallel=config.model_parallel)
        # lr scaling follows the number of DATA ranks (the reference's
        # num_processes): model-axis devices hold shards of ONE replica.
        dp_size = int(self.mesh.shape[DATA_AXIS])
        if config.model_parallel > 1:
            # register the mesh so the fused Pallas attention runs under
            # shard_map (heads over the model axis — embarrassingly
            # parallel, no collectives); a bare pallas_call has no GSPMD
            # partitioning rule, and the XLA-attention fallback costs ~2.7x
            # (docs/BENCHMARKS.md r2 ablation)
            from phendiff_tpu.ops.attention import set_tp_mesh

            set_tp_mesh(self.mesh)
            logging.getLogger(__name__).info(
                "tensor parallelism model=%d over %d devices (data=%d); "
                "fused attention via shard_map over the mesh",
                config.model_parallel, self.mesh.devices.size, dp_size,
            )

        # lr × sqrt(world size), as the reference does across DDP ranks
        opt_cfg = dataclasses.replace(
            config.train.optimizer, lr_scale=math.sqrt(dp_size)
        )
        self.train_cfg = dataclasses.replace(config.train, optimizer=opt_cfg)

        self.optimizer = make_optimizer(opt_cfg, trainable_mask)
        self.schedule = schedule
        # donate the state: params/opt/EMA buffers are reused in place,
        # halving peak HBM (the reference relies on torch's allocator for
        # the same effect)
        self._step_fn = jax.jit(
            make_train_step(
                model_apply, embed_fn, schedule, self.train_cfg,
                self.optimizer, encode_fn,
                encode_inside_grad=encode_inside_grad,
            ),
            donate_argnums=(0,),
        )
        # model_parallel=1: every tp_spec is P() and this is plain
        # replication; >1: params/moments/EMA shard over the model axis
        # copy_params=False adopts the caller's param arrays (full-width SD:
        # a second 3.5 GB tree does not fit on 16 GB; the caller's refs are
        # then consumed by the donating step — see init_train_state)
        self.state = shard_train_state(
            init_train_state(trainable_params, self.optimizer, copy=copy_params),
            self.mesh,
        )
        self.ckpt = CheckpointManager(
            self.paths.checkpoints, config.checkpoints_total_limit
        )
        self.tracker = tracker or make_tracker(config.tracker, paths.run_dir)
        self.generate_fn_builder = generate_fn_builder
        self.save_pipeline_fn = save_pipeline_fn
        self.best_metric = get_initial_best_metric()

        self.index, self.loader, eval_index = build_data(config)
        self.evaluator = None
        if config.compute_metrics:
            def _eval_shard(labels):
                dp = int(self.mesh.shape[DATA_AXIS])
                rem = int(labels.shape[0]) % dp
                if rem:
                    # Pad to the next multiple of the data-axis size by
                    # cycling the batch (eval batches are one class, so the
                    # extras are valid draws of the same class; the
                    # Evaluator trims to nb_generated_images at the end).
                    # Generation stays data-parallel — the reference keeps
                    # all ranks busy the same way (utils_training.py:128-139).
                    target = int(labels.shape[0]) + dp - rem
                    labels = jnp.resize(labels, (target,))
                return shard_batch(self.mesh, labels)

            self.evaluator = Evaluator(
                config.eval,
                eval_index,
                config.definition,
                cache_root=self.paths.fidelity_cache,
                shard_fn=_eval_shard,
            )

    # -- resume ------------------------------------------------------------
    def maybe_resume(self) -> Tuple[int, int]:
        """Returns (first_epoch, batches_to_skip_in_first_epoch)."""
        cfg = self.config
        if cfg.resume_from_checkpoint is None:
            return 0, 0
        step = (
            None
            if cfg.resume_from_checkpoint == "latest"
            else int(cfg.resume_from_checkpoint)
        )
        self.state = self.ckpt.restore(self.state, step)
        global_step = int(self.state.step)
        steps_per_epoch = len(self.loader)
        first_epoch = global_step // steps_per_epoch
        resume_step = global_step % steps_per_epoch
        return first_epoch, resume_step

    # -- eval + best-model -------------------------------------------------
    def _run_eval(self, global_step: int):
        generate_fn = self.generate_fn_builder(self.state)
        if self.evaluator is not None:
            metrics = self.evaluator.evaluate(
                generate_fn, global_step, tracker=self.tracker
            )
            mean_main = metrics.get("main_metric_mean")
        else:
            mean_main = None
        save_dir = self.paths.full_pipeline_save
        populated = os.path.isdir(save_dir) and bool(os.listdir(save_dir))
        if mean_main is None:
            if not populated:
                self.save_pipeline_fn(self.state, save_dir)
        elif is_it_best_model(mean_main, self.best_metric):
            self.best_metric = mean_main
            self.save_pipeline_fn(self.state, save_dir)

    # -- main loop -----------------------------------------------------------
    def _flush_metrics(self, pending, timer) -> None:
        """Materialize + log the PREVIOUS steps' metrics (a list of
        deferred records).  Deferring by ≥1 step pipelines the host: the
        next step's decode (loader), batch sharding and step dispatch run
        while the device executes the current one — the reference gets the
        same overlap from its prefetching DataLoader workers
        (utils_training.py:212-256).  All records' scalars are pulled in
        ONE stacked host fetch: each fetch costs a ~30 ms flush round trip
        on tunnel runtimes (the only true barrier there —
        obs.profiling.force_sync), so per-scalar or per-step fetching
        taxes the hot loop (measured: 0.38 s of a 0.47 s full-width step).
        The fetch duration is the device-bound residual,
        ``perf/t_await_s`` on the newest record."""
        if not pending:
            return
        t0 = time.perf_counter()
        keys = sorted(
            k for k, v in pending[0][2].items() if jnp.ndim(v) == 0
        )
        packed = np.asarray(
            jnp.stack([
                jnp.stack([m[k].astype(jnp.float32) for k in keys])
                for _, _, m, _ in pending
            ])
        )
        t_await = time.perf_counter() - t0
        for (step_no, epoch, _, times), row in zip(pending, packed):
            host = dict(zip(keys, map(float, row)))
            times["perf/t_await_s"] = t_await if step_no == pending[-1][0] else 0.0
            host["epoch"] = epoch
            host.update(times)
            host.update(timer.stats(self.config.train_batch_size))
            self.tracker.log(host, step_no)
            if host.get("nonfinite"):
                self.tracker.alert(
                    "NaN", f"non-finite loss/grad at step {step_no}"
                )
        pending.clear()

    def run(self) -> TrainState:
        from phendiff_tpu.obs.profiling import StepTimer

        cfg = self.config
        first_epoch, skip = self.maybe_resume()
        global_step = int(self.state.step)
        root_key = jax.random.key(cfg.seed)
        done = False
        timer = StepTimer()
        flush_every = max(1, cfg.metrics_flush_every)
        pending = []  # deferred metrics records (host/device overlap)

        for epoch in range(first_epoch, cfg.num_epochs):
            skip_batches = skip if epoch == first_epoch else 0
            t_iter = time.perf_counter()
            for images, labels in self.loader.epoch(epoch, skip_batches):
                t_data_end = time.perf_counter()
                batch = shard_batch(self.mesh, (images, labels))
                self.state, metrics = self._step_fn(self.state, batch, root_key)
                global_step += 1
                timer.tick()
                times = {
                    "perf/t_data_s": t_data_end - t_iter,
                    "perf/t_dispatch_s": time.perf_counter() - t_data_end,
                }
                if len(pending) >= flush_every:
                    self._flush_metrics(pending, timer)
                pending.append((global_step, epoch, metrics, times))

                if global_step % cfg.checkpointing_steps == 0:
                    self._flush_metrics(pending, timer)
                    self.ckpt.save(global_step, self.state)
                if (
                    cfg.eval_every_opti_steps
                    and global_step % cfg.eval_every_opti_steps == 0
                ):
                    self._flush_metrics(pending, timer)
                    self._run_eval(global_step)
                if cfg.max_train_steps and global_step >= cfg.max_train_steps:
                    done = True
                    break
                t_iter = time.perf_counter()
            self._flush_metrics(pending, timer)
            precise = (
                cfg.precise_first_n_epochs is not None
                and epoch < cfg.precise_first_n_epochs
            )
            if precise or (
                cfg.eval_every_epochs
                and (epoch + 1) % cfg.eval_every_epochs == 0
            ):
                self._run_eval(global_step)
            if done:
                break
        if cfg.save_final_checkpoint:
            self.ckpt.save(global_step, self.state)
        return self.state


# ---------------------------------------------------------------------------
# Model-family adapters
# ---------------------------------------------------------------------------

# Attention block modules in BOTH UNet families share this naming scheme
# (models/unet2d.py SelfAttention2D, models/sd_unet.py Transformer2D): the
# reference's --attention_fine_tuning re-enables grads on exactly the
# modules carrying an ``attentions`` attribute (train.py:202-220), i.e.
# these whole blocks — not just their q/k/v projections.
_ATTENTION_MODULE_RE = re.compile(r"^(down_\d+_attn_\d+|mid_attn|up_\d+_attn_\d+)$")


def attention_param_mask(params):
    """Bool pytree: True exactly for leaves under attention block modules.

    Matches module names precisely (no substring matching — a param
    collection whose name merely *contains* "attn" stays frozen)."""

    def walk(tree, in_attn):
        if isinstance(tree, dict):
            return {
                k: walk(v, in_attn or bool(_ATTENTION_MODULE_RE.match(k)))
                for k, v in tree.items()
            }
        return in_attn

    return walk(params, False)


def for_ddim_pipeline(
    pipe: ConditionalDDIMPipeline, config: TrainerConfig, paths: RunPaths,
    attention_fine_tuning: bool = False,
    **kw,
) -> Trainer:
    policy = Policy.from_mixed_precision(config.mixed_precision)
    from phendiff_tpu.models.unet2d import CondUNet2D

    model = CondUNet2D(
        pipe.unet_config, dtype=policy.compute_jnp, remat=config.remat,
        # lane packing is a single-chip minor-dim-utilization layout; under
        # tensor parallelism the channel dim is sharded instead
        # (parallel/tp.py docstring)
        lane_pack=pipe.lane_pack and config.model_parallel == 1,
    )

    def model_apply(params, x, t, class_emb):
        return model.apply(params, x, t, class_emb=class_emb)

    def embed_fn(params, labels):
        return params["params"]["class_embedding"]["embedding"][labels]

    # Jitted ONCE per trainer with the EMA tree as a traced argument: the
    # 50-step sampling scan would otherwise re-trace on every eval pass
    # (each eval builds a fresh closure over new EMA params).  Repeat evals
    # and repeat batches of the same shape reuse the compiled executable.
    @functools.partial(jax.jit, static_argnames=("num_inference_steps",))
    def _generate_jit(ema_params, labels, rng, num_inference_steps):
        return pipe.generate(
            labels, rng, num_inference_steps=num_inference_steps,
            guidance_factor=config.eval.guidance_factor,
            unconditional=config.eval.unconditional,
            params=ema_params,
        )

    def generate_fn_builder(state: TrainState):
        ema_params = state.ema_params

        def generate(labels, rng, num_inference_steps):
            return _generate_jit(ema_params, labels, rng, num_inference_steps)

        generate.jitted = _generate_jit
        return generate

    def save_pipeline_fn(state: TrainState, dirpath: str):
        pipe.replace_params(
            jax.tree.map(np.asarray, state.ema_params)
        ).save_pretrained(dirpath)

    trainable_mask = None
    if attention_fine_tuning:
        # Freeze everything except attention blocks (reference
        # --attention_fine_tuning, train.py:202-220); for the DDIM family
        # the internal class embedding freezes too (it lives inside the
        # unet the reference calls requires_grad_(False) on).
        trainable_mask = attention_param_mask

    return Trainer(
        config, paths,
        model_apply=model_apply,
        embed_fn=embed_fn,
        trainable_params=pipe.params,
        schedule=pipe.schedule,
        generate_fn_builder=generate_fn_builder,
        save_pipeline_fn=save_pipeline_fn,
        trainable_mask=trainable_mask,
        **kw,
    )


def for_sd_pipeline(
    pipe: SDImg2ImgPipeline, config: TrainerConfig, paths: RunPaths,
    components_to_train=("denoiser", "class_embedding"),
    attention_fine_tuning: bool = False,
    **kw,
) -> Trainer:
    """SD fine-tune: UNet + class embedding (+ optionally the VAE) over a
    latent diffusion loss (reference train path, SURVEY.md §2a 'Training
    CLI' row).

    ``attention_fine_tuning`` narrows the trainable UNet leaves to the
    Transformer2D blocks (reference ``train.py:202-220``: freeze the unet,
    re-enable its ``attentions``); the class embedding's trainability
    stays governed by ``components_to_train``.

    ``"autoencoder"`` in ``components_to_train`` trains the VAE through the
    diffusion loss (reference ``src/args_parser.py:44-50`` choices,
    ``train.py:188-199`` freeze logic, optimizer collection ``:268-271``):
    the encode moves INSIDE the gradient.  Only the encoder + quant_conv
    leaves unfreeze — in the reference the decoder is in the optimizer but
    never receives a gradient from this loss (torch skips grad-None
    params), so an explicit freeze is the exact same dynamics without
    AdamW weight-decaying untrained leaves."""
    policy = Policy.from_mixed_precision(config.mixed_precision)
    from phendiff_tpu.models.sd_unet import SDUNet

    unet = SDUNet(pipe.unet_config, dtype=policy.compute_jnp, remat=config.remat)
    vae_params = pipe.vae_params  # closed over (frozen unless trained below)
    train_vae = "autoencoder" in components_to_train

    params = {
        "unet": pipe.unet_params,
        "class_embedding": pipe.class_embedding_params,
    }
    if train_vae:
        params["vae"] = pipe.vae_params

    def model_apply(p, x, t, class_seq):
        return unet.apply(p["unet"], x, t, class_seq)

    def embed_fn(p, labels):
        emb = p["class_embedding"]["params"]["embedding"]["embedding"][labels]
        return pad_to_clip_sequence(emb)

    from phendiff_tpu.models.autoencoder_kl import encode_to_latents

    if train_vae:
        def encode_fn(p, images, rng):
            return encode_to_latents(pipe.vae, p["vae"], images, rng)
    else:
        def encode_fn(images, rng):
            return encode_to_latents(pipe.vae, vae_params, images, rng)

    # Jitted once with the EMA trees as traced arguments (see the DDIM
    # builder's note); replace_params inside the trace just rebinds the
    # pytree leaves — the sampling scan compiles one time per shape.
    @functools.partial(jax.jit, static_argnames=("num_inference_steps",))
    def _generate_jit(ema_params, labels, rng, num_inference_steps):
        ema = pipe.replace_params(
            unet_params=ema_params["unet"],
            class_embedding_params=ema_params["class_embedding"],
            vae_params=ema_params["vae"] if train_vae else None,
        )
        return ema.generate(
            labels, rng, num_inference_steps=num_inference_steps,
            guidance_scale=config.eval.guidance_factor,
        )

    def generate_fn_builder(state: TrainState):
        ema_params = state.ema_params

        def generate(labels, rng, num_inference_steps):
            return _generate_jit(ema_params, labels, rng, num_inference_steps)

        generate.jitted = _generate_jit
        return generate

    def save_pipeline_fn(state: TrainState, dirpath: str):
        pipe.replace_params(
            unet_params=jax.tree.map(np.asarray, state.ema_params["unet"]),
            class_embedding_params=jax.tree.map(
                np.asarray, state.ema_params["class_embedding"]
            ),
            vae_params=jax.tree.map(np.asarray, state.ema_params["vae"])
            if train_vae else None,
        ).save_pretrained(dirpath)

    # components_to_train → per-component freeze mask (reference naming,
    # utils_misc.py:373-389: "denoiser" → unet, "class_embedding" → class
    # embedding, "autoencoder" → vae; a VAE not being trained is not in the
    # trainable tree at all)
    component_of = {
        "denoiser": "unet",
        "class_embedding": "class_embedding",
        "autoencoder": "vae",
    }
    unknown = [c for c in components_to_train if c not in component_of]
    if unknown:
        raise ValueError(
            f"unknown components_to_train for the SD family: {unknown}; "
            f"choose from {sorted(component_of)}"
        )
    active = {component_of[c] for c in components_to_train}
    mask = {
        name: jax.tree.map(lambda _: name in active, sub)
        for name, sub in params.items()
    }
    if train_vae:
        # encoder-side leaves only (see the docstring: the reference's
        # decoder never receives a gradient from the diffusion loss)
        mask["vae"] = {
            "params": {
                k: jax.tree.map(lambda _: k in ("encoder", "quant_conv"), v)
                for k, v in params["vae"]["params"].items()
            }
        }
    if attention_fine_tuning:
        if "denoiser" not in components_to_train:
            # same invariant as check_args / reference train.py:206-209
            raise ValueError(
                "Attention fine tuning requires 'denoiser' to be trained"
            )
        mask["unet"] = attention_param_mask(params["unet"])

    return Trainer(
        config, paths,
        model_apply=model_apply,
        embed_fn=embed_fn,
        trainable_params=params,
        schedule=pipe.schedule,
        generate_fn_builder=generate_fn_builder,
        save_pipeline_fn=save_pipeline_fn,
        encode_fn=encode_fn,
        encode_inside_grad=train_vae,
        trainable_mask=mask,
        **kw,
    )


def probe_sd_monolithic_compile(pipe, config: TrainerConfig) -> bool:
    """Can the backend compile the MONOLITHIC full-width SD train step?

    Lowers + AOT-compiles the whole fwd+bwd+clip+adamw+EMA step from
    ABSTRACT inputs — no device buffers are allocated, so a failure leaves
    nothing to clean up.  Historically the dev tunnel's remote-compile
    transport rejected the 866M-parameter HLO (r2/r3: the POST died with a
    broken pipe → the segmented per-stage route, models/sd_segmented.py);
    the r4 tunnel takes it (~5 min cold, persistent-cache hit afterwards)
    and the one-program step runs 13.5x faster than the per-stage chain
    (198 ms vs 2.68 s @128px b32).  ``--segmented_sd auto`` calls this to
    pick the route; any exception (transport, OOM during compile) means
    "use segmented".
    """
    from phendiff_tpu.models.autoencoder_kl import encode_to_latents
    from phendiff_tpu.models.sd_unet import SDUNet

    policy = Policy.from_mixed_precision(config.mixed_precision)
    unet = SDUNet(pipe.unet_config, dtype=policy.compute_jnp, remat=config.remat)
    vae_params = pipe.vae_params

    def model_apply(p, x, t, class_seq):
        return unet.apply(p["unet"], x, t, class_seq)

    def embed_fn(p, labels):
        emb = p["class_embedding"]["params"]["embedding"]["embedding"][labels]
        return pad_to_clip_sequence(emb)

    def encode_fn(images, rng):
        return encode_to_latents(pipe.vae, vae_params, images, rng)

    opt = make_optimizer(config.train.optimizer)
    step = make_train_step(
        model_apply, embed_fn, pipe.schedule, config.train, opt, encode_fn
    )
    abstract = lambda tree: jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), tree
    )
    params_abs = abstract(
        {"unet": pipe.unet_params, "class_embedding": pipe.class_embedding_params}
    )
    state_abs = jax.eval_shape(
        lambda p: init_train_state(p, opt, copy=False), params_abs
    )
    b = config.train_batch_size
    h, w = config.definition
    batch_abs = (
        jax.ShapeDtypeStruct((b, h, w, 3), jnp.float32),
        jax.ShapeDtypeStruct((b,), jnp.int32),
    )
    key_abs = jax.eval_shape(lambda: jax.random.key(0))
    try:
        jax.jit(step, donate_argnums=(0,)).lower(
            state_abs, batch_abs, key_abs
        ).compile()
        return True
    except Exception as e:  # transport/compile failure → segmented route
        logging.getLogger(__name__).warning(
            "monolithic SD train step did not compile (%s: %s) — "
            "falling back to the segmented per-stage route",
            type(e).__name__, str(e)[:200],
        )
        return False
