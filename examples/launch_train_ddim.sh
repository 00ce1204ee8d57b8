#!/bin/bash
# From-scratch conditional DDIM training at 128px on a TPU slice
# (counterpart of the reference's examples_training_scripts/launch_script_DDIM.sh;
# one process drives the whole mesh — no accelerate launch).
set -euo pipefail

python -m phendiff_tpu.cli.train_cli \
  --run_name ddim_128px \
  --model_type DDIM \
  --train_data_dir "${DATA_DIR:-data/prepared/train}" \
  --denoiser_config_path configs/denoiser/super_small.json \
  --noise_scheduler_config_path configs/noise_scheduler/ddim_1k_epsilon.json \
  --definition 128 \
  --train_batch_size 448 \
  --eval_batch_size 128 \
  --num_epochs 300 \
  --learning_rate 1e-4 \
  --lr_scheduler cosine --lr_warmup_steps 500 \
  --proba_uncond 0.1 --guidance_factor 2.5 \
  --eval_save_model_every_epochs 30 \
  --nb_generated_images 1000 \
  --num_inference_steps 50 \
  --compute_fid --compute_kid --kid_subset_size 1000 \
  --checkpointing_steps 1000 --checkpoints_total_limit 3 \
  --mixed_precision bf16 \
  "$@"
