#!/bin/bash
# Serialized attention-implementation ablation on the real TPU chip.
cd "$(dirname "$0")/.."
for mode in xla pallas pallas_nopad; do
  echo "=== $mode ==="
  case $mode in
    xla)    export PHENDIFF_ATTN_IMPL=xla; unset PHENDIFF_FLASH_NO_PAD ;;
    pallas) export PHENDIFF_ATTN_IMPL=pallas; unset PHENDIFF_FLASH_NO_PAD ;;
    pallas_nopad) export PHENDIFF_ATTN_IMPL=pallas; export PHENDIFF_FLASH_NO_PAD=1 ;;
  esac
  timeout 1500 python -u - <<'PY'
import os, sys
sys.path.insert(0, ".")
from tools.microbench import bench_forward
from phendiff_tpu.models import config as C
label = os.environ["PHENDIFF_ATTN_IMPL"] + ("_nopad" if os.environ.get("PHENDIFF_FLASH_NO_PAD") else "")
bench_forward(C.super_small().replace(sample_size=128), "attn=" + label)
PY
done
