#!/usr/bin/env bash
# Train the full CMHSE config on ActivityNet Captions (BASELINE config 3).
# Mirrors the reference's README one-liner (SURVEY.md C15).
set -euo pipefail
DATA=${1:-data/anet}
RUN=${2:-runs/cmhse_anet}

cmhse-vocab --data_path "$DATA" --threshold 4
cmhse-train \
  --preset cmhse_full \
  --data_path "$DATA" --data_name anet_precomp \
  --num_epochs 50 --batch_size 64 \
  --lr 1e-3 --lr_update 15 --margin 0.2 --max_violation \
  --recon_weight 5e-4 \
  --logger_name "$RUN"
cmhse-eval "$RUN" --data_path "$DATA" --split val --sharded --mode query
