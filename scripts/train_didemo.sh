#!/usr/bin/env bash
# Train on DiDeMo (BASELINE config 4: ragged-bucketing stress).
set -euo pipefail
DATA=${1:-data/didemo}
RUN=${2:-runs/cmhse_didemo}

cmhse-vocab --data_path "$DATA" --threshold 4
cmhse-train \
  --preset didemo \
  --data_path "$DATA" --data_name didemo_precomp \
  --num_epochs 30 --batch_size 64 \
  --logger_name "$RUN"
cmhse-eval "$RUN" --data_path "$DATA" --split val
