#!/usr/bin/env bash
# 2-minute smoke: synthetic train + sharded eval on the virtual CPU mesh.
set -euo pipefail
cmhse-train --preset hier_anet --synthetic --synthetic_videos 24 \
  --batch_size 8 --num_epochs 1 --embed_size 32 --word_dim 16 \
  --platform cpu --logger_name "${1:-/tmp/cmhse_smoke}"
