#!/bin/bash
# Train transtr on ViTXT-GQA (abinet OCR). Usage: bash scripts/train_transtr_abinet.sh <save_dir> [data_root]
SAVE_DIR=${1:-./save/transtr_abinet}
DATA_ROOT=${2:-data}
python tools/run.py --config configs/transtr_abinet.yml --model transtr \
  --datasets vtextgqa --run_type train --seed 13 \
  --save_dir "$SAVE_DIR" \
  dataset_attributes.vtextgqa.data_root_dir "$DATA_ROOT"
