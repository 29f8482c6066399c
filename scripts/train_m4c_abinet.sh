#!/bin/bash
# Train m4c on ViTXT-GQA (abinet OCR). Usage: bash scripts/train_m4c_abinet.sh <save_dir> [data_root]
SAVE_DIR=${1:-./save/m4c_abinet}
DATA_ROOT=${2:-data}
python tools/run.py --config configs/m4c_abinet.yml --model m4c \
  --datasets vtextgqa --run_type train --seed 13 \
  --save_dir "$SAVE_DIR" \
  dataset_attributes.vtextgqa.data_root_dir "$DATA_ROOT"
