#!/bin/bash
# Train mist on ViTXT-GQA (abinet OCR). Usage: bash scripts/train_mist_abinet.sh <save_dir> [data_root]
SAVE_DIR=${1:-./save/mist_abinet}
DATA_ROOT=${2:-data}
python tools/run.py --config configs/mist_abinet.yml --model mist \
  --datasets vtextgqa --run_type train --seed 13 \
  --save_dir "$SAVE_DIR" \
  dataset_attributes.vtextgqa.data_root_dir "$DATA_ROOT"
