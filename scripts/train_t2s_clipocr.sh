#!/bin/bash
# Train t2s on ViTXT-GQA (abinet OCR). Usage: bash scripts/train_t2s_clipocr.sh <save_dir> [data_root]
SAVE_DIR=${1:-./save/t2s_clipocr}
DATA_ROOT=${2:-data}
python tools/run.py --config configs/t2s_clipocr.yml --model t2s \
  --datasets vtextgqa --run_type train --seed 13 \
  --save_dir "$SAVE_DIR" \
  dataset_attributes.vtextgqa.data_root_dir "$DATA_ROOT"
