#!/bin/bash
# Train t5vitevqa on ViTXT-GQA (abinet OCR). Usage: bash scripts/train_t5vitevqa_abinet.sh <save_dir> [data_root]
SAVE_DIR=${1:-./save/t5vitevqa_abinet}
DATA_ROOT=${2:-data}
python tools/run.py --config configs/t5vitevqa_abinet.yml --model t5vitevqa \
  --datasets vtextgqa --run_type train --seed 13 \
  --save_dir "$SAVE_DIR" \
  dataset_attributes.vtextgqa.data_root_dir "$DATA_ROOT"
