#!/bin/bash
# Train the GT-box oracle. Usage: bash scripts/train_gt_box_clipocr.sh <save_dir> [data_root]
SAVE_DIR=${1:-./save/gt_box}
DATA_ROOT=${2:-data}
python tools/run.py --config configs/gt_box_clipocr.yml --model gt_box \
  --datasets gt_box --run_type train --seed 13 --save_dir "$SAVE_DIR" \
  dataset_attributes.gt_box.data_root_dir "$DATA_ROOT"
