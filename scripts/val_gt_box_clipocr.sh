#!/bin/bash
# Evaluate the GT-box oracle. Usage: bash scripts/val_gt_box_clipocr.sh <ckpt_dir> <run_type> [data_root]
CKPT=${1:?checkpoint dir}
RUN_TYPE=${2:-val}
DATA_ROOT=${3:-data}
python tools/run.py --config configs/gt_box_clipocr.yml --model gt_box \
  --datasets gt_box --run_type "$RUN_TYPE" --resume_file "$CKPT" \
  dataset_attributes.gt_box.data_root_dir "$DATA_ROOT"
