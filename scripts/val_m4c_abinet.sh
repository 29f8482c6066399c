#!/bin/bash
# Evaluate m4c (abinet OCR). Usage: bash scripts/val_m4c_abinet.sh <ckpt_dir> <run_type: val|test> [data_root]
CKPT=${1:?checkpoint dir (e.g. save/ckpt/best)}
RUN_TYPE=${2:-val}
DATA_ROOT=${3:-data}
python tools/run.py --config configs/m4c_abinet.yml --model m4c \
  --datasets vtextgqa --run_type "$RUN_TYPE" --resume_file "$CKPT" \
  dataset_attributes.vtextgqa.data_root_dir "$DATA_ROOT"
