#!/bin/bash
# Evaluate t2s (abinet OCR). Usage: bash scripts/val_t2s_clipocr.sh <ckpt_dir> <run_type: val|test> [data_root]
CKPT=${1:?checkpoint dir (e.g. save/ckpt/best)}
RUN_TYPE=${2:-val}
DATA_ROOT=${3:-data}
python tools/run.py --config configs/t2s_clipocr.yml --model t2s \
  --datasets vtextgqa --run_type "$RUN_TYPE" --resume_file "$CKPT" \
  dataset_attributes.vtextgqa.data_root_dir "$DATA_ROOT"
