#!/bin/bash
# Serving inference with the production stack (configs/t2s_serving.yml:
# single-variant decode, int8 KV cache, grounding-compacted serving).
# Writes an evalai-style prediction JSON under <save_dir>/reports/.
# Usage: bash scripts/serve_t2s.sh <ckpt_dir> [data_root] [extra opts...]
CKPT=${1:?checkpoint dir (e.g. save/ckpt/best)}
DATA_ROOT=${2:-data}
shift; shift 2>/dev/null
python tools/run.py --config configs/t2s_serving.yml --model t2s \
  --datasets vtextgqa --run_type inference --resume_file "$CKPT" \
  dataset_attributes.vtextgqa.data_root_dir "$DATA_ROOT" "$@"
