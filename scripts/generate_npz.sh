#!/usr/bin/env bash
# Batch ETL launcher — reference data_*/generate_npz.sh equivalent.
# Runs the npz generator per dataset/file-range in the background with logs.
#
# Usage: scripts/generate_npz.sh <mode: dytt|znunu> <out_dir> <input...>
set -euo pipefail
mode=${1:?mode (dytt|znunu)}
out=${2:?output dir}
shift 2
mkdir -p "$out" logs
i=0
for input in "$@"; do
  nohup python -m deepmetv2_tpu.etl.generate_npz \
    --mode "$mode" --out "$out" --dataset "$(basename "$input" .root)" \
    --input "$input" > "logs/etl_${mode}_${i}.log" 2>&1 &
  i=$((i+1))
done
echo "launched $i ETL jobs (logs/ for progress)"
