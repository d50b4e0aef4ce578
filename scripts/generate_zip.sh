#!/usr/bin/env bash
# Archive npz slices — reference data_znunu/generate_zip.sh equivalent.
# Usage: scripts/generate_zip.sh <raw_dir> <archive_prefix>
set -euo pipefail
raw=${1:?raw dir}
prefix=${2:?archive prefix}
zip -r "${prefix}_$(date +%Y%m%d).zip" "$raw"
