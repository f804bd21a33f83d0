#!/usr/bin/env bash
# Fetch the 500-frame ScanNet demo snippet (configs/Demo/demo.yaml) —
# same hosting as the reference's scripts/download_demo.sh.
# Usage: scripts/download_demo.sh [DATASETS_DIR]
set -euo pipefail
root="${1:-Datasets}"
mkdir -p "$root"
cd "$root"
wget -c https://cvg-data.inf.ethz.ch/nice-slam/data/Demo.zip
unzip -n Demo.zip
echo "Demo ready — run: python run.py configs/Demo/demo.yaml"
