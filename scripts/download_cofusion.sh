#!/usr/bin/env bash
# Fetch the CoFusion room4 sequence (configs/CoFusion/room4.yaml; EXR depth).
# Usage: scripts/download_cofusion.sh [DATASETS_DIR]
set -euo pipefail
root="${1:-Datasets}"
mkdir -p "$root/CoFusion/room4"
cd "$root/CoFusion/room4"
wget -c http://visual.cs.ucl.ac.uk/pubs/cofusion/data/room4-full.tar.gz
tar -xzf room4-full.tar.gz
echo "CoFusion ready — run: python run.py configs/CoFusion/room4.yaml"
