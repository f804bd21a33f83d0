#!/usr/bin/env bash
# Fetch the Replica RGB-D sequences used by configs/Replica/*.yaml
# (same hosting as the reference's scripts/download_replica.sh).
# Usage: scripts/download_replica.sh [DATASETS_DIR]   (default ./Datasets)
set -euo pipefail
root="${1:-Datasets}"
mkdir -p "$root"
cd "$root"
wget -c https://cvg-data.inf.ethz.ch/nice-slam/data/Replica.zip
unzip -n Replica.zip
echo "Replica ready under $PWD/Replica — run e.g.:"
echo "  python run.py configs/Replica/room0.yaml"
