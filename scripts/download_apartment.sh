#!/usr/bin/env bash
# Fetch the Azure-Kinect Apartment sequence (configs/Apartment/apartment.yaml).
# Usage: scripts/download_apartment.sh [DATASETS_DIR]
set -euo pipefail
root="${1:-Datasets}"
mkdir -p "$root"
cd "$root"
wget -c https://cvg-data.inf.ethz.ch/nice-slam/data/Apartment.zip
unzip -n Apartment.zip
echo "Apartment ready — run: python run.py configs/Apartment/apartment.yaml"
