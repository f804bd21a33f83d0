#!/usr/bin/env bash
# Fetch the three TUM RGB-D sequences used by configs/TUM_RGBD/*.yaml
# (fr1/desk, fr2/xyz, fr3/long_office_household) from the TUM server —
# same sequences as the reference's scripts/download_tum.sh.
# Usage: scripts/download_tum.sh [DATASETS_DIR]
set -euo pipefail
root="${1:-Datasets}"
mkdir -p "$root/TUM_RGBD"
cd "$root/TUM_RGBD"
for url in \
  https://vision.in.tum.de/rgbd/dataset/freiburg1/rgbd_dataset_freiburg1_desk.tgz \
  https://vision.in.tum.de/rgbd/dataset/freiburg2/rgbd_dataset_freiburg2_xyz.tgz \
  https://vision.in.tum.de/rgbd/dataset/freiburg3/rgbd_dataset_freiburg3_long_office_household.tgz
do
  wget -c "$url"
  tar -xzf "$(basename "$url")"
done
echo "TUM ready — run e.g.: python run.py configs/TUM_RGBD/freiburg1_desk.yaml"
