#!/usr/bin/env bash
# Fetch the culled Replica ground-truth meshes used as the target of
# tools/eval_recon.py (same artifact as the reference's
# scripts/download_cull_replica_mesh.sh).
# Usage: scripts/download_cull_replica_mesh.sh [DEST_DIR]
set -euo pipefail
root="${1:-.}"
mkdir -p "$root"
cd "$root"
wget -c https://cvg-data.inf.ethz.ch/nice-slam/cull_replica_mesh.zip
unzip -n cull_replica_mesh.zip
echo "GT meshes ready under $PWD/cull_replica_mesh — eval e.g.:"
echo "  python tools/eval_recon.py --rec_mesh output/Replica/room0/mesh/final_mesh_eval_rec.ply \\"
echo "      --gt_mesh cull_replica_mesh/room0.ply -2d -3d"
