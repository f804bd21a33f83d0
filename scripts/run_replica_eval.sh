#!/usr/bin/env bash
# One-command real-data validation against BASELINE.json's acceptance
# metric: run Replica room0-2 (and optionally TUM fr1/desk) end-to-end
# and print per-scene ATE RMSE.  Requires the datasets on disk first:
#   scripts/download_replica.sh  [scripts/download_tum.sh]
# Usage:
#   scripts/run_replica_eval.sh               # room0 room1 room2
#   SCENES="room0" scripts/run_replica_eval.sh
#   WITH_TUM=1 scripts/run_replica_eval.sh    # + freiburg1_desk
# Extra run.py flags pass through via RUN_FLAGS (e.g. RUN_FLAGS=--no-mesh).
set -euo pipefail
cd "$(dirname "$0")/.."
scenes=(${SCENES:-room0 room1 room2})
for s in "${scenes[@]}"; do
  echo "=== Replica/$s"
  python run.py "configs/Replica/$s.yaml" ${RUN_FLAGS:-}
  python tools/eval_ate.py "output/Replica/$s" \
    --plot "output/Replica/$s/ate_plot.png"
done
if [[ "${WITH_TUM:-0}" == "1" ]]; then
  echo "=== TUM_RGBD/freiburg1_desk"
  python run.py configs/TUM_RGBD/freiburg1_desk.yaml ${RUN_FLAGS:-}
  python tools/eval_ate.py output/TUM_RGBD/freiburg1_desk \
    --plot output/TUM_RGBD/freiburg1_desk/ate_plot.png
fi
echo "Acceptance targets (BASELINE.md): ATE <= reference on room0-2 + fr1/desk."
echo "For reconstruction metrics: scripts/download_cull_replica_mesh.sh, then"
echo "  python tools/eval_recon.py --rec_mesh output/Replica/room0/mesh/final_mesh_eval_rec.ply \\"
echo "      --gt_mesh cull_replica_mesh/room0.ply -2d -3d"
