#!/bin/bash
# Round-5 TPU work queue, part 2: BASELINE config 4 at its named 3-robot
# scope (fr5 + fr3 + meca_insertion) + identically-configured single-robot
# twins + a geometric-head mixed run (the lifted restriction, exercised).
# Run only when no other TPU process is alive (single-client tunnel).
set -uo pipefail
cd /root/repo
# Do NOT override PYTHONPATH (axon registration lives on it).
export MVROPOSE_NUM_WORKERS=0

D=data_synth/mixed3
E=data_synth/mixed3_eval
SUMS="$D/fr5_aruco_pose_summary.json $D/pose1_aruco_pose_summary.json $D/meca_insertion_aruco_pose_summary.json"
ARCH="--image-hw 128 128 --model-size 128 --hidden-size 192 --num-layers 4 --patch-size 16 --batch-size 64 --epochs 80"

echo "=== train mixed3 (query head)"
timeout 10800 python -m mvropose_tpu.cli train --robot fr5,fr3,meca_insertion \
  --csv $D/fr5.csv $D/fr3.csv $D/meca_insertion.csv \
  --calib-dir $D/calib --aruco-summary $SUMS \
  --workdir runs/mixed3 $ARCH 2>&1 | tail -3

echo "=== train twins"
timeout 7200 python -m mvropose_tpu.cli train --robot fr5 --csv $D/fr5.csv \
  --calib-dir $D/calib --aruco-summary $D/fr5_aruco_pose_summary.json \
  --workdir runs/mixed3_twin_fr5 $ARCH 2>&1 | tail -2
timeout 7200 python -m mvropose_tpu.cli train --robot fr3 --single-view --csv $D/fr3.csv \
  --calib-dir $D/calib --aruco-summary $D/pose1_aruco_pose_summary.json \
  --workdir runs/mixed3_twin_fr3 $ARCH 2>&1 | tail -2
timeout 7200 python -m mvropose_tpu.cli train --robot meca_insertion --csv $D/meca_insertion.csv \
  --calib-dir $D/calib --aruco-summary $D/meca_insertion_aruco_pose_summary.json \
  --workdir runs/mixed3_twin_mecains $ARCH 2>&1 | tail -2

echo "=== train mixed3_geo (geometric head - the lifted restriction)"
timeout 10800 python -m mvropose_tpu.cli train --robot fr5,fr3,meca_insertion \
  --csv $D/fr5.csv $D/fr3.csv $D/meca_insertion.csv \
  --calib-dir $D/calib --aruco-summary $SUMS \
  --workdir runs/mixed3_geo $ARCH --angle-head geometric 2>&1 | tail -3

echo "=== evals"
for M in mixed3 mixed3_geo; do
  python -m mvropose_tpu.cli eval --robot fr5,fr3,meca_insertion \
    --csv $E/fr5.csv $E/fr3.csv $E/meca_insertion.csv \
    --calib-dir $D/calib --aruco-summary $SUMS \
    --params runs/$M/best_params.npz --image-hw 128 128 --batch-size 50 \
    2>&1 | tail -1 | tee runs/$M/eval_heldout.txt
done
python -m mvropose_tpu.cli eval --robot fr5 --csv $E/fr5.csv \
  --calib-dir $D/calib --aruco-summary $D/fr5_aruco_pose_summary.json \
  --params runs/mixed3_twin_fr5/best_params.npz --image-hw 128 128 \
  --batch-size 50 2>&1 | tail -1 | tee runs/mixed3_twin_fr5/eval_heldout.txt
python -m mvropose_tpu.cli eval --robot fr3 --single-view --csv $E/fr3.csv \
  --calib-dir $D/calib --aruco-summary $D/pose1_aruco_pose_summary.json \
  --params runs/mixed3_twin_fr3/best_params.npz --image-hw 128 128 \
  --batch-size 50 2>&1 | tail -1 | tee runs/mixed3_twin_fr3/eval_heldout.txt
python -m mvropose_tpu.cli eval --robot meca_insertion --csv $E/meca_insertion.csv \
  --calib-dir $D/calib --aruco-summary $D/meca_insertion_aruco_pose_summary.json \
  --params runs/mixed3_twin_mecains/best_params.npz --image-hw 128 128 \
  --batch-size 50 2>&1 | tail -1 | tee runs/mixed3_twin_mecains/eval_heldout.txt
echo "=== queue2 done"
