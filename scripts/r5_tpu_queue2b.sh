#!/bin/bash
# Round-5 queue 2b: the remainder of queue2 re-ordered for wall-clock risk -
# mixed3 eval FIRST (needs only the finished mixed3 run), then the three
# identically-configured single-robot twins, their evals after each twin (so
# a timeout leaves complete per-robot evidence), then the geometric-head
# mixed run last (cuttable: the lifted restriction is already CLI-tested).
set -uo pipefail
cd /root/repo
export MVROPOSE_NUM_WORKERS=0

D=data_synth/mixed3
E=data_synth/mixed3_eval
SUMS="$D/fr5_aruco_pose_summary.json $D/pose1_aruco_pose_summary.json $D/meca_insertion_aruco_pose_summary.json"
ARCH="--image-hw 128 128 --model-size 128 --hidden-size 192 --num-layers 4 --patch-size 16 --batch-size 64 --epochs 80"

echo "=== eval mixed3"
python -m mvropose_tpu.cli eval --robot fr5,fr3,meca_insertion \
  --csv $E/fr5.csv $E/fr3.csv $E/meca_insertion.csv \
  --calib-dir $D/calib --aruco-summary $SUMS \
  --params runs/mixed3/best_params.npz --image-hw 128 128 --batch-size 50 \
  2>&1 | tee runs/mixed3/eval_heldout.txt | tail -1

echo "=== twin fr5"
timeout 7200 python -m mvropose_tpu.cli train --robot fr5 --csv $D/fr5.csv \
  --calib-dir $D/calib --aruco-summary $D/fr5_aruco_pose_summary.json \
  --workdir runs/mixed3_twin_fr5 $ARCH 2>&1 | tail -2
python -m mvropose_tpu.cli eval --robot fr5 --csv $E/fr5.csv \
  --calib-dir $D/calib --aruco-summary $D/fr5_aruco_pose_summary.json \
  --params runs/mixed3_twin_fr5/best_params.npz --image-hw 128 128 \
  --batch-size 50 2>&1 | tee runs/mixed3_twin_fr5/eval_heldout.txt | tail -1

echo "=== twin fr3"
timeout 7200 python -m mvropose_tpu.cli train --robot fr3 --single-view --csv $D/fr3.csv \
  --calib-dir $D/calib --aruco-summary $D/pose1_aruco_pose_summary.json \
  --workdir runs/mixed3_twin_fr3 $ARCH 2>&1 | tail -2
python -m mvropose_tpu.cli eval --robot fr3 --single-view --csv $E/fr3.csv \
  --calib-dir $D/calib --aruco-summary $D/pose1_aruco_pose_summary.json \
  --params runs/mixed3_twin_fr3/best_params.npz --image-hw 128 128 \
  --batch-size 50 2>&1 | tee runs/mixed3_twin_fr3/eval_heldout.txt | tail -1

echo "=== twin meca_insertion"
timeout 7200 python -m mvropose_tpu.cli train --robot meca_insertion --csv $D/meca_insertion.csv \
  --calib-dir $D/calib --aruco-summary $D/meca_insertion_aruco_pose_summary.json \
  --workdir runs/mixed3_twin_mecains $ARCH 2>&1 | tail -2
python -m mvropose_tpu.cli eval --robot meca_insertion --csv $E/meca_insertion.csv \
  --calib-dir $D/calib --aruco-summary $D/meca_insertion_aruco_pose_summary.json \
  --params runs/mixed3_twin_mecains/best_params.npz --image-hw 128 128 \
  --batch-size 50 2>&1 | tee runs/mixed3_twin_mecains/eval_heldout.txt | tail -1

echo "=== train mixed3_geo (geometric head - the lifted restriction)"
timeout 10800 python -m mvropose_tpu.cli train --robot fr5,fr3,meca_insertion \
  --csv $D/fr5.csv $D/fr3.csv $D/meca_insertion.csv \
  --calib-dir $D/calib --aruco-summary $SUMS \
  --workdir runs/mixed3_geo $ARCH --angle-head geometric 2>&1 | tail -3
python -m mvropose_tpu.cli eval --robot fr5,fr3,meca_insertion \
  --csv $E/fr5.csv $E/fr3.csv $E/meca_insertion.csv \
  --calib-dir $D/calib --aruco-summary $SUMS \
  --params runs/mixed3_geo/best_params.npz --image-hw 128 128 --batch-size 50 \
  2>&1 | tee runs/mixed3_geo/eval_heldout.txt | tail -1
echo "=== queue2b done"
