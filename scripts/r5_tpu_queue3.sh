#!/bin/bash
# Round-5 TPU work queue, part 3 (run AFTER queue1: needs its trained
# checkpoints + held-out evals on disk):
#  1. dream_geo eval with --refine-pose (joint refinement at the measured
#     decode noise / angle-MAE sigmas from its committed eval)
#  2. attn8 accuracy receipt: dream_geo eval float vs --int8-backbone
#     --int8-attention (the accuracy side of runs/attn8_ln_bench.json's
#     1.265x, same protocol as runs/int8_bench.json's pck_parity)
#  3. dream256_geo eval with --refine-pose (sigmas parsed from its queue1
#     eval report)
set -uo pipefail
cd /root/repo
export MVROPOSE_NUM_WORKERS=0

sigmas() { # eval_report.txt -> "kp_px_err_mean angle_mae"
  python - "$1" <<'EOF'
import json, sys
rep = json.loads(open(sys.argv[1]).read().strip().splitlines()[-1])
print(rep["kp_px_err_mean"], rep["angle_mae"])
EOF
}

echo "=== dream_geo refined eval"
read SPX SPRIOR < <(sigmas runs/dream_geo/eval_heldout.txt)
echo "sigma_px=$SPX sigma_prior=$SPRIOR"
python -m mvropose_tpu.cli eval --robot dream --csv data_synth/dream5_eval.csv \
  --dream-dirs data_synth/dream5_eval/panda_synth \
  --params runs/dream_geo/best_params.npz --image-hw 128 128 \
  --single-view --batch-size 50 --refine-pose \
  --refine-sigma-px "$SPX" --refine-sigma-prior "$SPRIOR" \
  2>&1 | tee runs/dream_geo/eval_refined.txt | tail -2

echo "=== attn8 accuracy receipt (int8 backbone + int8-prob attention)"
python -m mvropose_tpu.cli eval --robot dream --csv data_synth/dream5_eval.csv \
  --dream-dirs data_synth/dream5_eval/panda_synth \
  --params runs/dream_geo/best_params.npz --image-hw 128 128 \
  --single-view --batch-size 50 --int8-backbone --int8-attention \
  2>&1 | tee runs/dream_geo/eval_int8_attn8.txt | tail -2

echo "=== dream256_geo refined eval"
read SPX SPRIOR < <(sigmas runs/dream256_geo/eval_heldout.txt)
echo "sigma_px=$SPX sigma_prior=$SPRIOR"
python -m mvropose_tpu.cli eval --robot dream --csv data_synth/dream256_eval.csv \
  --dream-dirs data_synth/dream256_eval/panda_synth \
  --params runs/dream256_geo/best_params.npz --image-hw 256 256 \
  --single-view --batch-size 25 --refine-pose \
  --refine-sigma-px "$SPX" --refine-sigma-prior "$SPRIOR" \
  2>&1 | tee runs/dream256_geo/eval_refined.txt | tail -2
echo "=== queue3 done"
