#!/bin/bash
# Round-5 TPU work queue, part 1 (the tunneled TPU admits ONE client at a
# time - run this only when no other TPU process is alive):
#  1. retrain dream_geo (geometric head @128px; the host was re-imaged
#     mid-round, so the epoch-100 run whose metrics.jsonl is committed lost
#     its best_params.npz - same data recipe, same config)
#  2. eval dream_geo (full pose protocol incl. PRED-angle PnP)
#  3. 128px decode-noise floor refresh (task_bound_dream_pose)
#  4. bench_attn8_ln (the 5-arm serve-step race)
#  5. train + eval dream256_geo (the >=256px measured point) + 256px floor
set -uo pipefail
cd /root/repo
# NOTE: do NOT override PYTHONPATH - /root/.axon_site on it registers the
# tunneled-TPU backend; replacing it silently drops to 'axon unknown' errors.
export MVROPOSE_NUM_WORKERS=0

echo "=== train dream_geo (128px geometric head)"
timeout 7200 python -m mvropose_tpu.cli train --robot dream \
  --csv data_synth/dream5.csv --dream-dirs data_synth/dream5/panda_synth \
  --workdir runs/dream_geo --image-hw 128 128 --model-size 128 \
  --hidden-size 192 --num-layers 4 --patch-size 16 --batch-size 64 \
  --epochs 100 --angle-head geometric 2>&1 | tee /tmp/dream_geo_train.log | tail -3

echo "=== eval dream_geo"
python -m mvropose_tpu.cli eval --robot dream --csv data_synth/dream5_eval.csv \
  --dream-dirs data_synth/dream5_eval/panda_synth \
  --params runs/dream_geo/best_params.npz --image-hw 128 128 \
  --single-view --batch-size 50 2>&1 | tee runs/dream_geo/eval_heldout.txt | tail -3

echo "=== 128px decode-noise floor (committed-recipe refresh)"
python scripts/task_bound_dream_pose.py --csv data_synth/dream5_eval.csv \
  --dream-dirs data_synth/dream5_eval/panda_synth \
  --out runs/task_bound_dream5_pose.json --noise-px 0 0.5 1.2 2>&1 | tail -2

echo "=== bench_attn8_ln"
timeout 3600 python scripts/bench_attn8_ln.py 2>&1 | tee /tmp/attn8_ln.log | tail -8

echo "=== train dream256"
timeout 14400 python -m mvropose_tpu.cli train --robot dream \
  --csv data_synth/dream256.csv --dream-dirs data_synth/dream256/panda_synth \
  --workdir runs/dream256_geo --image-hw 256 256 --model-size 256 \
  --hidden-size 192 --num-layers 4 --patch-size 16 --batch-size 32 \
  --epochs 100 --angle-head geometric 2>&1 | tee /tmp/dream256_train.log | tail -5

echo "=== eval dream256_geo"
python -m mvropose_tpu.cli eval --robot dream --csv data_synth/dream256_eval.csv \
  --dream-dirs data_synth/dream256_eval/panda_synth \
  --params runs/dream256_geo/best_params.npz --image-hw 256 256 \
  --single-view --batch-size 25 2>&1 | tee runs/dream256_geo/eval_heldout.txt | tail -3

echo "=== 256px decode-noise floor"
python scripts/task_bound_dream_pose.py --csv data_synth/dream256_eval.csv \
  --dream-dirs data_synth/dream256_eval/panda_synth \
  --image-hw 256 256 --out runs/task_bound_dream256_pose.json --noise-px 0 0.5 1.2 2>&1 | tail -2
echo "=== queue1 done"
