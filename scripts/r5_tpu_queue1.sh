#!/bin/bash
# Round-5 TPU work queue, part 1 (the tunneled TPU admits ONE client at a
# time - run this only when no other TPU process is alive):
#  1. eval dream_geo (geometric head @128px, full pose protocol)
#  2. bench_attn8_ln (the 5-arm serve-step race)
#  3. train + eval dream256_geo (the >=256px measured point)
set -uo pipefail
cd /root/repo
# NOTE: do NOT override PYTHONPATH - /root/.axon_site on it registers the
# tunneled-TPU backend; replacing it silently drops to 'axon unknown' errors.
export MVROPOSE_NUM_WORKERS=0

echo "=== eval dream_geo"
python -m mvropose_tpu.cli eval --robot dream --csv data_synth/dream5_eval.csv \
  --dream-dirs data_synth/dream5_eval/panda_synth \
  --params runs/dream_geo/best_params.npz --image-hw 128 128 \
  --single-view --batch-size 50 2>&1 | tail -3 | tee runs/dream_geo/eval_heldout.txt

echo "=== bench_attn8_ln"
timeout 3600 python scripts/bench_attn8_ln.py 2>&1 | tail -8

echo "=== train dream256"
timeout 14400 python -m mvropose_tpu.cli train --robot dream \
  --csv data_synth/dream256.csv --dream-dirs data_synth/dream256/panda_synth \
  --workdir runs/dream256_geo --image-hw 256 256 --model-size 256 \
  --hidden-size 192 --num-layers 4 --patch-size 16 --batch-size 32 \
  --epochs 100 --angle-head geometric 2>&1 | tail -5

echo "=== eval dream256_geo"
python -m mvropose_tpu.cli eval --robot dream --csv data_synth/dream256_eval.csv \
  --dream-dirs data_synth/dream256_eval/panda_synth \
  --params runs/dream256_geo/best_params.npz --image-hw 256 256 \
  --single-view --batch-size 25 2>&1 | tail -3 | tee runs/dream256_geo/eval_heldout.txt
echo "=== queue1 done"
