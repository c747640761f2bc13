#!/bin/bash
# Round-5 data regeneration (data_synth/ is .gitignored and the host was
# re-imaged mid-round): rebuilds the EXACT datasets the round-5 queues
# consume, with the recipes recorded in committed artifacts:
#  * dream5       — 2,400 train @128px, fx/width 0.96 (DREAM-real angular
#                   resolution, runs/dream_synth_real_geom/final_metrics.json),
#                   seed 0; dream5_eval — 300 held-out, seed 77.
#  * dream256     — same geometry at 256px (the >=256px measured point
#                   VERDICT r4 demand #1 asks for), seeds 0/78.
#  * mixed3       — BASELINE config 4 at its named 3-robot scope
#                   (fr5 + fr3 + meca_insertion), 2,000/robot, seed 0;
#                   mixed3_eval — 300/robot, fresh seed 99, cameras shared
#                   via --calib-from (a new seed would move the cameras).
set -euo pipefail
cd /root/repo
export JAX_PLATFORMS=cpu

gen_dream() { # out n seed hw
  python scripts/make_dream_synthetic.py --out-dir "$1" --n-samples "$2" \
    --seed "$3" --image-hw "$4" "$4" --focal-scale 0.96
  python -m mvropose_tpu.cli sync dream --base-dirs "$1/panda_synth" --out "$1.csv"
}

gen_dream data_synth/dream5 2400 0 128
gen_dream data_synth/dream5_eval 300 77 128
gen_dream data_synth/dream256 2400 0 256
gen_dream data_synth/dream256_eval 300 78 256

python scripts/make_mixed_synthetic.py --out-dir data_synth/mixed3 \
  --robots fr5 fr3 meca_insertion --n-samples 2000 --seed 0
python scripts/make_mixed_synthetic.py --out-dir data_synth/mixed3_eval \
  --robots fr5 fr3 meca_insertion --n-samples 300 --seed 99 \
  --calib-from data_synth/mixed3
echo "=== regen done"
