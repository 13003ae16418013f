#!/usr/bin/env bash
# One-command quality-parity run on Blender-synthetic Lego — the benchmark
# the reference actually ticks (/root/reference/README.md:14; north star:
# K-Planes Lego PSNR within 0.1 dB, BASELINE.json configs #3-5).
#
# Environment blocker (re-verified 2026-08-19, BASELINE.md): this container
# has no network egress (DNS resolution fails) and no Blender-synthetic data
# on disk.  The hour a Lego dataset becomes reachable, run:
#
#   tools/run_lego.sh /path/to/nerf_synthetic/lego [output_dir]
#
# It trains the FULL reference schedule (2048 steps x 4096-ray budget via
# the bs_ratio rule: batch 2048 -> 4096 steps; reference src/run.py:101-103),
# evaluates the 200-image test split, and prints the PSNR table against the
# published anchors.
set -euo pipefail

DATA="${1:?usage: run_lego.sh /path/to/nerf_synthetic/lego [output_dir]}"
OUT="${2:-/tmp/lego_runs}"
cd "$(dirname "$0")/.."

for f in transforms_train.json transforms_val.json transforms_test.json; do
    [ -f "$DATA/$f" ] || { echo "missing $DATA/$f — point at the lego scene folder" >&2; exit 1; }
done

mkdir -p "$OUT"
SEED="${SEED:-1}" python train.py \
    --data "$DATA" --datatype synthetic --output "$OUT" \
    --method kplanes --scene_type aabb \
    --batch_size 2048 --n_samples 400 \
    --eval --eval_every 512 --eval_n 4 \
    --checkpoint_every 1024 \
    2>&1 | tee "$OUT/lego_train.log"

EXP=$(ls -dt "$OUT"/*_kplanes_aabb_400 | head -1)
python - "$EXP" <<'PY'
import json, sys
from pathlib import Path
import numpy as np

exp = Path(sys.argv[1])
test = json.loads((exp / "metrics_test.json").read_text())
psnr = float(np.mean([m["psnr"] for m in test]))
ssim = float(np.mean([m["ssim"] for m in test]))
print(f"\n=== Lego quality parity ({exp}) ===")
print(f"test PSNR {psnr:.2f} dB   SSIM {ssim:.4f}   over {len(test)} images")
print("anchors: K-Planes paper Lego ~35.75 dB (hybrid); vanilla NeRF ~32.54 dB")
print("target : reference parity within 0.1 dB (BASELINE.json north star)")
tl = exp / "eval_timeline.json"
if tl.exists():
    for e in json.loads(tl.read_text()):
        print(f"  step {e['step']:>5}  {e['elapsed_s']:>7.1f}s  {e['psnr']:.2f} dB")
    hits = [e for e in json.loads(tl.read_text()) if e["psnr"] >= 30.0]
    if hits:
        print(f"time-to-30-PSNR: {hits[0]['elapsed_s']:.1f}s (step {hits[0]['step']})")
PY
