#!/bin/bash
# VMAF scoring of SR vs GT (reference test_video_quality.sh parity).
# Usage: bash test_video_quality.sh <clip_number>
# Requires ffmpeg with libvmaf (not baked into this image — the python
# harness crfp_tpu/eval/vmaf.py raises a clear error when missing).
set -e
N=${1:-0}
DIR=${2:-test_png/eval_video}
python3 png2mp4.py "$DIR/$(printf '%03d' "$N")" "$DIR/sr_$N.mp4" --fps 24
python3 - <<EOF
from crfp_tpu.eval.vmaf import vmaf_score
score = vmaf_score("$DIR/sr_$N.mp4", "$DIR/gt_$N.mp4")
print(f"VMAF: {score}")
with open("$DIR/eval.log", "a") as f:
    f.write(f"clip $N VMAF {score}\n")
EOF
