#!/bin/bash
# Unpack pretrained model archives into pretrained_models/
# (reference untar_models.sh parity).
set -e
mkdir -p pretrained_models
for f in "$@"; do
    tar -xvf "$f" -C pretrained_models
done
echo "pretrained archives extracted to pretrained_models/"
echo "convert to flax with: python -m crfp_tpu.tools.convert_torch <ckpt.pt> <out_dir>"
