#!/bin/bash
# Reference UX parity (run_partseg.sh): train a part-segmentation model.
python train_partseg.py --model "${1:-pointnet}" "${@:2}"
