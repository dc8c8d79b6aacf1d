#!/bin/bash
# Reference UX parity (run_cls.sh): train a classifier with defaults.
# Device selection is the JAX platform (all local TPU chips by default;
# restrict with --n-devices N).
python train_cls.py --model "${1:-pointnet}" "${@:2}"
