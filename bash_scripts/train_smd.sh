#!/usr/bin/env bash
# Drop-in replacement for the reference's bash_scripts/train_smd.sh
# (28 sequential `python train.py` invocations, 10 epochs each,
# reference train_smd.sh:3-30). Delegates to sweep.py, which trains every
# discovered SMD machine in ONE process with the compiled train step reused
# across entities; pass --batched to train all entities simultaneously in a
# single vmapped step. Extra arguments are forwarded (e.g. --epochs 10).
cd "$(dirname "$0")/.."
exec python sweep.py --dataset SMD --epochs 10 "$@"
