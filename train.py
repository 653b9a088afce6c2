#!/usr/bin/env python
"""Entry point: full train -> evaluate -> predict pipeline.

Usage matches the reference CLI (reference ``train.py``):
    python train.py --dataset SMD --group 1-1 --epochs 10
"""

from mtad_gat_tpu.cli.train_cli import main

if __name__ == "__main__":
    main()
