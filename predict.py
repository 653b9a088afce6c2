#!/usr/bin/env python
"""Entry point: standalone inference on a trained run.

Usage matches the reference CLI (reference ``predict.py``):
    python predict.py --dataset SMD --group 1-1 --model_id -1
"""

from mtad_gat_tpu.cli.predict_cli import main

if __name__ == "__main__":
    main()
