#!/usr/bin/env python
"""Entry point: raw -> processed dataset conversion.

Usage matches the reference CLI (reference ``preprocess.py``):
    python preprocess.py --dataset SMD
"""

from mtad_gat_tpu.cli.preprocess_cli import main

if __name__ == "__main__":
    main()
