#!/usr/bin/env python
"""Entry point: all-entities SMD sweep (replaces the reference's
``bash_scripts/train_smd.sh``).

    python sweep.py --dataset SMD --epochs 10
"""

from mtad_gat_tpu.cli.sweep_cli import main

if __name__ == "__main__":
    main()
