#!/usr/bin/env python
"""Entry point: streaming serving over a trained run (no reference
counterpart — the reference scores offline only).

    python serve.py --dataset SMD --group 1-1 --model_id -1 --input stream.csv
    tail -f live.csv | python serve.py --dataset SMD --group 1-1 --input -
"""

from mtad_gat_tpu.cli.serve_cli import main

if __name__ == "__main__":
    main()
