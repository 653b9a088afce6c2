"""Dataset preprocessing entry point (reference ``preprocess.py:92-96``)."""

from __future__ import annotations

from mtad_gat_tpu.cli.args import get_parser
from mtad_gat_tpu.data.preprocess import preprocess


def main() -> None:
    args = get_parser().parse_args()
    preprocess(args.dataset, data_root=args.data_root)


if __name__ == "__main__":
    main()
