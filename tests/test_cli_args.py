"""CLI surface parity: our parser must accept the reference's exact flag set
with identical defaults, and config.txt must round-trip."""


import pytest

from tests.conftest import requires_reference

from mtad_gat_tpu.cli.args import get_parser, to_run_config
from mtad_gat_tpu.config import RunConfig, lookup_pot_params



@requires_reference
def test_flag_surface_matches_reference():
    from tests.torch_ref import load_ref

    ref_args = load_ref("args")

    ref = ref_args.get_parser().parse_args([])
    ours = get_parser().parse_args([])
    for key, ref_val in vars(ref).items():
        assert hasattr(ours, key), f"missing reference flag --{key}"
        assert getattr(ours, key) == ref_val, (
            f"--{key}: ours={getattr(ours, key)!r} reference={ref_val!r}"
        )


def test_run_config_roundtrip(tmp_path):
    args = get_parser().parse_args(
        ["--dataset", "msl", "--epochs", "7", "--use_gatv2", "false", "--bs", "64"]
    )
    cfg = to_run_config(args)
    assert cfg.dataset == "MSL"      # type=str.upper like the reference
    assert cfg.epochs == 7 and cfg.use_gatv2 is False and cfg.bs == 64
    path = tmp_path / "config.txt"
    cfg.save(str(path))
    cfg2 = RunConfig.load(str(path))
    assert cfg2 == cfg


def test_run_config_pre_gru_impl_checkpoints_pin_xla():
    """config.txt files saved before gru_impl existed trained with the XLA
    scan; loading them must pin gru_impl='xla' rather than backfill the
    'auto' default, which would switch long-window checkpoints to the
    allclose-but-not-bit-identical Pallas GRU at predict/serve and drift
    scores against their cached threshold calibration."""
    d = {"dataset": "SMD", "group": "1-1", "lookback": 4096}
    assert RunConfig.from_dict(d).gru_impl == "xla"
    # configs that carry the key keep it verbatim
    assert RunConfig.from_dict({**d, "gru_impl": "auto"}).gru_impl == "auto"
    assert RunConfig().gru_impl == "auto"  # new runs still default to auto


@requires_reference
def test_pot_param_tables_match_reference():
    """level_q_dict / reg_level_dict from reference train.py:126-143."""
    cases = [
        ("SMAP", "1-1", (0.90, 0.005, 0)),
        ("MSL", "1-1", (0.90, 0.001, 0)),
        ("SMD", "1-1", (0.9950, 0.001, 1)),
        ("SMD", "2-3", (0.9925, 0.001, 1)),
        ("SMD", "3-11", (0.9999, 0.001, 1)),
    ]
    for dataset, group, want in cases:
        assert lookup_pot_params(dataset, group, None, None) == want
    # user overrides win
    assert lookup_pot_params("MSL", "1-1", 0.95, 0.01) == (0.95, 0.01, 0)
