"""Blocking-plan invariants for the fused GATv2 kernel.

Regression for a silent-wrong-gradients bug: the backward row block
(block_i_bwd) must DIVIDE the padded row count, otherwise the backward grid
floor-truncates and the tail rows' gradients are dropped/uninitialized
(first seen at N=17, E=128: block_i=24, block_i_bwd=16, ni=24//16=1 covered
only rows 0-15)."""

from __future__ import annotations

from mtad_gat_tpu.kernels.gat_pallas import _Plan, _round_up


def test_backward_grid_covers_all_rows():
    for n in range(1, 300):
        for e in (8, 76, 89, 96, 128, 200, 256, 300, 512, 1024, 2048):
            plan = _Plan(4, n, e, 64)
            assert plan.Nip % plan.block_i == 0
            assert plan.ni * plan.block_i == plan.Nip
            if plan.bwd_feasible:
                assert plan.block_i % plan.block_i_bwd == 0, (n, e)
                assert plan.ni_bwd * plan.block_i_bwd == plan.Nip, (n, e)
                assert plan.block_i_bwd % 8 == 0


def test_padding_invariants():
    for n in (1, 17, 38, 100, 129, 1024):
        for e in (8, 76, 200, 513):
            plan = _Plan(2, n, e, 38)
            assert plan.Nip >= n and plan.Njp >= n
            assert plan.Ep == _round_up(e, plan.ec)
            assert plan.nc * plan.ec == plan.Ep
            assert plan.Njp % plan.block_j == 0


def test_wide_embedding_falls_back():
    plan = _Plan(2, 64, 4096, 64)
    assert not plan.bwd_feasible  # dense-recompute VJP path
    # forward stays blockwise at any width
    assert plan.block_i >= 8
