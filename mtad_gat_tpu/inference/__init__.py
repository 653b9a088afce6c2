from mtad_gat_tpu.inference.eval_methods import (
    adjust_predicts,
    calc_point2point,
    calc_seq,
    bf_search,
    epsilon_eval,
    find_epsilon,
    pot_eval,
)
from mtad_gat_tpu.inference.spot import SPOT, dSPOT, biSPOT, bidSPOT
from mtad_gat_tpu.inference.predictor import Predictor
from mtad_gat_tpu.inference.online import OnlineScorer
from mtad_gat_tpu.inference.online_fleet import OnlineFleetScorer

__all__ = [
    "adjust_predicts",
    "calc_point2point",
    "calc_seq",
    "bf_search",
    "epsilon_eval",
    "find_epsilon",
    "pot_eval",
    "SPOT",
    "dSPOT",
    "biSPOT",
    "bidSPOT",
    "Predictor",
    "OnlineScorer",
    "OnlineFleetScorer",
]
