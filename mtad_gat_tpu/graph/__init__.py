from mtad_gat_tpu.graph.structure import Graph, complete_graph
from mtad_gat_tpu.graph.segment import segment_softmax, segment_sum, segment_max
from mtad_gat_tpu.graph.ops import (
    gatv2_scores_dense,
    gatv1_scores_dense,
    gat_aggregate_dense,
    gatv2_scores_coo,
    gat_aggregate_coo,
)

__all__ = [
    "Graph",
    "complete_graph",
    "segment_softmax",
    "segment_sum",
    "segment_max",
    "gatv2_scores_dense",
    "gatv1_scores_dense",
    "gat_aggregate_dense",
    "gatv2_scores_coo",
    "gat_aggregate_coo",
]
